#!/usr/bin/env bash
# Supplemental round-5 on-chip evidence (follows run_onchip_r5.sh):
#   1. the GP-smoothing ablation — gp / gp_cls vs the RAW training field
#      ('field' method) on a soft-label knockout field that cannot
#      hard-degenerate, so the rows measure the METHOD (VERDICT r4 #1)
#   2. the reference's hard-label window hypothesis under
#      --skip-degenerate — either a real hard-label answer or a committed
#      negative (no synthetic image has window-mask signal)
#   3. the dynamic-batch p95 tail with group-size caps (VERDICT r4 #6):
#      capped groups bound how many requests one slow device call stalls
#
# Run from the repo root when the axon tunnel answers:
#   bash benchmarks/run_onchip_r5b.sh [outdir] [ckpt.msgpack]

set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/onchip_r5b}"
CKPT="${2:-/tmp/cifar56_converted/weights.msgpack}"
mkdir -p "$OUT"
export PYTHONPATH="${PYTHONPATH:-}:$PWD"
export PYTHONUNBUFFERED=1

run() {
  name="$1"; shift
  echo "=== [$name] $* ==="
  ( time python benchmarks/tpu_watchdog.py --retries 5 --stall 420 \
      --timeout 3600 -- "$@" ) 2>&1 | tee "$OUT/$name.log"
  echo "=== [$name] exit=${PIPESTATUS[0]} ==="
}

if [ ! -f "$CKPT" ]; then
  run convert_ckpt python -m network_interpretation_imagenet_tpu.cli.convert_checkpoint \
    --arch resnet --depth 56 --dataset cifar10 \
    --ckpt /root/reference/saved_checkpoints/cifar10+-resnet-56/model_best.pth.tar \
    --out "$(dirname "$CKPT")"
fi

# 1. GP-smoothing ablation: field vs gp vs gp_cls on the soft knockout
#    field (trained net -> prob labels vary -> informative on every
#    image). rise anchors the table to the study's overall winner.
run gp_ablation_soft python -m network_interpretation_imagenet_tpu.cli.compare_saliency_methods \
  --arch resnet --depth 56 --dataset cifar10 --synthetic \
  --ckpt "$CKPT" --num-images 32 --fidelity-steps 32 --bootstrap 4000 \
  --methods field,gp,gp_cls,knockout,window,rise \
  --gp-field knockout --gp-labels soft \
  --out docs/profiles/method_comparison_cifar10_r5/gp_ablation_soft

# 2. Hard-label window hypothesis, conditioned on images with mask
#    signal. rc=1 with a skipped count is a legal, committed negative.
run gp_hard_skip python -m network_interpretation_imagenet_tpu.cli.compare_saliency_methods \
  --arch resnet --depth 56 --dataset cifar10 --synthetic \
  --ckpt "$CKPT" --num-images 8 --fidelity-steps 32 --bootstrap 4000 \
  --methods field,gp,gp_cls,window,rise --skip-degenerate \
  --out docs/profiles/method_comparison_cifar10_r5/gp_hard_skip

# 3. p95 tail: serialized vs dynamic vs dynamic+cap at C in {4,16}.
run load_test_cap python benchmarks/load_test.py --requests 32 --max-group 4

# 4. XRAI re-measured after the area-adaptive FH ladder fix (the N=64
#    table and the first jpeg secondary ran the 224²-tuned ladder, which
#    collapsed real 32×32 photos to one region → constant heatmaps).
run xrai_adaptive_n64 python -m network_interpretation_imagenet_tpu.cli.compare_saliency_methods \
  --arch resnet --depth 56 --dataset cifar10 --synthetic \
  --ckpt "$CKPT" --num-images 64 --fidelity-steps 32 --bootstrap 4000 \
  --methods xrai \
  --out docs/profiles/method_comparison_cifar10_r5/xrai_adaptive

# 5. The real-JPEG secondary, regenerated with the adaptive ladder (and
#    the field baseline) — replaces the committed degenerate-xrai table.
run jpeg_secondary_v2 python -m network_interpretation_imagenet_tpu.cli.compare_saliency_methods \
  --arch resnet --depth 56 --dataset cifar10 \
  --ckpt "$CKPT" --jpeg-dir tests/fixtures/imagenet_loc \
  --num-images 3 --fidelity-steps 32 --bootstrap 4000 \
  --out docs/profiles/method_comparison_cifar10_r5/jpeg_secondary
