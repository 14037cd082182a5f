#!/usr/bin/env bash
# Definitive round-5 method-study re-runs AFTER the two area-units fixes
# (adaptive XRAI FH ladder + adaptive segmentation scale): the earlier
# r5/r5b study stages ran with 32×32 displays collapsing to ONE segment,
# so every mask-family row measured a constant-heatmap baseline.
#
#   1. the primary 16-method N=64 synthetic table (replaces the
#      committed method_comparison.json)
#   2. the GP-smoothing ablation on the soft knockout field
#   3. the hard-label window hypothesis under --skip-degenerate
#
# Run from the repo root when the axon tunnel answers:
#   bash benchmarks/run_onchip_r5c.sh [outdir] [ckpt.msgpack]

set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/onchip_r5c}"
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

# 1. Primary table, all 16 methods, multi-segment masks for the first time.
run method_comparison_v2 python -m network_interpretation_imagenet_tpu.cli.compare_saliency_methods \
  --arch resnet --depth 56 --dataset cifar10 --synthetic \
  --ckpt "$CKPT" --num-images 64 --fidelity-steps 32 --bootstrap 4000 \
  --out docs/profiles/method_comparison_cifar10_r5

# 2. GP-smoothing ablation: field vs gp vs gp_cls, soft knockout labels.
run gp_ablation_soft_v2 python -m network_interpretation_imagenet_tpu.cli.compare_saliency_methods \
  --arch resnet --depth 56 --dataset cifar10 --synthetic \
  --ckpt "$CKPT" --num-images 32 --fidelity-steps 32 --bootstrap 4000 \
  --methods field,gp,gp_cls,knockout,window,rise \
  --gp-field knockout --gp-labels soft \
  --out docs/profiles/method_comparison_cifar10_r5/gp_ablation_soft

# 3. Hard-label window hypothesis, conditioned on informative images.
run gp_hard_skip_v2 python -m network_interpretation_imagenet_tpu.cli.compare_saliency_methods \
  --arch resnet --depth 56 --dataset cifar10 --synthetic \
  --ckpt "$CKPT" --num-images 8 --fidelity-steps 32 --bootstrap 4000 \
  --methods field,gp,gp_cls,window,rise --skip-degenerate \
  --out docs/profiles/method_comparison_cifar10_r5/gp_hard_skip
