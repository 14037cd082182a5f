#!/usr/bin/env bash
# One-shot runner for the round-5 on-chip evidence backlog (VERDICT r4):
#   1. fresh TPU-smoke suite log (incl. the round-5 tests)
#   2. the 15-method fidelity study w/ GP surrogates + bootstrap tiers
#      (N=64 synthetic CIFAR + the 3 real fixture JPEGs as a secondary
#      table) on the reference's trained ResNet-56
#   3. per-phase XRAI roofline + f16-wire measurement
#   4. carried-inverse BO slope freshness rerun
#   5. serving load test with device-call attribution (the C=16 p95 tail)
#   6. full bench (new rise_sweep row)
#
# Run from the repo root when the axon tunnel answers:
#   bash benchmarks/run_onchip_r5.sh [outdir] [ckpt.msgpack]
#
# Each stage tees its log under $outdir and keeps going on failure.

set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/onchip_r5}"
CKPT="${2:-/tmp/cifar56_converted/weights.msgpack}"
mkdir -p "$OUT"
export PYTHONPATH="${PYTHONPATH:-}:$PWD"
export PYTHONUNBUFFERED=1  # stream stage logs through tee

# Every stage runs under the tunnel-flap watchdog (benchmarks/
# tpu_watchdog.py): probe until the tunnel answers, launch, and kill +
# retry if the stage flatlines on CPU (the wedged-client signature —
# the tunnel can hang a fresh client forever). --stall is generous
# because long REMOTE compiles also burn no host CPU; the persistent
# compile cache makes a false kill cheap (completed compiles are kept).
run() {
  name="$1"; shift
  echo "=== [$name] $* ==="
  ( time python benchmarks/tpu_watchdog.py --retries 5 --stall 420 \
      --timeout 3600 -- "$@" ) 2>&1 | tee "$OUT/$name.log"
  echo "=== [$name] exit=${PIPESTATUS[0]} ==="
}

# 1. Fresh smoke log (ADVICE r4: the committed log predates the newest
#    tpu_smoke test; recapture with the current selection).
run tpu_smoke env NIT_TEST_TPU=1 python -m pytest tests/ -q -m tpu_smoke

# 2. Convert the reference's trained CIFAR-10+ ResNet-56 once (idempotent).
if [ ! -f "$CKPT" ]; then
  run convert_ckpt python -m network_interpretation_imagenet_tpu.cli.convert_checkpoint \
    --arch resnet --depth 56 --dataset cifar10 \
    --ckpt /root/reference/saved_checkpoints/cifar10+-resnet-56/model_best.pth.tar \
    --out "$(dirname "$CKPT")"
fi

# 3. The 15-method study: N=64 synthetic, bootstrap tiers, all methods.
run method_comparison python -m network_interpretation_imagenet_tpu.cli.compare_saliency_methods \
  --arch resnet --depth 56 --dataset cifar10 --synthetic \
  --ckpt "$CKPT" --num-images 64 --fidelity-steps 32 --bootstrap 4000 \
  --out docs/profiles/method_comparison_cifar10_r5

# 3b. Secondary table: the 3 committed real JPEGs through the same model.
run method_comparison_jpeg python -m network_interpretation_imagenet_tpu.cli.compare_saliency_methods \
  --arch resnet --depth 56 --dataset cifar10 \
  --ckpt "$CKPT" --jpeg-dir tests/fixtures/imagenet_loc \
  --num-images 3 --fidelity-steps 32 --bootstrap 4000 \
  --out docs/profiles/method_comparison_cifar10_r5/jpeg_secondary

# 4. XRAI per-phase roofline + f16 wire.
run xrai_profile python benchmarks/profile_xrai.py

# 5. BO slope freshness (lever close-out evidence).
run bo_iter_cost python benchmarks/probe_bo_iter_cost.py

# 6. Serving load test with the device-call attribution columns.
run load_test python benchmarks/load_test.py --requests 32

# 7. Full bench (headline JSON; includes the new rise_sweep row).
run bench python bench.py

echo "All logs in $OUT"
