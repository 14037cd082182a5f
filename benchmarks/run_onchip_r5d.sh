#!/usr/bin/env bash
# Final round-5 evidence pass (after run_onchip_r5c.sh):
#   1. the real-JPEG secondary with ALL THREE adaptive fixes (the v2 run
#      predates the occlusion-patch fix)
#   2. a fresh TPU-smoke log matching the 49-test selection (the r5 log
#      predates the adaptive-defaults regression tests)
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/onchip_r5d}"
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

run jpeg_secondary_v3 python -m network_interpretation_imagenet_tpu.cli.compare_saliency_methods \
  --arch resnet --depth 56 --dataset cifar10 \
  --ckpt "$CKPT" --jpeg-dir tests/fixtures/imagenet_loc \
  --num-images 3 --fidelity-steps 32 --bootstrap 4000 \
  --out docs/profiles/method_comparison_cifar10_r5/jpeg_secondary

run tpu_smoke env NIT_TEST_TPU=1 python -m pytest tests/ -q -m tpu_smoke
