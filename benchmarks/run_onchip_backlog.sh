#!/usr/bin/env bash
# One-shot runner for the round-3 on-chip measurement backlog
# (docs/PERFORMANCE.md "Round-3 on-chip measurement backlog").
#
# Run from the repo root the moment the axon TPU tunnel answers:
#   bash benchmarks/run_onchip_backlog.sh [outdir]
#
# Each stage tees its log under $outdir and keeps going on failure so one
# flaky stage doesn't lose the rest of the session's measurements.

set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/onchip_backlog}"
mkdir -p "$OUT"
export PYTHONPATH="${PYTHONPATH:-}:$PWD"

run() {
  name="$1"; shift
  echo "=== [$name] $* ==="
  ( time timeout 3000 "$@" ) 2>&1 | tee "$OUT/$name.log"
  echo "=== [$name] exit=${PIPESTATUS[0]} ==="
}

# 0. Is the chip actually there? Bail fast if not.
if ! timeout 300 python -c "import jax; assert jax.devices()[0].platform == 'tpu', jax.devices(); print('tpu ok:', jax.devices())"; then
  echo "TPU tunnel not answering -- aborting backlog run." >&2
  exit 1
fi

# 1. Carried-inverse fused-BO slope (the headline r3 claim to measure).
run bo_iter_cost python benchmarks/probe_bo_iter_cost.py

# 2. BO sweep pipeline (device-resident flushes, depth-2 pipeline).
run bo_pipeline python benchmarks/probe_bo_pipeline.py

# 3. Warm serving-path timings (explain/explain_batch/knockout artifacts).
run serving python benchmarks/probe_serving.py

# 3b. Sustained serving load: dynamic batching vs serialized at C=1/4/16.
run load_test python benchmarks/load_test.py --requests 32

# 4. TPU smoke subset of the test suite (recorded evidence).
run tpu_smoke env NIT_TEST_TPU=1 python -m pytest tests/ -q -m tpu_smoke

# 5. Full bench (headline JSON line; longest stage, warm cache helps).
run bench python bench.py

echo "All logs in $OUT"
