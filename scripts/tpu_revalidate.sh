#!/bin/bash
# One-command TPU revalidation at HEAD: tunnel health gate, on-hardware
# parity gate suite, full bench. Run after any tunnel outage or before
# trusting new numbers (CLAUDE.md: never leave a bench conclusion
# standing from a degraded window).
#
#   bash scripts/tpu_revalidate.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_revalidate}
mkdir -p "$LOG"
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export PYTHONPATH="$PWD:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"

echo "== tunnel probe =="
if ! timeout 240 python scripts/probe_tunnel.py; then
    echo "tunnel degraded/down — aborting (rerun when healthy)"
    exit 1
fi

echo "== TPU gate suite (real Mosaic kernels vs oracle/XLA) =="
TPU_TESTS=1 timeout 3600 python -m pytest tests/test_tpu_gate.py -m tpu -q \
    2>&1 | tee "$LOG/tpu_gate.log" || exit 1

echo "== full bench =="
timeout 5400 python bench.py 2>&1 | tee "$LOG/bench.log"
cp -f bench_report.json "$LOG/" 2>/dev/null
echo "logs in $LOG"
