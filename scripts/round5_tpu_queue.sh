#!/bin/bash
# Round-5 TPU measurement queue — run ONCE in a healthy tunnel window.
# Ordered by value: image-path A/B (headline lever), shadows depth-only
# A/B, D2H transport A/B, then the full revalidation (TPU gate + bench).
# Each step logs under $LOG; steps are independently resumable (skip
# any whose log already ends in 'DONE').
#
#   bash scripts/round5_tpu_queue.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/round5_tpu}
mkdir -p "$LOG"
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export PYTHONPATH="$PWD:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"

step() {
    local name=$1; shift
    if [ -f "$LOG/$name.log" ] && tail -1 "$LOG/$name.log" | grep -q DONE; then
        echo "== $name: already done, skipping =="
        return 0
    fi
    echo "== $name =="
    if ! timeout 240 python scripts/probe_tunnel.py; then
        echo "tunnel degraded before $name — aborting queue"
        exit 1
    fi
    ( "$@" 2>&1 && echo DONE ) | tee "$LOG/$name.log"
}

step ab_image_head    timeout 1800 python scripts/ab_image_path.py 2048 2048 30 head
step ab_image_gouraud timeout 1200 python scripts/ab_image_path.py 800 800 60 gouraud
step ab_image_stress  timeout 1800 python scripts/ab_image_path.py 1280 800 30 stress
step shadows_ab       timeout 1800 python scripts/profile_shadows.py 800 800 1024 20
step ab_d2h           timeout 1800 python scripts/ab_d2h.py 2048 2048 5
step revalidate       bash scripts/tpu_revalidate.sh "$LOG/revalidate"
echo "queue complete — logs in $LOG"
