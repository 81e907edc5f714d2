"""TPU tunnel health probe (CLAUDE.md infra note).

Runs a tiny matmul with a hard SIGALRM timeout so it can never hang the
caller.  Exit 0 = healthy (prints the measured RTT), exit 2 = degraded/
unreachable within the deadline.  Use before trusting any bench number:

    timeout 130 python scripts/probe_tunnel.py [deadline_s]
"""

import os
import signal
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

DEADLINE = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0


def _die(signum, frame):
    print(f"DEGRADED: no result within {DEADLINE:.0f}s", flush=True)
    os._exit(2)


signal.signal(signal.SIGALRM, _die)
signal.alarm(int(DEADLINE))

t0 = time.time()
import jax                                    # noqa: E402
import jax.numpy as jnp                       # noqa: E402

d = jax.devices()
t1 = time.time()
x = jnp.ones((256, 256))
v = float(jax.device_get((x @ x).sum()))
t2 = time.time()
# steady-state RTT = MEDIAN of several fetches: the first post-compile
# fetch alone read ~0.45 s on 2026-08-20 while fetches 2..21 measured
# a healthy 26 ms with 0.5 ms MAD — one sample conflates warmup
# (cache writes / tunnel setup) with the steady state the benches see.
# Each fetch must be a FRESH jit execution: device_get of the same
# jax.Array twice hits its host-side cache and reads 0.000 s (observed
# 2026-08-20 14:12 — a "healthy rtt=0.000s" while a matmul took 119 s).
import functools                              # noqa: E402


@functools.partial(jax.jit)
def _probe_fn(a, j):
    return (a @ a + j).sum()


float(jax.device_get(_probe_fn(x, 0.0)))     # compile once
rtts = []
for j in range(5):
    ta = time.time()
    float(jax.device_get(_probe_fn(x, float(j + 1))))
    rtts.append(time.time() - ta)
rtts.sort()
rtt = rtts[len(rtts) // 2]
# same bar as bench._tunnel_gate (bad_rtt_s=0.2): a ~465 ms-RTT window
# slipped under a looser bar on 2026-08-19 — init completing does NOT
# make timing trustworthy
if rtt >= 0.2:
    print(f"DEGRADED: init ok but rtt={rtt:.3f}s >= 0.2s "
          f"(healthy is 0.004-0.03)", flush=True)
    sys.exit(2)
print(f"HEALTHY: devices={d[0].platform} init={t1-t0:.1f}s "
      f"first_matmul={t2-t1:.1f}s rtt={rtt:.3f}s", flush=True)
sys.exit(0)
