"""Micro-bench: row-gather cost vs row width at record-build scale.

The fine2 pre's record gather (tbl[tri8]: 344k indices into a
(246k, 64) f32 table) measured ~5.2 ms on the stress scene.  If the
gather is per-index-bound, shrinking NCOL buys nothing; if it is
bandwidth-bound, a 48-col phong layout (-25% bytes) is ~1.3 ms.

Run: JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/probe_gather_cost.py
"""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np


def t(fn, *args, n=20, warmup=3):
    from bench import _force, _measure_rtt
    for _ in range(warmup):
        _force(fn(*args))
    rtt = _measure_rtt()
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    _force(r)
    return (time.perf_counter() - t0 - rtt) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    f = 246240
    nidx = 344064
    idx = jnp.asarray(rng.integers(0, f, size=nidx), jnp.int32)
    for ncol in (8, 16, 32, 48, 64):
        tbl = jnp.asarray(rng.standard_normal((f, ncol)), jnp.float32)

        @jax.jit
        def g(tbl, idx):
            return tbl[idx]

        ms = t(g, tbl, idx)
        gbps = nidx * ncol * 4 / ms / 1e6
        print(f"ncol={ncol:3d}: {ms:6.2f} ms  ({nidx / ms / 1e3:6.0f} "
              f"Kidx/ms = {1e6 * ms / nidx:5.1f} ns/idx, {gbps:5.1f} GB/s)",
              flush=True)

    # sorted (spatially coherent) indices — does locality help?
    idx_sorted = jnp.sort(idx)
    tbl = jnp.asarray(rng.standard_normal((f, 64)), jnp.float32)

    @jax.jit
    def g64(tbl, idx):
        return tbl[idx]

    print(f"ncol=64 sorted idx: {t(g64, tbl, idx_sorted):6.2f} ms")


if __name__ == "__main__":
    main()
