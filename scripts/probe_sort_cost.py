"""Micro-bench: lax.sort variants at binning scale (stress scene).

The round-3 fine2-pre profile showed the pair sort at ~5.9 ms for 237k
pairs — the single largest pre-stage op (docs/PERFORMANCE.md).  This
probes whether a fused single-key sort (tile << 18 | pair_pos, exact
for pair counts < 2^18 and tile ids < 2^13) beats the two-array
(key, value) form, and how sort cost scales with n.

Run: JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/probe_sort_cost.py
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
    for size in (65536, 131072, 262144, 524288):
        keys = jnp.asarray(rng.integers(0, 4000, size=size), jnp.int32)
        vals = jnp.asarray(np.arange(size), jnp.int32)

        @jax.jit
        def two_array(keys, vals):
            return jax.lax.sort((keys, vals), num_keys=1)

        @jax.jit
        def single_key(keys, vals):
            packed = (keys << 18) | vals        # stable by construction
            s = jax.lax.sort(packed)
            return s >> 18, s & ((1 << 18) - 1)

        @jax.jit
        def single_key_u32(keys, vals):
            packed = (keys.astype(jnp.uint32) << 18) | vals.astype(jnp.uint32)
            s = jax.lax.sort(packed)
            return (s >> 18).astype(jnp.int32), (s & ((1 << 18) - 1)).astype(jnp.int32)

        @jax.jit
        def argsort_keys(keys, vals):
            return jnp.argsort(keys, stable=True)

        r1 = t(two_array, keys, vals)
        r2 = t(single_key, keys, vals)
        r3 = t(single_key_u32, keys, vals)
        r4 = t(argsort_keys, keys, vals)
        print(f"n={size}: two-array {r1:6.2f} ms | single-i32 {r2:6.2f} | "
              f"single-u32 {r3:6.2f} | argsort {r4:6.2f}", flush=True)


if __name__ == "__main__":
    main()
