"""A/B device->host transfer strategies for the animation TGA path
(round-4 verdict #6: animation_tga_writes is D2H-bound at ~12.6 MB
color/frame through the ~20-35 MB/s tunnel).

Every variant must reconstruct the EXACT bytes on the host (the TGA
frames must stay byte-identical), so only lossless levers qualify:

  raw        (H, W, 3) u8 — the shipped path's transfer
  delta_row  u8 row delta (row[y] - row[y-1] mod 256): same byte COUNT,
             but mostly-zero on smooth frames — wins ONLY if the tunnel
             transport compresses (unknown; this measures it)
  delta_col  u8 column delta along x (pixel - left neighbor)
  zeros      all-zero plane of the same shape — the upper bound of any
             transport-compression win
  chunk4/8   the raw plane as 4/8 independent row-band copies started
             async together — tests whether the tunnel pipelines
             concurrent copies

Host-side decode (cumsum mod 256) is timed too; a variant only wins if
transfer + decode beats raw transfer.

Usage: python scripts/ab_d2h.py [width height reps]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    # a realistic frame: render the animation scene's first frame
    from bench import _scene
    scene = _scene(width, height, meshes=3)
    frame = scene.render(backend="tiled", collect_stats=False,
                         transfer=True).color          # host np (H, W, 3)
    print(f"frame rendered: {frame.shape}, "
          f"{frame.nbytes / 1e6:.1f} MB", file=sys.stderr)

    dev = jnp.asarray(frame)                            # device-resident

    @jax.jit
    def delta_row(x):
        prev = jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], axis=0)
        return x - prev                                 # u8 wraps mod 256

    @jax.jit
    def delta_col(x):
        prev = jnp.concatenate(
            [jnp.zeros_like(x[:, :1]), x[:, :-1]], axis=1)
        return x - prev

    zeros = jnp.zeros_like(dev)

    # Every arm must fetch a FRESH jax.Array: np.asarray of the same
    # array twice reads its host-side cache, not the tunnel (observed
    # 2026-08-20: the raw arm "measured" 171 GB/s while every
    # fresh-array arm measured the true 10-21 MB/s).  x + (j - j)
    # with a traced j forces a new buffer with identical bytes.
    @jax.jit
    def freshen(x, j):
        return x + (j - j)

    _ctr = [0]

    def fresh(arr):
        _ctr[0] += 1
        return freshen(arr, jnp.uint8(_ctr[0] % 250))

    def fetch(arr):
        arr.copy_to_host_async()
        return np.asarray(arr)

    def t_raw():
        return fetch(fresh(dev))

    def t_delta_row():
        d = fetch(delta_row(dev))
        return np.cumsum(d, axis=0, dtype=np.uint8)     # decode

    def t_delta_col():
        d = fetch(delta_col(dev))
        return np.cumsum(d, axis=1, dtype=np.uint8)

    def t_zeros():
        return fetch(fresh(zeros))

    def make_chunk(n):
        @jax.jit
        def split(x):
            return tuple(x[i * height // n:(i + 1) * height // n]
                         for i in range(n))

        def run():
            parts = split(fresh(dev))
            for p in parts:
                p.copy_to_host_async()
            return np.concatenate([np.asarray(p) for p in parts], axis=0)
        return run

    variants = {
        "raw": t_raw,
        "delta_row": t_delta_row,
        "delta_col": t_delta_col,
        "zeros": t_zeros,
        "chunk4": make_chunk(4),
        "chunk8": make_chunk(8),
    }
    # warm compiles + correctness
    for name, fn in variants.items():
        out = fn()
        if name != "zeros":
            assert (out == frame).all(), f"{name}: decoded bytes differ!"
    print("all variants decode byte-identical", file=sys.stderr)

    for rep in range(reps):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            print(f"rep{rep} {name}: {dt * 1e3:.1f} ms "
                  f"({frame.nbytes / dt / 1e6:.1f} MB/s)", flush=True)


if __name__ == "__main__":
    main()
