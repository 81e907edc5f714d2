"""EXPERIMENT (round-3 groundwork): Mosaic pair-rank kernel.

The stress scene's fine-path pre-stage is bound by the XLA binning
chain (span expansion + sort + rank/row lookups ~ 10 ms at 246k
triangles, round-2 profiling).  The sort itself is cheap (~1 ms) — the
cost is per-pair gathers and the scatter/cummax expansion machinery.

This prototype computes, per (triangle, strip-slot) pair, the STRIP ID
and the pair's SUBMISSION RANK within its strip — the two quantities
the interleaved record layout needs (dst = (row_start[tile] + rank) * 8
+ strip&7) — in ONE sequential-grid Pallas kernel:

  * grid over triangle chunks; per-strip counters persist in VMEM
    scratch across grid steps (the TPU grid is a sequential loop);
  * counter lookups and histogram updates use FACTORIZED one-hot
    (strip row/col) MXU matmuls with HIGHEST precision — no dynamic
    VMEM gathers (Mosaic has none);
  * intra-chunk same-strip prefix counts come from an (N, N)
    compare + masked row-sum (N = chunk_slots, kept small).

Exactness: ranks are exactly the stable-sort ranks because chunks are
processed in submission order and the intra-chunk prefix respects slot
order.  Validated against the production sort-based chain.

STATUS (round 2, real v5e): CORRECTNESS PROVEN — strips and ranks exact
vs the sort-based reference on clustered synthetic data; 1.55-1.88 ms
for 60k triangles (240k slots), and NEARLY FLAT in CHUNK (64/128/256
all ~1.6 ms), so the (N, N) intra-chunk prefix is NOT the bottleneck —
the kernel is overhead/bandwidth-bound.  Scaled to the stress scene
(246k triangles) that projects to ~6.5 ms vs ~10 ms for the XLA chain
it would replace.  CAVEAT discovered while planning integration: the
downstream dst computation (row_start lookup + scatter) currently runs
on the 245k-pair stream; kernel outputs are SLOT-indexed (f*S_CAP =
984k, ~70% dead at avg span 1.2), so the dst gather would inflate 4x
(~+7 ms) unless dst is also computed in-kernel (a second pass with a
factorized row_start lookup — ~+3 ms).  As-is the full replacement is
roughly a WASH; the net win only materializes after the dead-slot
padding is solved, and no order-preserving compaction was found in
round 2 (virtual-triangle splitting rebuilds the very expansion chain
it replaces).  Round 3 should treat this as a validated mechanism
looking for a better slot layout, not a ready drop-in.

Usage: python scripts/experimental_rank_kernel.py [interpret]
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S_CAP = 4          # max strip-slots per triangle handled by the kernel
CHUNK = 128        # triangles per grid step (N = CHUNK*S_CAP slot rows)
ROWS_PAD = 64      # counter table rows (>= strip-grid rows)
COLS_PAD = 128     # counter table cols (>= strip-grid cols)


def _rank_kernel(sy_ref, sx_ref, valid_ref,
                 strips_out, ranks_out, counters, *, nsx):
    c = pl.program_id(0)
    n = CHUNK * S_CAP

    @pl.when(c == 0)
    def _():
        counters[...] = jnp.zeros((ROWS_PAD, COLS_PAD), jnp.float32)

    sy_f = sy_ref[0, 0].astype(jnp.float32)       # (N,) slot strip rows
    sx_f = sx_ref[0, 0].astype(jnp.float32)       # (N,) slot strip cols
    vf = valid_ref[0, 0].astype(jnp.float32)      # 1.0 live / 0.0 pad

    # factorized one-hot (exact 0/1 f32)
    rows_i = jax.lax.broadcasted_iota(
        jnp.int32, (n, ROWS_PAD), 1).astype(jnp.float32)
    cols_i = jax.lax.broadcasted_iota(
        jnp.int32, (n, COLS_PAD), 1).astype(jnp.float32)
    ohr = jnp.where(rows_i == sy_f[:, None], 1.0, 0.0) * vf[:, None]
    ohc = jnp.where(cols_i == sx_f[:, None], 1.0, 0.0) * vf[:, None]

    # rank base: counters[sy, sx] via (N,R)@(R,C) then col-select
    lk = jax.lax.dot_general(
        ohr, counters[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)      # (N, COLS)
    rank_base = jnp.sum(lk * ohc, axis=1)         # (N,)

    # intra-chunk prefix count of equal strips among EARLIER slots
    eq = ((sy_f[:, None] == sy_f[None, :])
          & (sx_f[:, None] == sx_f[None, :]))
    lt = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
          < jax.lax.broadcasted_iota(jnp.int32, (n, n), 0))
    prefix = jnp.sum(jnp.where(eq & lt, 1.0, 0.0)
                     * vf[:, None] * vf[None, :], axis=1)

    # histogram update: counters += ohr^T @ ohc
    counters[...] = counters[...] + jax.lax.dot_general(
        ohr, ohc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)

    strip = sy_f * nsx + sx_f
    strips_out[0, 0] = jnp.where(vf > 0, strip, -1.0)
    ranks_out[0, 0] = rank_base + prefix


@functools.partial(jax.jit, static_argnames=("nsx", "interpret"))
def rank_pairs_kernel(tx0, ty0, span_x, spans, nsx, interpret):
    """Host/XLA side: expand triangles to (f*S_CAP,) slot vectors
    (triangle-major, slot-minor = submission order), then run the
    sequential rank kernel over N-slot chunks."""
    f = tx0.shape[0]
    sx = jnp.maximum(span_x, 1)
    j = jnp.tile(jnp.arange(S_CAP, dtype=jnp.int32), f)
    rep = lambda x: jnp.repeat(x.astype(jnp.int32), S_CAP)
    sx_r = rep(sx)
    q = j // sx_r                                  # small ints: cheap
    r = j - q * sx_r
    sy = rep(ty0) + q
    sxc = rep(tx0) + r
    valid = (j < rep(spans)).astype(jnp.int32)

    n = CHUNK * S_CAP
    nchunk = -(-(f * S_CAP) // n)
    pad = nchunk * n - f * S_CAP

    def prep(x):
        return jnp.pad(x, (0, pad)).reshape(nchunk, 1, n)

    in_specs = [pl.BlockSpec((1, 1, n), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM)] * 3
    out_specs = [pl.BlockSpec((1, 1, n), lambda c: (c, 0, 0),
                              memory_space=pltpu.VMEM)] * 2
    kernel = functools.partial(_rank_kernel, nsx=nsx)
    strips, ranks = pl.pallas_call(
        kernel,
        grid=(nchunk,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((nchunk, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((nchunk, 1, n), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((ROWS_PAD, COLS_PAD), jnp.float32)],
        interpret=interpret,
    )(prep(sy), prep(sxc), prep(valid))
    return (strips.reshape(-1)[:f * S_CAP].reshape(f, S_CAP)
            .astype(jnp.int32),
            ranks.reshape(-1)[:f * S_CAP].reshape(f, S_CAP)
            .astype(jnp.int32))


def reference_ranks(tx0, ty0, span_x, spans, nsx, f):
    """Sort-based ground truth (the production chain's semantics)."""
    strips = np.full((f, S_CAP), -1, np.int64)
    ranks = np.full((f, S_CAP), -1, np.int64)
    counters = {}
    for i in range(f):
        sx = max(int(span_x[i]), 1)
        for j in range(int(spans[i])):
            s = (int(ty0[i]) + j // sx) * nsx + int(tx0[i]) + j % sx
            strips[i, j] = s
            ranks[i, j] = counters.get(s, 0)
            counters[s] = counters.get(s, 0) + 1
    return strips, ranks


def main():
    interpret = (len(sys.argv) > 1 and sys.argv[1] == "interpret") or \
        jax.default_backend() != "tpu"
    rng = np.random.default_rng(7)
    # synthetic stress-shaped data: 60k triangles, strip grid 80x50,
    # spans 1..4 with clustering
    f = 60000
    nsx, nty = 80, 50
    tx0 = (rng.beta(2, 2, f) * (nsx - 4)).astype(np.int32)
    ty0 = (rng.beta(2, 2, f) * (nty - 2)).astype(np.int32)
    span_x = rng.integers(1, 3, f).astype(np.int32)
    span_y = rng.integers(1, 3, f).astype(np.int32)
    spans = (span_x * span_y).astype(np.int32)
    assert spans.max() <= S_CAP

    s_k, r_k = rank_pairs_kernel(jnp.asarray(tx0), jnp.asarray(ty0),
                                 jnp.asarray(span_x), jnp.asarray(spans),
                                 nsx, interpret)
    s_k, r_k = np.asarray(s_k), np.asarray(r_k)
    s_ref, r_ref = reference_ranks(tx0, ty0, span_x, spans, nsx, f)
    ok_s = (s_k == s_ref).all()
    ok_r = (r_k[s_ref >= 0] == r_ref[s_ref >= 0]).all()
    print(f"strips exact: {ok_s}  ranks exact: {ok_r}")

    if not interpret:
        from bench import _force, _measure_rtt
        args = (jnp.asarray(tx0), jnp.asarray(ty0), jnp.asarray(span_x),
                jnp.asarray(spans))
        _force(rank_pairs_kernel(*args, nsx, False)[0])
        rtt = _measure_rtt()
        t0 = time.perf_counter()
        for _ in range(20):
            out = rank_pairs_kernel(*args, nsx, False)
        _force(out[0])
        ms = (time.perf_counter() - t0 - rtt) / 20 * 1e3
        print(f"kernel: {ms:.2f} ms for {f} triangles "
              f"({spans.sum()} pairs) = {ms/f*1e6:.0f} ns/tri")
    print("PROTOTYPE", "VALIDATED" if (ok_s and ok_r) else "FAILED")


if __name__ == "__main__":
    main()
