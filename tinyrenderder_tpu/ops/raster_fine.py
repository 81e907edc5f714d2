"""Fine (strip-parallel) sparse rasterization — 8 pairs per vector step.

The coarse kernel (ops.raster_pallas) evaluates ONE (tile, triangle)
pair per vector step over a full (TILE_H, 128) tile; tiny triangles use
a few percent of each step.  This module subdivides every tile into 8
strips of (TILE_H, 16) and packs EIGHT (strip, triangle) pairs into one
record row — one pair per 16-lane group — so a vector step rasterizes
8 pairs.  A triangle spanning the whole tile lands in all 8 strip bins
within the same row budget (rows per tile = max strip bin size), so
dense scenes cost the same number of steps while tiny-triangle scenes
approach 8x (the regime of the reference hot loop our_gl.cpp:147-200 on
high-poly scenes).

Exactness design (vs the round-1 prototype,
scripts/experimental_fine_raster.py):

  * The merge keeps the coarse kernel's SUB-block argmin structure —
    the sub axis is "record rows" instead of "pairs", but the op graph
    (coverage -> affine_z -> where -> min/argmin -> select) is
    identical, which keeps XLA's FMA grouping of affine_z bitwise-
    aligned across every backend (raster_pallas.py merge note / commit
    e35d513).  Within a lane, candidates arrive in bin order (rows
    ascend = per-strip submission order) and argmin takes the first
    minimum, reproducing the reference's strict-less first-drawn-wins
    z-test (our_gl.cpp:165).  Verified bitwise vs the coarse path on
    real TPU.
  * Decision math is ops.semantics, shared verbatim.

Performance design (round-2 profiling, all on one v5e chip):

  * Records are COMPACT slot-minor rows: 64 columns x 8 slots = 512 f32
    (4 lane-rows) per record row; column c of the 8 slots occupies lanes
    [8*(c%16), +8) of lane-row c//16.  The kernel broadcasts each
    needed column to full 16-lane groups ONCE PER DMA CHUNK with a
    static-pattern lane gather (take_along_axis with an iota-derived
    index — a few register ops per plane), then the sub-steps read the
    expanded planes contiguously from VMEM scratch.  The round-2 v1
    design pre-expanded planes on the XLA side instead; the (planes, R,
    128) transpose+broadcast ran at ~60 GB/s and cost more than the
    whole kernel (52 ms at stress scale) — compact records cut that
    data movement 16x.
  * Row slots are filled by SCATTERING sorted pair ids into the
    interleaved (rows * 8) layout (a 1-word scatter, ~1 ms at 262k)
    followed by ONE packed row gather of the 64-column per-triangle
    table.  Per-index gather cost (~10-20 ns on this chip) dominates
    every pre-stage op, so each datum travels through exactly one
    gather and one scatter.
  * Strip binning reuses raster_tiled._build_bins, which packs all
    per-triangle columns into one gather and replaces integer div/mod
    (~16 ms at 262k on the VPU) with exact-f32 divmod.

Grid + outputs are the sparse active-tile form (compact blocks
scattered by tile id), so ops.raster_sparse._post_sparse_jit and the
exact-stats reduction are reused unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinyrenderder_tpu import math3d
from tinyrenderder_tpu.ops import semantics
from tinyrenderder_tpu.ops.raster import BACKGROUND
from tinyrenderder_tpu.ops.raster_tiled import (TILE_H, TILE_W, _build_bins,
                                                _cdiv, _next_pow2,
                                                _quantize_soft,
                                                _quantize_tight, _tile_spans,
                                                _vertex_stage)

__all__ = ["render_pass_fine", "STRIP_W", "STRIPS"]

STRIP_W = 16
STRIPS = TILE_W // STRIP_W            # 8 strips per (TILE_H, 128) tile

# Record layout: 64 columns x 8 slots, slot-minor (flat pos = 8*c + k).
#   0..5   screen coeff ax, ay, bx, by, cx, cy
#   6..8   ndc z0, z1, z2
#   9..12  bbox min_x, max_x, min_y, max_y
#   13..15 clip w0, w1, w2
#   16     triangle id (-1 = empty slot)
#   17..   varying corners, channel-major (3 per channel)
NCOL = 64
REC_ROWS = NCOL * STRIPS // 128       # 4 lane-rows per record row
MAX_VARY = (NCOL - 17) // 3
COL_ID = 16
VARY_COL = 17

DMA_ROWS = 32                         # record rows per HBM->VMEM copy
SUB_ROWS = 8                          # rows per vector step (= 64 pairs)

LOOP1_COLS = (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, COL_ID)


def _loop2_cols(n_vary):
    return (0, 1, 2, 3, 4, 5, 13, 14, 15, COL_ID) + tuple(
        range(VARY_COL, VARY_COL + 3 * n_vary))


# ---------------------------------------------------------------------------
# Pre-stage: strip bins -> interleaved compact records
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=(
    "shader", "width", "height", "pair_cap", "row_cap", "rec_cap", "a_cap",
    "tile_h", "tile_w", "nty_band", "ty_stride", "ntx_band", "geom_axis"))
def _pre_fine_jit(attrs, uniforms, shader, width, height, pair_cap,
                  row_cap, rec_cap, a_cap, tile_h, tile_w, ty_lo=None,
                  nty_band=None, ty_stride=1, tx_lo=None, ntx_band=None,
                  geom_axis=None, ty_rows=None):
    """Fused pre-stage: vertex transform, setup, strip binning, slot
    interleave, record build, active-tile compaction — one dispatch.

    ``row_cap`` (fine-grained) bounds the computed rows; ``rec_cap``
    (pow2, >= row_cap) is the kernel-visible record array size so Mosaic
    recompiles only per octave.

    ``ty_lo`` (traced tile-row offset) + ``nty_band`` (static tile-row
    count) restrict strip binning to a horizontal screen band for the
    sharded production path (parallel/dist.py); tile/strip ids are then
    band-local (pair with an ``origin`` on the kernel call).
    ``tx_lo``/``ntx_band`` clip columns the same way (2-D blocks).
    ``geom_axis`` shards the vertex stage over the shard_map mesh
    (raster_tiled._vertex_stage — bitwise-equal, all_gather'ed)."""
    setup, varyings = _vertex_stage(attrs, uniforms, shader, width,
                                    height, geom_axis)
    f = max(setup["valid"].shape[0], 1)
    ntx = ntx_band if ntx_band is not None else _cdiv(width, tile_w)
    nty = nty_band if nty_band is not None else _cdiv(height, tile_h)
    n_tiles = ntx * nty
    nsx = ntx * STRIPS
    n_strips = nsx * nty
    # ty_rows (traced, <= nty_band): measured-load bands — the device
    # owns only its first ty_rows rows of the static band shape
    ty_hi = (None if ty_lo is None
             else (nty - 1 if ty_stride > 1
                   else ty_lo + ((ty_rows - 1) if ty_rows is not None
                                 else nty - 1)))
    # column clip in STRIP units (the bins below are strip-granularity)
    sx_lo = None if tx_lo is None else tx_lo * STRIPS
    sx_hi = None if tx_lo is None else sx_lo + (nsx - 1)

    # strip-granularity bins; strip id = 8*tile + k (tile tx's strips are
    # columns tx*8..tx*8+7 of the strip grid)
    tx0, ty0, span_x, spans, pair_total = _tile_spans(
        setup, STRIP_W, tile_h, ty_lo, ty_hi, sx_lo, sx_hi,
        ty_stride=ty_stride)
    sorted_tri, start, counts, sorted_key = _build_bins(
        tx0, ty0, span_x, spans, pair_cap, nsx, nty, return_keys=True)
    counts_t = counts.reshape(n_tiles, STRIPS)
    rows_t = jnp.max(counts_t, axis=1)              # (T,)
    row_start = jnp.cumsum(rows_t) - rows_t         # (T,) exclusive
    row_total = jnp.sum(rows_t)

    # interleaved slot fill: sorted pair q of strip s goes to flat slot
    # (row_start[tile] + rank-in-strip) * 8 + strip-in-tile.  Both
    # per-strip columns (segment start, owning tile's row_start) travel
    # through ONE packed small-table gather — per-index cost dominates.
    q = jnp.arange(pair_cap, dtype=jnp.int32)
    live_pair = sorted_key < n_strips
    s_safe = jnp.minimum(sorted_key, n_strips - 1)
    strip_tbl = jnp.stack(
        [start[:-1], jnp.repeat(row_start, STRIPS, total_repeat_length=n_strips)],
        axis=1)                                     # (n_strips, 2)
    sg = strip_tbl[s_safe]
    rank = q - sg[:, 0]
    k_of = s_safe & 7
    dst = (sg[:, 1] + rank) * STRIPS + k_of
    dst = jnp.where(live_pair & (dst < row_cap * STRIPS),
                    dst, row_cap * STRIPS)
    tri8 = (jnp.full((row_cap * STRIPS,), -1, jnp.int32)
            .at[dst].set(sorted_tri, mode="drop")
            .reshape(row_cap, STRIPS))

    # per-triangle column table -> one packed row gather
    if shader.writes_color:
        from tinyrenderder_tpu.ops.raster_tiled import _flatten_varyings
        spec = tuple(shader.varying_spec.items())
        vary_corners = _flatten_varyings(varyings, spec)       # (F, 3, V)
        n_vary = vary_corners.shape[-1]
        if n_vary > MAX_VARY:
            raise ValueError(f"{n_vary} varying channels > {MAX_VARY} max")
        vary_cols = (vary_corners.astype(jnp.float32)
                     .transpose(0, 2, 1).reshape(-1, 3 * n_vary))
    else:
        n_vary = 0
        vary_cols = jnp.zeros((f, 0), jnp.float32)
    tbl = jnp.concatenate([
        setup["screen"].reshape(-1, 6).astype(jnp.float32),    # 0..5
        setup["ndc_z"].astype(jnp.float32),                    # 6..8
        setup["bbox"].astype(jnp.float32),                     # 9..12
        setup["clip_w"].astype(jnp.float32),                   # 13..15
        jnp.arange(f, dtype=jnp.float32)[:, None],             # 16 id
        vary_cols,                                             # 17..
    ], axis=1)
    tbl = jnp.pad(tbl, ((0, 0), (0, NCOL - tbl.shape[1])))
    padrow = jnp.zeros((NCOL,), jnp.float32).at[COL_ID].set(-1.0)
    g = jnp.where((tri8 >= 0)[..., None],
                  tbl[jnp.maximum(tri8, 0)], padrow)           # (R, 8, 64)
    rec = (g.transpose(0, 2, 1)                                # slot-minor
            .reshape(row_cap, REC_ROWS, 128))
    # kernel-visible array: pow2-padded so Mosaic compiles per octave
    rec_full = jnp.zeros((rec_cap + DMA_ROWS, REC_ROWS, 128), jnp.float32)
    rec_full = jax.lax.dynamic_update_slice(rec_full, rec, (0, 0, 0))

    # active-tile compaction (tiles with rows > 0), raster_sparse form
    active = rows_t > 0
    n_active = jnp.sum(active.astype(jnp.int32))
    apos = jnp.cumsum(active.astype(jnp.int32)) - 1
    slot = jnp.where(active, apos, a_cap)
    ids = jnp.full((a_cap,), n_tiles, jnp.int32).at[slot].set(
        jnp.arange(n_tiles, dtype=jnp.int32), mode="drop")
    kernel_ids = jnp.minimum(ids, n_tiles - 1)
    row_start_a = jnp.minimum(row_start[kernel_ids],
                              row_cap).astype(jnp.int32)
    rows_a = jnp.where(ids < n_tiles, rows_t[kernel_ids], 0)
    rows_a = jnp.minimum(rows_a, row_cap - row_start_a).astype(jnp.int32)
    return (setup, rec_full, ids, kernel_ids, row_start_a, rows_a,
            pair_total, row_total, n_active, n_vary)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _fine_kernel(ids_ref, start_ref, rows_ref, origin_ref,
                 rec_hbm, init_ref,
                 depth_ref, winner_ref, vary_ref, buf, sem, planes_ref,
                 *, n_tiles_x, tile_h, tile_w, n_vary,
                 dma_rows=DMA_ROWS, sub=SUB_ROWS, sub2=None, ev_ref=None,
                 y_stride=None):
    i = pl.program_id(0)
    t = ids_ref[i]                      # clamped; padding rows = 0
    seg_start = start_ref[i]
    count = rows_ref[i]                 # record ROWS for this tile

    dtype = jnp.float32
    if y_stride is None:
        y_stride = tile_h               # contiguous band (or single device)
    gx0 = (origin_ref[0] + (t % n_tiles_x) * tile_w).astype(jnp.int32)
    gy0 = (origin_ref[1] + (t // n_tiles_x) * y_stride).astype(jnp.int32)
    xi = (gx0 + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
          ).astype(dtype)
    yi = (gy0 + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
          ).astype(dtype)
    half = jnp.asarray(0.5, dtype)
    px = (xi + half)[None]
    py = (yi + half)[None]
    xi = xi[None]
    yi = yi[None]

    depth_ref[0] = init_ref[0]
    winner_ref[0] = jnp.full((tile_h, tile_w), float(BACKGROUND), dtype)
    if n_vary:
        vary_ref[0] = jnp.zeros((n_vary, tile_h, tile_w), dtype)
    if ev_ref is not None:
        ev_ref[0, 0] = jnp.zeros((tile_h, tile_w), dtype)
        ev_ref[0, 1] = jnp.full((tile_h, tile_w), -jnp.inf, dtype)

    n_chunks = pl.cdiv(count, dma_rows)

    def get_dma(slot, chunk_idx):
        return pltpu.make_async_copy(
            rec_hbm.at[pl.ds(seg_start + chunk_idx * dma_rows,
                             dma_rows), :, :],
            buf.at[slot],
            sem.at[slot],
        )

    # static lane-gather patterns: column c of the 8 slots lives in lanes
    # [8*(c%16), +8) of lane-row c//16; broadcast slot k's value to lanes
    # [16k, 16k+16)
    if sub2 is None:
        sub2 = sub                      # loop-2 sub-block rows
    lane16 = jax.lax.broadcasted_iota(jnp.int32, (dma_rows, 128), 1) // 16
    lane16_sub2 = jax.lax.broadcasted_iota(jnp.int32, (sub2, 128), 1) // 16

    def expand(slot, cols):
        """Broadcast the given record columns to (len(cols), dma_rows,
        128) planes in VMEM scratch — once per chunk."""
        for n, c in enumerate(cols):
            lane_rows = buf[slot, :, c // 16, :]        # (dma_rows, 128)
            idx = 8 * (c % 16) + lane16                 # static pattern
            planes_ref[n] = jnp.take_along_axis(lane_rows, idx, axis=1)

    def extract(slot, r0, c):
        """One column's (sub2, 1, 128) plane straight from the compact
        chunk buffer — the per-sub-step (lazy) form of ``expand``."""
        lane_rows = buf[slot, pl.ds(r0, sub2), c // 16, :]
        idx = 8 * (c % 16) + lane16_sub2
        return jnp.take_along_axis(lane_rows, idx, axis=1)[:, None, :]

    def stream(cols, process_sub, lazy=False, sub_rows=sub):
        """Double-buffered loop over this tile's record rows.  With
        ``lazy`` the columns are not pre-expanded per chunk: process_sub
        receives the buffer slot and extracts what it needs (so a
        winner-less sub-block skips almost all expansion work)."""
        @pl.when(n_chunks > 0)
        def _():
            get_dma(0, 0).start()

        def chunk_body(ci, _):
            slot = ci % 2

            @pl.when(ci + 1 < n_chunks)
            def _():
                get_dma((ci + 1) % 2, ci + 1).start()

            get_dma(slot, ci).wait()
            if not lazy:
                expand(slot, cols)

            def sub_body(s, _):
                row0 = ci * dma_rows + s * sub_rows

                @pl.when(row0 < count)
                def _():
                    process_sub(slot, s * sub_rows, row0)
                return 0

            jax.lax.fori_loop(0, dma_rows // sub_rows, sub_body, 0)
            return 0

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

    def planes(r0, j0, n):                          # n x (sub, 1, 128)
        return [planes_ref[j, pl.ds(r0, sub), :][:, None, :]
                for j in range(j0, j0 + n)]

    def live_mask(row0, sub_rows=sub):
        row_idx = (row0
                   + jax.lax.broadcasted_iota(jnp.int32, (sub_rows, 1, 1), 0))
        return row_idx < count

    # ---- loop 1: depth resolve (argmin structure == coarse kernel) --------
    def depth_sub(slot, r0, row0):
        ax, ay, bx, by, cx, cy = planes(r0, 0, 6)
        b0, b1, b2, _ = semantics.barycentric(ax, ay, bx, by, cx, cy,
                                              px, py, jnp)
        covered = semantics.coverage_mask(b0, b1, b2)
        z0, z1, z2 = planes(r0, 6, 3)
        z = semantics.affine_z(z0, z1, z2, b0, b1, b2)
        covered &= jnp.isfinite(z)
        x0b, x1b, y0b, y1b = planes(r0, 9, 4)
        covered &= (xi >= x0b) & (xi <= x1b) & (yi >= y0b) & (yi <= y1b)
        ids = planes(r0, 13, 1)[0]
        covered &= ids >= 0                          # -1 = empty strip slot
        covered &= live_mask(row0)

        zc = jnp.where(covered, z, jnp.inf)
        if ev_ref is not None:
            p = zc
            s = 1
            while s < sub:
                shifted = jnp.concatenate(
                    [jnp.full((s, tile_h, tile_w), jnp.inf, dtype),
                     p[:-s]], axis=0)
                p = jnp.minimum(p, shifted)
                s *= 2
            excl = jnp.concatenate(
                [jnp.full((1, tile_h, tile_w), jnp.inf, dtype), p[:-1]],
                axis=0)
            thresh = jnp.minimum(excl, depth_ref[0][None])
            events = zc < thresh
            ev_ref[0, 0] += jnp.sum(
                jnp.where(events, jnp.asarray(1.0, dtype), 0.0), axis=0)
            ev_ref[0, 1] = jnp.maximum(
                ev_ref[0, 1],
                jnp.max(jnp.where(events, zc, -jnp.inf), axis=0))
        # same argmin merge as the coarse kernel (raster_pallas.py merge
        # note / e35d513): rows ascend in per-strip bin order, argmin's
        # first-minimum rule = first-drawn-wins at exact z ties
        zmin = jnp.min(zc, axis=0)
        best = jnp.argmin(zc, axis=0)
        sel = jax.lax.broadcasted_iota(
            jnp.int32, (sub, tile_h, tile_w), 0) == best[None]
        win = jnp.sum(jnp.where(sel, ids, 0.0), axis=0)

        better = zmin < depth_ref[0]
        depth_ref[0] = jnp.where(better, zmin, depth_ref[0])
        winner_ref[0] = jnp.where(better, win, winner_ref[0])

    stream(LOOP1_COLS, depth_sub)

    # ---- loop 2: varying interpolation for winners ------------------------
    if n_vary:
        def vary_sub(slot, r0, row0):
            # lazy: only the id column is extracted unconditionally; a
            # winner-less sub-block (most of them on high-overdraw
            # scenes) skips the other 9 + 3V column expansions entirely
            ids = extract(slot, r0, COL_ID)
            mine = ((winner_ref[0][None] == ids)
                    & (ids >= 0)                      # pad != BACKGROUND
                    & live_mask(row0, sub2))
            hit_any = jnp.any(mine)

            @pl.when(hit_any)
            def _():
                ax, ay, bx, by, cx, cy = (extract(slot, r0, c)
                                          for c in range(6))
                b0, b1, b2, _ = semantics.barycentric(
                    ax, ay, bx, by, cx, cy, px, py, jnp)
                w0, w1, w2 = (extract(slot, r0, c) for c in (13, 14, 15))
                pb0, pb1, pb2 = semantics.perspective_correct_bary(
                    b0, b1, b2, w0, w1, w2, jnp)
                hit = jnp.any(mine, axis=0)
                for c in range(n_vary):
                    v0, v1, v2 = (extract(slot, r0, VARY_COL + 3 * c + j)
                                  for j in range(3))
                    val = semantics.interp3(v0, v1, v2, pb0, pb1, pb2)
                    contrib = jnp.sum(jnp.where(mine, val, 0.0), axis=0)
                    vary_ref[0, c] = jnp.where(hit, contrib, vary_ref[0, c])

        stream((), vary_sub, lazy=True, sub_rows=sub2)


@functools.partial(jax.jit, static_argnames=(
    "n_tiles_x", "n_tiles_y", "tile_h", "tile_w", "n_vary", "interpret",
    "dma_rows", "sub", "sub2", "collect_stats", "y_stride"))
def _fine_call_jit(ids, row_start, rows, rec, depth_tiles,
                   n_tiles_x, n_tiles_y, tile_h, tile_w, n_vary,
                   interpret, origin=None, dma_rows=DMA_ROWS,
                   sub=SUB_ROWS, sub2=None, collect_stats=False,
                   y_stride=None):
    a_cap = ids.shape[0]
    if origin is None:
        origin = jnp.zeros((2,), jnp.int32)
    kernel = functools.partial(_fine_kernel, n_tiles_x=n_tiles_x,
                               tile_h=tile_h, tile_w=tile_w, n_vary=n_vary,
                               dma_rows=dma_rows, sub=sub, sub2=sub2,
                               y_stride=y_stride)

    n_planes = len(LOOP1_COLS)        # loop 2 extracts lazily from buf
    if collect_stats:
        def fine_kernel(ids_r, start_r, rows_r, origin_r, r1, init,
                        depth_o, winner_o, vary_o, ev_o, b, s, p):
            kernel(ids_r, start_r, rows_r, origin_r, r1, init,
                   depth_o, winner_o, vary_o, b, s, p, ev_ref=ev_o)
    else:
        fine_kernel = kernel

    out_block = pl.BlockSpec((1, tile_h, tile_w),
                             lambda i, ids, s, c, o: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    vary_block = pl.BlockSpec((1, max(n_vary, 1), tile_h, tile_w),
                              lambda i, ids, s, c, o: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    ev_block = pl.BlockSpec((1, 2, tile_h, tile_w),
                            lambda i, ids, s, c, o: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [out_block, out_block, vary_block]
    out_shape = [
        jax.ShapeDtypeStruct((a_cap, tile_h, tile_w), jnp.float32),
        jax.ShapeDtypeStruct((a_cap, tile_h, tile_w), jnp.float32),
        jax.ShapeDtypeStruct((a_cap, max(n_vary, 1), tile_h, tile_w),
                             jnp.float32),
    ]
    if collect_stats:
        out_specs.append(ev_block)
        out_shape.append(
            jax.ShapeDtypeStruct((a_cap, 2, tile_h, tile_w), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(a_cap,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),     # records stay in HBM
            pl.BlockSpec((1, tile_h, tile_w),         # frame depth gather
                         lambda i, ids, s, c, o: (ids[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, dma_rows, REC_ROWS, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((n_planes, dma_rows, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        fine_kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(ids, row_start, rows, origin.astype(jnp.int32), rec, depth_tiles)
    if collect_stats:
        return out
    return list(out) + [None]


# ---------------------------------------------------------------------------
# Pass driver (contract-compatible with raster_sparse.render_pass_tiles)
# ---------------------------------------------------------------------------

# (F, ntx, nty) -> (pair_cap, row_cap, a_cap, w_cap)
_FINE_CAPACITY: dict = {}
_FINE_PENDING: dict = {}
#: keys whose won-tile cap already refined (shrink happens ONCE — see
#: raster_sparse._W_REFINED for the per-frame-recompile failure mode)
_W_REFINED: set = set()


def _resolve_pending(key, n_tiles):
    """Async-mode bookkeeping: fold a previous frame's (pair, row,
    active) totals into the capacity cache once their D2H has landed."""
    from tinyrenderder_tpu.ops import raster_sparse
    prev = _FINE_PENDING.get(key)
    if prev is None:
        return
    totals_dev, prev_caps, age = prev
    ready = getattr(totals_dev, "is_ready", lambda: True)()
    # never block on an un-landed D2H (see raster_sparse._resolve_pending)
    if ready:
        _FINE_PENDING.pop(key)
        t = [int(x) for x in np.asarray(totals_dev)[:4]]
        pt, rt, pa = t[0], t[1], t[2]
        wt = t[3] if len(t) > 3 else -1
        # current caps, not the pending snapshot (see raster_sparse
        # _resolve_pending — a snapshot write can revert interim growth)
        cur = _FINE_CAPACITY.get(key, prev_caps)
        pc, rc, ac, *rest = cur
        wc = rest[0] if rest else ac
        qa = raster_sparse._quantize_active
        if pt > pc or rt > rc or pa > ac or wt > wc:
            import logging
            logging.getLogger(__name__).warning(
                "fine overflow (pairs %d/%d, rows %d/%d, tiles %d/%d, "
                "won %d/%d) detected %d frame(s) late; capacity grown",
                pt, pc, rt, rc, pa, ac, wt, wc, age + 1)
            _FINE_CAPACITY[key] = (
                max(pc, _quantize_tight(pt)),
                max(rc, _quantize_tight(rt)),
                max(ac, qa(pa, n_tiles)),
                max(min(wc, ac), qa(max(wt, 0), n_tiles)))
            if wt >= 0:       # the depth-only sentinel never consumes
                _W_REFINED.add(key)       # the one-time w refinement
        else:
            raster_sparse._won_refine_once("fine", key, wt, n_tiles)
    else:
        _FINE_PENDING[key] = (totals_dev, prev_caps, age + 1)


def _resolve_caps(key, attrs, uniforms, shader, width, height,
                  tile_h, tile_w, n_tiles):
    caps = _FINE_CAPACITY.get(key)
    if caps is None:
        caps = _probe_caps(attrs, uniforms, shader, width, height,
                           tile_h, tile_w, n_tiles)
    if len(caps) == 3:
        caps = (*caps, caps[2])         # w_cap seeds = a_cap
    _FINE_CAPACITY[key] = caps
    return caps


def render_pass_fine(ft, attrs: dict, shader, uniforms: dict,
                     width: int, height: int, winner_offset: int = 0,
                     tile_h: int = TILE_H, tile_w: int = TILE_W,
                     strict_capacity: bool = True,
                     interpret: bool | None = None,
                     collect_stats: bool = False,
                     _caps: tuple | None = None):
    """Strip-parallel render of one (mesh, shader) pass on a
    tiled-resident frame.  Same contract as
    raster_sparse.render_pass_tiles (incl. collect_stats)."""
    from tinyrenderder_tpu.ops import raster_sparse

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    uniforms = dict(uniforms)
    f = attrs["position"].shape[0]
    n_tiles_x = _cdiv(width, tile_w)
    n_tiles_y = _cdiv(height, tile_h)
    n_tiles = n_tiles_x * n_tiles_y
    if f == 0:
        empty = {"valid": jnp.zeros((0,), bool),
                 "screen": jnp.zeros((0, 3, 2), jnp.float32),
                 "ndc_z": jnp.zeros((0, 3), jnp.float32),
                 "clip_w": jnp.zeros((0, 3), jnp.float32),
                 "bbox": jnp.zeros((0, 4), jnp.int32)}
        if collect_stats:
            zero = jnp.float32(0)
            return (ft, empty, jnp.asarray(False),
                    (zero, jnp.float32(jnp.inf), jnp.float32(-jnp.inf)))
        return ft, empty, jnp.asarray(False)

    key = (f, n_tiles_x, n_tiles_y, tile_h, tile_w)

    if not strict_capacity:
        _resolve_pending(key, n_tiles)

    if _caps is not None:
        caps = _caps
        _FINE_CAPACITY[key] = caps
    else:
        caps = _resolve_caps(key, attrs, uniforms, shader, width, height,
                             tile_h, tile_w, n_tiles)
    if len(caps) == 3:
        caps = (*caps, caps[2])
    pair_cap, row_cap, a_cap, w_cap = caps
    rec_cap = _next_pow2(row_cap)

    spec = (tuple(shader.varying_spec.items())
            if shader.writes_color else ())
    n_vary = sum(c for _, c in spec)
    (setup, rec, ids, kernel_ids, row_start_a, rows_a,
     pair_total, row_total, n_active, _) = _pre_fine_jit(
        attrs, uniforms, shader, width, height, pair_cap, row_cap,
        rec_cap, a_cap, tile_h, tile_w)
    depth_c, winner_c, vary_c, _ = _fine_call_jit(
        kernel_ids, row_start_a, rows_a, rec, ft.depth,
        n_tiles_x, n_tiles_y, tile_h, tile_w, n_vary, interpret)
    new_ft, won_total = raster_sparse._post_sparse_jit(
        ft, ids, kernel_ids, depth_c, winner_c, vary_c, uniforms,
        jnp.int32(winner_offset), shader, spec, w_cap=w_cap)
    overflowed = ((pair_total > pair_cap) | (row_total > row_cap)
                  | (n_active > a_cap) | (won_total > w_cap))
    events = None
    if collect_stats:
        # separate depth-only launch for the exact counters — the ev
        # chain must never perturb the frame kernel (see raster_sparse)
        d_ev, w_ev, _, ev_c = _fine_call_jit(
            kernel_ids, row_start_a, rows_a, rec, ft.depth,
            n_tiles_x, n_tiles_y, tile_h, tile_w, 0, interpret,
            collect_stats=True)
        events = raster_sparse._reduce_events_jit(
            ev_c, d_ev, w_ev, ids, n_tiles)

    if strict_capacity:
        pt, rt, act, wt = (int(x) for x in jax.device_get(
            (pair_total, row_total, n_active, won_total)))
        qa = raster_sparse._quantize_active
        if pt > pair_cap or rt > row_cap or act > a_cap or wt > w_cap:
            # grow from the CURRENT store, not the plan snapshot
            # (another same-key pass may have grown it — f67fb41)
            cpc, crc, cac, *crest = _FINE_CAPACITY.get(
                key, (pair_cap, row_cap, a_cap, w_cap))
            cwc = crest[0] if crest else cac
            grown = (max(cpc, _quantize_tight(pt)),
                     max(crc, _quantize_tight(rt)),
                     max(cac, qa(act, n_tiles)),
                     max(min(cwc, cac), qa(max(wt, 0), n_tiles)))
            _FINE_CAPACITY[key] = grown
            if wt >= 0:       # the depth-only sentinel never consumes
                _W_REFINED.add(key)       # the one-time w refinement
            return render_pass_fine(ft, attrs, shader, uniforms,
                                    width, height, winner_offset,
                                    tile_h, tile_w, strict_capacity,
                                    interpret, collect_stats, _caps=grown)
        raster_sparse._won_refine_once("fine", key, wt, n_tiles)
    else:
        raster_sparse._fold_or_stage_pending(
            _FINE_PENDING, key,
            jnp.stack([pair_total, row_total, n_active, won_total]), caps)
    if collect_stats:
        return new_ft, setup, overflowed, events
    return new_ft, setup, overflowed


@functools.partial(jax.jit, static_argnames=("shader", "width", "height",
                                             "tile_h", "tile_w"))
def _probe_totals_jit(attrs, uniforms, shader, width, height,
                      tile_h, tile_w):
    """First-frame probe: strip pair total (exact, no capacity needed)."""
    dtype = attrs["position"].dtype
    clip, _ = shader.vertex(uniforms, attrs, jnp)
    vp = jnp.asarray(math3d.viewport(0, 0, width, height), dtype=dtype)
    setup = semantics.triangle_setup_planes(clip, vp, width, height, jnp)
    *_, pair_total = _tile_spans(setup, STRIP_W, tile_h)
    return setup, pair_total


@functools.partial(jax.jit, static_argnames=("pair_cap", "width", "height",
                                             "tile_h", "tile_w"))
def _probe_rows_jit(setup, pair_cap, width, height, tile_h, tile_w):
    ntx = _cdiv(width, tile_w)
    nty = _cdiv(height, tile_h)
    tx0, ty0, span_x, spans, _ = _tile_spans(setup, STRIP_W, tile_h)
    _, _, counts = _build_bins(tx0, ty0, span_x, spans, pair_cap,
                               ntx * STRIPS, nty)
    counts_t = counts.reshape(ntx * nty, STRIPS)
    rows_t = jnp.max(counts_t, axis=1)
    return jnp.sum(rows_t), jnp.sum((rows_t > 0).astype(jnp.int32))


def _probe_caps(attrs, uniforms, shader, width, height, tile_h, tile_w,
                n_tiles):
    """First frame of a (mesh, resolution) key: sync pair/row/active
    totals once to size the static capacities."""
    from tinyrenderder_tpu.ops import raster_sparse
    setup, pair_total = _probe_totals_jit(attrs, uniforms, shader,
                                          width, height, tile_h, tile_w)
    pair_cap = _quantize_tight(int(jax.device_get(pair_total)))
    row_total, n_active = _probe_rows_jit(setup, pair_cap, width, height,
                                          tile_h, tile_w)
    rt, act = (int(x) for x in jax.device_get((row_total, n_active)))
    return (pair_cap, _quantize_tight(rt),
            raster_sparse._quantize_active(act, n_tiles))
