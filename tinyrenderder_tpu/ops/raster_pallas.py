"""Pallas TPU rasterization kernel over CSR triangle bins.

The performance replacement for the reference's serial per-pixel hot loop
(our_gl.cpp:147-200).  One grid step owns one (TILE_H, 128) framebuffer
tile held in VMEM; it streams its bin segment of pre-gathered triangle records
from HBM (double-buffered async DMA) in two ordered loops:

  Loop 1 — depth resolve: compare-and-select z merge per record chunk.
    Sequential order over bin entries (= submission order) reproduces the
    reference's strict-less first-drawn-wins z-test (our_gl.cpp:165) with
    no atomics.

  Loop 2 — varying interpolation: for winning records, recompute affine
    barycentrics at the pixel centers, apply the perspective-correct
    correction (our_gl.cpp:168-185), and select the interpolated varyings
    into per-tile channel planes.  This replaces phase B's per-pixel HBM
    gathers (~6 ns/index on TPU — the profiled bottleneck) with streamed
    contiguous reads; the fragment shader then runs densely in XLA.

Work is proportional to sum(per-tile bin sizes): empty tiles cost one
trip-count check (``lax.fori_loop`` with a dynamic per-tile bound from
scalar-prefetched CSR offsets).

Decision math (barycentric / affine z / perspective correction) is
ops.semantics — the same formula order as the CPU oracle — so coverage
and winner maps are bit-identical to ops.raster_tiled and colors agree
within 1 LSB (verified in interpret mode by tests/test_raster_tiled.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinyrenderder_tpu.ops import semantics
from tinyrenderder_tpu.ops.raster import BACKGROUND
from tinyrenderder_tpu.ops.raster_tiled import (TILE_H, TILE_W, Bins,
                                                _from_tiles, _to_tiles)

__all__ = ["depth_resolve_pallas", "rasterize_pallas", "build_pair_records",
           "VARY_OFF", "MAX_VARY"]

# Triangle record layout: one 128-lane f32 row per (tile, triangle) pair
# (Mosaic requires HBM slices lane-aligned to 128; the padding bandwidth
# is negligible next to per-pixel work).
#   0..5     screen ax, ay, bx, by, cx, cy
#   6..8     ndc z0, z1, z2
#   9..11    clip w0, w1, w2
#   12..15   bbox min_x, max_x, min_y, max_y (exact small ints as f32)
#   16       triangle id (exact below 2^24)
#   VARY_OFF + 3*c .. +3*c+2   corner values of varying channel c
REC = 128
VARY_OFF = 20
MAX_VARY = (REC - VARY_OFF) // 3
DMA_CHUNK = 64          # pairs per HBM->VMEM copy
SUB = 16                # pairs evaluated per vector step (A/B tuned)


@jax.jit
def build_pair_records(setup, sorted_tri, vary_corners=None):
    """Gather per-pair triangle records (P + DMA_CHUNK, REC) f32 in bin
    order.  ``vary_corners``: optional (F, 3, V) varying corner values.

    Packs one (F, REC) per-triangle record first, then expands to pairs
    with a single row gather — per-index gather cost (~6 ns on TPU)
    dominates, so one P-row gather beats five narrow ones.  The extra
    zero rows keep fixed-size chunk DMAs in bounds.
    """
    F = setup["valid"].shape[0]
    if F > 1 << 24:
        # ids ride the records as f32 (exact only below 2^24); above
        # that, loop 2's winner==id equality would match collided rows
        # and silently sum two triangles' varyings — fail loudly instead
        raise ValueError(f"{F} faces exceeds the 2^24 f32-exact id range;"
                         " split the mesh into submesh passes")
    f = max(F, 1)
    cols = [
        setup["screen"].reshape(-1, 6).astype(jnp.float32),
        setup["ndc_z"].astype(jnp.float32),
        setup["clip_w"].astype(jnp.float32),
        setup["bbox"].astype(jnp.float32),
        jnp.arange(setup["valid"].shape[0], dtype=jnp.float32)[:, None],
        jnp.zeros((setup["valid"].shape[0], VARY_OFF - 17), jnp.float32),
    ]
    if vary_corners is not None:
        v = vary_corners.shape[-1]
        if v > MAX_VARY:
            raise ValueError(f"{v} varying channels > {MAX_VARY} max")
        # channel-major: [c0 of ch0, c1 of ch0, c2 of ch0, c0 of ch1, ...]
        cols.append(vary_corners.astype(jnp.float32)
                    .transpose(0, 2, 1).reshape(-1, 3 * vary_corners.shape[-1]))
    tri_rec = jnp.concatenate(cols, axis=1)
    tri_rec = jnp.pad(tri_rec, ((0, 0), (0, REC - tri_rec.shape[1])))
    if F == 0:
        # keep the gather in range for a zero-face pass (callers guard
        # f == 0, but the function is public API): one zero row whose
        # id column stays 0 = a dead record
        tri_rec = jnp.zeros((1, REC), jnp.float32)

    safe = jnp.clip(sorted_tri, 0, f - 1)
    rec = tri_rec[safe]                              # ONE P-row gather
    return jnp.pad(rec, ((0, DMA_CHUNK), (0, 0)))


def _tile_kernel(start_ref, count_ref, origin_ref, rec_hbm, init_ref,
                 depth_ref, winner_ref, vary_ref, buf, sem,
                 *, n_tiles_x, tile_h, tile_w, n_vary,
                 dma_chunk=DMA_CHUNK, sub=SUB, ids_ref=None,
                 ev_ref=None, y_stride=None):
    if ids_ref is None:
        t = pl.program_id(0)               # dense grid: one step per tile
        seg_start = start_ref[t]
        count = count_ref[t]
    else:
        i = pl.program_id(0)               # sparse grid: active tiles only
        t = ids_ref[i]                     # already clamped; padding count=0
        seg_start = start_ref[i]
        count = count_ref[i]

    dtype = jnp.float32
    if y_stride is None:
        y_stride = tile_h                  # contiguous band / single device
    # origin: global pixel offset of this buffer (row-band sharding);
    # y_stride > tile_h = interleaved row bands (local tile row j is
    # global row origin/tile_h + j*stride)
    gx0 = (origin_ref[0] + (t % n_tiles_x) * tile_w).astype(jnp.int32)
    gy0 = (origin_ref[1] + (t // n_tiles_x) * y_stride).astype(jnp.int32)
    xi = (gx0 + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
          ).astype(dtype)                       # exact ints as f32
    yi = (gy0 + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
          ).astype(dtype)
    half = jnp.asarray(0.5, dtype)
    px = (xi + half)[None]                       # (1, TH, TW)
    py = (yi + half)[None]
    xi = xi[None]
    yi = yi[None]

    depth_ref[0] = init_ref[0]
    winner_ref[0] = jnp.full((tile_h, tile_w), float(BACKGROUND), dtype)
    if n_vary:
        vary_ref[0] = jnp.zeros((n_vary, tile_h, tile_w), dtype)
    if ev_ref is not None:
        # ev plane 0: per-pixel z-pass EVENT count (overdraw-inclusive,
        # our_gl.cpp:194); plane 1: max z over events (our_gl.cpp:199)
        ev_ref[0, 0] = jnp.zeros((tile_h, tile_w), dtype)
        ev_ref[0, 1] = jnp.full((tile_h, tile_w), -jnp.inf, dtype)

    n_chunks = pl.cdiv(count, dma_chunk)

    def get_dma(slot, chunk_idx):
        return pltpu.make_async_copy(
            rec_hbm.at[pl.ds(seg_start + chunk_idx * dma_chunk, dma_chunk), :],
            buf.at[slot],
            sem.at[slot],
        )

    def run_chunk(ci, slot, process_sub):
        def sub_body(s, _):
            pair0 = ci * dma_chunk + s * sub

            @pl.when(pair0 < count)              # skip all-dead tails
            def _():
                rows = buf[slot, pl.ds(s * sub, sub)]        # (sub, REC)
                process_sub(rows, pair0)
            return 0

        jax.lax.fori_loop(0, dma_chunk // sub, sub_body, 0)

    def stream(process_sub):
        """Double-buffered loop over the tile's record chunks."""
        @pl.when(n_chunks > 0)
        def _():
            get_dma(0, 0).start()

        def chunk_body(ci, _):
            slot = ci % 2

            @pl.when(ci + 1 < n_chunks)
            def _():
                get_dma((ci + 1) % 2, ci + 1).start()

            get_dma(slot, ci).wait()
            run_chunk(ci, slot, process_sub)
            return 0

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

    def cols(rows, j0, n):                       # n x (SUB, 1, 1)
        return [rows[:, j][:, None, None] for j in range(j0, j0 + n)]

    def live_mask(rows, pair0):
        pair_idx = (pair0
                    + jax.lax.broadcasted_iota(jnp.int32, (sub, 1, 1), 0))
        return pair_idx < count

    # ---- loop 1: depth resolve --------------------------------------------
    def depth_sub(rows, pair0):
        ax, ay, bx, by, cx, cy = cols(rows, 0, 6)
        b0, b1, b2, _ = semantics.barycentric(ax, ay, bx, by, cx, cy,
                                              px, py, jnp)
        covered = semantics.coverage_mask(b0, b1, b2)
        z0, z1, z2 = cols(rows, 6, 3)
        z = semantics.affine_z(z0, z1, z2, b0, b1, b2)
        covered &= jnp.isfinite(z)
        x0b, x1b, y0b, y1b = cols(rows, 12, 4)
        covered &= (xi >= x0b) & (xi <= x1b) & (yi >= y0b) & (yi <= y1b)
        covered &= live_mask(rows, pair0)

        zc = jnp.where(covered, z, jnp.inf)
        if ev_ref is not None:
            # exact sequential z-pass semantics within the sub-block:
            # event k fires iff zc[k] < min(carry depth, zc[0..k-1]).
            # Hillis-Steele inclusive cummin along the pair axis, shifted
            # to exclusive with the running depth as carry.
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
        # NOTE: a sequential per-pair compare-select merge is ~20% fewer
        # register ops, but changing the op structure here perturbs XLA's
        # FMA grouping of affine_z by 1 ulp relative to the XLA tiled
        # path, flipping z-ties on shared edges — the argmin form fuses
        # identically to the scan path and keeps winner maps bitwise
        # equal across backends.
        zmin = jnp.min(zc, axis=0)               # (TH, TW)
        best = jnp.argmin(zc, axis=0)            # first min = lowest id
        ids = rows[:, 16][:, None, None]
        sel = jax.lax.broadcasted_iota(
            jnp.int32, (sub, tile_h, tile_w), 0) == best[None]
        win = jnp.sum(jnp.where(sel, ids, 0.0), axis=0)

        better = zmin < depth_ref[0]
        depth_ref[0] = jnp.where(better, zmin, depth_ref[0])
        winner_ref[0] = jnp.where(better, win, winner_ref[0])

    stream(depth_sub)

    # ---- loop 2: varying interpolation for winners ------------------------
    # single-chunk tiles (the common case) reuse the records still
    # resident in buf[0] from loop 1 instead of re-DMAing the segment
    if n_vary:
        def vary_sub(rows, pair0):
            ids = rows[:, 16][:, None, None]
            mine = ((winner_ref[0][None] == ids)
                    & live_mask(rows, pair0))    # (SUB, TH, TW)
            hit_any = jnp.any(mine)

            @pl.when(hit_any)
            def _():
                ax, ay, bx, by, cx, cy = cols(rows, 0, 6)
                b0, b1, b2, _ = semantics.barycentric(
                    ax, ay, bx, by, cx, cy, px, py, jnp)
                w0, w1, w2 = cols(rows, 9, 3)
                pb0, pb1, pb2 = semantics.perspective_correct_bary(
                    b0, b1, b2, w0, w1, w2, jnp)
                hit = jnp.any(mine, axis=0)      # (TH, TW)
                for c in range(n_vary):
                    v0, v1, v2 = cols(rows, VARY_OFF + 3 * c, 3)
                    val = semantics.interp3(v0, v1, v2, pb0, pb1, pb2)
                    contrib = jnp.sum(jnp.where(mine, val, 0.0), axis=0)
                    vary_ref[0, c] = jnp.where(hit, contrib, vary_ref[0, c])

        @pl.when(n_chunks == 1)
        def _():
            run_chunk(0, 0, vary_sub)            # records still in buf[0]

        @pl.when(n_chunks > 1)
        def _():
            stream(vary_sub)


@functools.partial(jax.jit, static_argnames=("ty", "tx", "th", "tw"))
def _tiles_jit(img, ty, tx, th, tw):
    return _to_tiles(img, ty, tx, th, tw, jnp.inf)


@functools.partial(jax.jit,
                   static_argnames=("ty", "tx", "th", "tw", "h", "w"))
def _untile_jit(tiles, ty, tx, th, tw, h, w):
    return _from_tiles(tiles, ty, tx, th, tw, h, w)


@functools.partial(jax.jit,
                   static_argnames=("ty", "tx", "th", "tw", "h", "w"))
def _untile_winner_jit(tiles, ty, tx, th, tw, h, w):
    # ids are exact integers in f32 (< 2^24); cast back after the kernel
    return _from_tiles(tiles.astype(jnp.int32), ty, tx, th, tw, h, w)


@functools.partial(jax.jit, static_argnames=(
    "ty", "tx", "th", "tw", "h", "w"))
def _untile_vary_jit(tiles, ty, tx, th, tw, h, w):
    """(T, V, th, tw) -> (V, H, W)"""
    v = tiles.shape[1]
    imgs = [_from_tiles(tiles[:, c], ty, tx, th, tw, h, w)
            for c in range(v)]
    return jnp.stack(imgs, axis=0)


@functools.partial(jax.jit, static_argnames=(
    "n_tiles_x", "n_tiles_y", "tile_h", "tile_w", "n_vary", "interpret",
    "dma_chunk", "sub"))
def _pallas_call_jit(start, counts, records, init_tiles,
                     n_tiles_x, n_tiles_y, tile_h, tile_w, n_vary,
                     interpret, origin=None, dma_chunk=DMA_CHUNK, sub=SUB):
    if dma_chunk > DMA_CHUNK:
        # build_pair_records pads exactly DMA_CHUNK trailing rows; a
        # larger chunk would DMA past the records array
        raise ValueError(f"dma_chunk {dma_chunk} > padded {DMA_CHUNK}")
    n_tiles = n_tiles_x * n_tiles_y
    if origin is None:
        origin = jnp.zeros((2,), jnp.int32)
    kernel = functools.partial(_tile_kernel, n_tiles_x=n_tiles_x,
                               tile_h=tile_h, tile_w=tile_w, n_vary=n_vary,
                               dma_chunk=dma_chunk, sub=sub)
    tile_block = pl.BlockSpec((1, tile_h, tile_w),
                              lambda t, s, c, o: (t, 0, 0),
                              memory_space=pltpu.VMEM)
    vary_block = pl.BlockSpec((1, max(n_vary, 1), tile_h, tile_w),
                              lambda t, s, c, o: (t, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),     # records stay in HBM
            tile_block,                               # init depth tile
        ],
        out_specs=[tile_block, tile_block, vary_block],
        scratch_shapes=[
            pltpu.VMEM((2, dma_chunk, REC), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, tile_h, tile_w), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, tile_h, tile_w), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, max(n_vary, 1), tile_h, tile_w),
                                 jnp.float32),
        ],
        interpret=interpret,
    )(start, counts, origin.astype(jnp.int32), records, init_tiles)


@functools.partial(jax.jit, static_argnames=(
    "n_tiles_x", "n_tiles_y", "tile_h", "tile_w", "n_vary", "interpret",
    "dma_chunk", "sub", "collect_stats", "y_stride"))
def _pallas_call_sparse_jit(ids, start, counts, records, depth_tiles,
                            n_tiles_x, n_tiles_y, tile_h, tile_w, n_vary,
                            interpret, origin=None, dma_chunk=DMA_CHUNK,
                            sub=SUB, collect_stats=False, y_stride=None):
    """Active-tile compacted kernel launch: the grid runs over the A_cap
    entries of ``ids`` (compacted non-empty tile ids, clamped in-range —
    padding entries carry count 0) instead of every screen tile.  The
    init-depth input block is gathered from the full (T, th, tw) frame
    depth by a dynamic (scalar-prefetched) block index map; outputs are
    COMPACT (A_cap, th, tw) blocks the caller scatters back.  Empty tiles
    are never touched — neither kernel time nor HBM write bandwidth
    (validated on real TPU by scripts/probe_inplace_blocks.py)."""
    a_cap = ids.shape[0]
    if dma_chunk > DMA_CHUNK:
        raise ValueError(f"dma_chunk {dma_chunk} > padded {DMA_CHUNK}")
    if origin is None:
        origin = jnp.zeros((2,), jnp.int32)
    kernel = functools.partial(_tile_kernel, n_tiles_x=n_tiles_x,
                               tile_h=tile_h, tile_w=tile_w, n_vary=n_vary,
                               dma_chunk=dma_chunk, sub=sub,
                               y_stride=y_stride)

    if collect_stats:
        def sparse_kernel(ids_r, start_r, count_r, origin_r, rec, init,
                          depth_o, winner_o, vary_o, ev_o, buf, sem):
            kernel(start_r, count_r, origin_r, rec, init,
                   depth_o, winner_o, vary_o, buf, sem, ids_ref=ids_r,
                   ev_ref=ev_o)
    else:
        def sparse_kernel(ids_r, start_r, count_r, origin_r, rec, init,
                          depth_o, winner_o, vary_o, buf, sem):
            kernel(start_r, count_r, origin_r, rec, init,
                   depth_o, winner_o, vary_o, buf, sem, ids_ref=ids_r)

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
            pltpu.VMEM((2, dma_chunk, REC), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        sparse_kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(ids, start, counts, origin.astype(jnp.int32), records, depth_tiles)
    if collect_stats:
        return out
    return list(out) + [None]


def rasterize_pallas(setup, bins: Bins, init_depth, height: int, width: int,
                     vary_corners=None, tile_h: int = TILE_H,
                     tile_w: int = TILE_W, interpret: bool | None = None):
    """Depth resolve (+ optional varying interpolation) via the tile
    kernel.  Returns (depth (H, W), winner (H, W) i32, vary (V, H, W) or
    None)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_tiles_x, n_tiles_y = bins.n_tiles_x, bins.n_tiles_y
    n_vary = 0 if vary_corners is None else int(vary_corners.shape[-1])
    records = build_pair_records(setup, bins.sorted_tri, vary_corners)
    counts = bins.counts.astype(jnp.int32)
    start = bins.start[:-1].astype(jnp.int32)
    init_tiles = _tiles_jit(init_depth, n_tiles_y, n_tiles_x, tile_h, tile_w)

    depth_t, winner_t, vary_t = _pallas_call_jit(
        start, counts, records, init_tiles,
        n_tiles_x, n_tiles_y, tile_h, tile_w, n_vary, interpret)

    depth = _untile_jit(depth_t, n_tiles_y, n_tiles_x, tile_h, tile_w,
                        height, width)
    winner = _untile_winner_jit(winner_t, n_tiles_y, n_tiles_x, tile_h,
                                tile_w, height, width)
    vary = None
    if n_vary:
        vary = _untile_vary_jit(vary_t, n_tiles_y, n_tiles_x, tile_h,
                                tile_w, height, width)
    return depth, winner, vary


def depth_resolve_pallas(setup, bins: Bins, init_depth,
                         height: int, width: int,
                         tile_h: int = TILE_H, tile_w: int = TILE_W,
                         interpret: bool | None = None):
    """Phase A only — same contract as raster_tiled.depth_resolve_tiled."""
    depth, winner, _ = rasterize_pallas(
        setup, bins, init_depth, height, width, None, tile_h, tile_w,
        interpret)
    return depth, winner
