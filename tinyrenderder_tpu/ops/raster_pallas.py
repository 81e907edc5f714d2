"""Pallas TPU depth-resolve kernel over CSR triangle bins.

The performance replacement for the reference's serial per-pixel hot loop
(our_gl.cpp:147-200).  One grid step owns one (8, 128) framebuffer tile
held in registers/VMEM; it streams its bin segment of pre-gathered
triangle records from HBM (double-buffer-sized chunks via async DMA) and
performs an ordered compare-and-select depth merge — the sequential order
over bin entries (= submission order) reproduces the reference's
strict-less first-drawn-wins z-test (our_gl.cpp:165) with no atomics.

Work is proportional to sum(per-tile bin sizes): empty tiles cost one
trip-count check (``lax.fori_loop`` with a dynamic per-tile bound from
scalar-prefetched CSR offsets), unlike the dense XLA fallback which pads
every tile to the maximum bin size.

Decision math (barycentric / affine z) is ops.semantics — the same
formula order as the CPU oracle — so coverage and winner maps are
bit-identical to ops.raster_tiled (verified in interpret mode by
tests/test_raster_tiled.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinyrenderder_tpu.ops import semantics
from tinyrenderder_tpu.ops.raster import BACKGROUND
from tinyrenderder_tpu.ops.raster_tiled import (Bins, _cdiv, _from_tiles,
                                                _to_tiles)

__all__ = ["depth_resolve_pallas", "build_pair_records"]

# Triangle record layout: one 128-lane f32 row per (tile, triangle) pair
# (Mosaic requires HBM slices lane-aligned to 128, so the row is padded;
# the extra bandwidth is negligible next to per-pixel work).
#   0..5   screen ax, ay, bx, by, cx, cy
#   6..8   ndc z0, z1, z2
#   9..12  bbox min_x, max_x, min_y, max_y (exact small ints as f32)
#   13     triangle id (exact below 2^24)
REC = 128
DMA_CHUNK = 64          # pairs per HBM->VMEM copy
SUB = 8                 # pairs evaluated per vector step


@functools.partial(jax.jit, static_argnames=())
def build_pair_records(setup, sorted_tri):
    """Gather per-pair triangle records (P + DMA_CHUNK, REC) f32 in bin
    order.  The extra zero rows keep the kernel's fixed-size chunk DMAs in
    bounds on the last segment."""
    p = sorted_tri.shape[0]
    f = setup["valid"].shape[0]
    safe = jnp.clip(sorted_tri, 0, max(f - 1, 0))
    scr = setup["screen"][safe].reshape(p, 6).astype(jnp.float32)
    zs = setup["ndc_z"][safe].astype(jnp.float32)
    bb = setup["bbox"][safe].astype(jnp.float32)
    ids = sorted_tri.astype(jnp.float32)[:, None]
    rec = jnp.concatenate(
        [scr, zs, bb, ids, jnp.zeros((p, REC - 14), jnp.float32)], axis=1)
    return jnp.pad(rec, ((0, DMA_CHUNK), (0, 0)))


def _tile_kernel(start_ref, count_ref, rec_hbm, init_ref,
                 depth_ref, winner_ref, buf, sem,
                 *, n_tiles_x, tile_h, tile_w):
    t = pl.program_id(0)
    seg_start = start_ref[t]
    count = count_ref[t]

    dtype = jnp.float32
    gx0 = ((t % n_tiles_x) * tile_w).astype(jnp.int32)
    gy0 = ((t // n_tiles_x) * tile_h).astype(jnp.int32)
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

    n_chunks = pl.cdiv(count, DMA_CHUNK)

    def get_dma(slot, chunk_idx):
        return pltpu.make_async_copy(
            rec_hbm.at[pl.ds(seg_start + chunk_idx * DMA_CHUNK, DMA_CHUNK), :],
            buf.at[slot],
            sem.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        get_dma(0, 0).start()

    def chunk_body(ci, _):
        slot = ci % 2

        @pl.when(ci + 1 < n_chunks)
        def _():
            get_dma((ci + 1) % 2, ci + 1).start()

        get_dma(slot, ci).wait()
        chunk = buf[slot]                        # (DMA_CHUNK, REC)

        for s in range(DMA_CHUNK // SUB):
            rows = chunk[s * SUB:(s + 1) * SUB]  # (SUB, REC)

            def col(j):                          # (SUB, 1, 1) broadcast shape
                return rows[:, j][:, None, None]

            b0, b1, b2, _ = semantics.barycentric(
                col(0), col(1), col(2), col(3), col(4), col(5),
                px, py, jnp)
            covered = ~((b0 < 0) | (b1 < 0) | (b2 < 0))
            z = semantics.affine_z(col(6), col(7), col(8), b0, b1, b2)
            covered &= jnp.isfinite(z)
            covered &= ((xi >= col(9)) & (xi <= col(10))
                        & (yi >= col(11)) & (yi <= col(12)))
            pair_idx = (ci * DMA_CHUNK + s * SUB
                        + jax.lax.broadcasted_iota(jnp.int32, (SUB, 1, 1), 0))
            covered &= pair_idx < count

            zc = jnp.where(covered, z, jnp.inf)
            zmin = jnp.min(zc, axis=0)           # (TH, TW)
            best = jnp.argmin(zc, axis=0)        # first min = lowest id
            ids = rows[:, 13][:, None, None]
            sel = jax.lax.broadcasted_iota(
                jnp.int32, (SUB, tile_h, tile_w), 0) == best[None]
            win = jnp.sum(jnp.where(sel, ids, 0.0), axis=0)

            better = zmin < depth_ref[0]
            depth_ref[0] = jnp.where(better, zmin, depth_ref[0])
            winner_ref[0] = jnp.where(better, win, winner_ref[0])
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)


def depth_resolve_pallas(setup, bins: Bins, init_depth,
                         height: int, width: int,
                         tile_h: int = 8, tile_w: int = 128,
                         interpret: bool | None = None):
    """Phase A via the Pallas tile kernel.  Same contract as
    raster_tiled.depth_resolve_tiled: (depth (H, W), winner (H, W) i32)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_tiles_x, n_tiles_y = bins.n_tiles_x, bins.n_tiles_y
    records = build_pair_records(setup, bins.sorted_tri)
    counts = bins.counts.astype(jnp.int32)
    start = bins.start[:-1].astype(jnp.int32)
    init_tiles = _tiles_jit(init_depth, n_tiles_y, n_tiles_x, tile_h, tile_w)

    depth_t, winner_t = _pallas_call_jit(
        start, counts, records, init_tiles,
        n_tiles_x, n_tiles_y, tile_h, tile_w, interpret)

    depth = _untile_jit(depth_t, n_tiles_y, n_tiles_x, tile_h, tile_w,
                        height, width)
    winner = _untile_winner_jit(winner_t, n_tiles_y, n_tiles_x, tile_h,
                                tile_w, height, width)
    return depth, winner


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
    "n_tiles_x", "n_tiles_y", "tile_h", "tile_w", "interpret"))
def _pallas_call_jit(start, counts, records, init_tiles,
                     n_tiles_x, n_tiles_y, tile_h, tile_w, interpret):
    n_tiles = n_tiles_x * n_tiles_y
    kernel = functools.partial(_tile_kernel, n_tiles_x=n_tiles_x,
                               tile_h=tile_h, tile_w=tile_w)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),         # records stay in HBM
            pl.BlockSpec((1, tile_h, tile_w), lambda t, s, c: (t, 0, 0),
                         memory_space=pltpu.VMEM),        # init depth tile
        ],
        out_specs=[
            pl.BlockSpec((1, tile_h, tile_w), lambda t, s, c: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, tile_w), lambda t, s, c: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, DMA_CHUNK, REC), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, tile_h, tile_w), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, tile_h, tile_w), jnp.float32),
        ],
        interpret=interpret,
    )(start, counts, records, init_tiles)
