"""Strip-parallel depth resolve (round-1 form) — SUPERSEDED by
ops/raster_fine.py, the round-2 production strip kernel (compact
slot-minor records, in-kernel static lane broadcast, bitwise winner
parity, auto-dispatched).  This module is kept as the round-1 design
record and for its opt-in depth-only path (raster_tiled.USE_STRIP_DEPTH,
default off); new work should target raster_fine.

Original description — production form of the validated prototype
(scripts/experimental_fine_raster.py).

Each (8, 128) framebuffer tile is split into 8 strips of (8, 16); one
streamed record row carries EIGHT (strip, triangle) pairs interleaved in
its 128 lanes (lane 16k+f = strip k's pair field f), so every vector
step rasterizes 8 pairs — ~8x the pair throughput of the coarse kernel
on small triangles.  Per-pair coefficients reach their 16-lane group via
an exact VPU lane permute (``take_along_axis`` along lanes — the Mosaic
gather form; the MXU selector-matrix alternative needs 3-pass f32
precision and is slower).

Within a row the 8 pairs live in disjoint strips, and rows stream in
bin order per strip, so the sequential strict-less merge reproduces the
reference's first-drawn-wins z-test exactly (our_gl.cpp:165).

Round-1 scope: depth-only passes (``shader.writes_color == False`` — the
shadow-map pass).  Varying interpolation in strip form is round-2 work
(docs/ROADMAP.md).

Exactness contract: coverage sets are bitwise-identical to the coarse
kernel; depth agrees within ~1 ulp; at shared-edge z ties the winning
triangle may differ (different op shapes fuse to ±1-ulp different
affine_z rounding).  That is sufficient for every depth-only consumer
(shadow compares use a 2e-3 epsilon; z-visualization quantizes), which
is why this kernel is restricted to writes_color=False passes — color
paths keep the coarse kernel's bit-exact winner parity.

Record lane layout per strip group (16 lanes each):
  0..5  screen ax, ay, bx, by, cx, cy
  6..8  ndc z0, z1, z2
  9..12 bbox min_x, max_x, min_y, max_y (exact ints as f32)
  13    triangle id (-1 = empty slot)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinyrenderder_tpu.ops import raster_tiled, semantics
from tinyrenderder_tpu.ops.raster_tiled import (_cdiv, _from_tiles,
                                                _quantize_capacity, _to_tiles)

__all__ = ["depth_resolve_strips", "STRIP_W", "STRIPS", "TILE_H"]

STRIP_W = 16
STRIPS = 8
TILE_H = 8
TILE_W = STRIP_W * STRIPS        # 128
NFIELD = 14
DMA_ROWS = 32                    # record rows per HBM->VMEM copy

# capacity caches, same pattern as raster_tiled._PAIR_CAPACITY:
# (F, groups_x, groups_y) -> (strip_pair_capacity, row_capacity)
_STRIP_CAPACITY: dict = {}
# async-mode in-flight totals: key -> (pair_total, row_total, caps, age)
_STRIP_PENDING: dict = {}


@functools.partial(jax.jit, static_argnames=(
    "pair_capacity", "row_capacity", "n_groups_x", "n_groups_y"))
def _build_strip_records(setup, pair_capacity: int, row_capacity: int,
                         n_groups_x: int, n_groups_y: int):
    """Strip bins -> CSR of interleaved record rows.

    Returns (records (R + DMA_ROWS, 128) f32, row_start (G,) i32,
    rows_per_group (G,) i32, totals (pairs, rows) device scalars).
    """
    f = max(setup["valid"].shape[0], 1)
    n_groups = n_groups_x * n_groups_y
    tx0, ty0, span_x, spans, pair_total = raster_tiled._tile_spans(
        setup, STRIP_W, TILE_H)
    sorted_tri, start, counts = raster_tiled._build_bins(
        tx0, ty0, span_x, spans, pair_capacity,
        n_groups_x * STRIPS, n_groups_y)

    counts_g = counts.reshape(n_groups, STRIPS)          # (G, 8)
    rows_per_group = jnp.max(counts_g, axis=1)           # (G,)
    row_start = jnp.cumsum(rows_per_group) - rows_per_group
    row_total = jnp.sum(rows_per_group)

    r = row_capacity
    row_ids = jnp.arange(r, dtype=jnp.int32)
    g_of_row = (jnp.searchsorted(row_start, row_ids, side="right")
                .astype(jnp.int32) - 1)
    g_of_row = jnp.clip(g_of_row, 0, n_groups - 1)
    i_of_row = row_ids - row_start[g_of_row]             # row index in group

    # per row and strip: the bin entry (or -1 past the strip's count)
    strip_start = start[:-1].reshape(n_groups, STRIPS)   # (G, 8)
    pos = strip_start[g_of_row] + i_of_row[:, None]      # (R, 8)
    live = ((i_of_row[:, None] < counts_g[g_of_row])
            & (i_of_row >= 0)[:, None]
            & (row_ids < row_total)[:, None])
    p = sorted_tri.shape[0]
    tri = jnp.where(live, sorted_tri[jnp.clip(pos, 0, p - 1)], -1)  # (R, 8)

    safe = jnp.clip(tri, 0, f - 1)
    fields = jnp.concatenate([
        setup["screen"].reshape(-1, 6).astype(jnp.float32)[safe],   # (R,8,6)
        setup["ndc_z"].astype(jnp.float32)[safe],                   # (R,8,3)
        setup["bbox"].astype(jnp.float32)[safe],                    # (R,8,4)
        tri.astype(jnp.float32)[..., None],                         # (R,8,1)
    ], axis=-1)                                                     # (R,8,14)
    fields = jnp.where(live[..., None], fields,
                       jnp.where(jnp.arange(NFIELD) == NFIELD - 1,
                                 -1.0, 0.0))
    rec = jnp.pad(fields, ((0, 0), (0, 0), (0, STRIP_W - NFIELD))
                  ).reshape(r, TILE_W)
    rec = jnp.pad(rec, ((0, DMA_ROWS), (0, 0)))
    return rec, row_start.astype(jnp.int32), rows_per_group.astype(jnp.int32), \
        pair_total, row_total


def _strip_kernel(row_start_ref, rows_ref, origin_ref, rec_hbm, init_ref,
                  depth_ref, winner_ref, buf, sem, *, n_groups_x):
    t = pl.program_id(0)
    seg_start = row_start_ref[t]
    rows = rows_ref[t]

    dtype = jnp.float32
    gx0 = (origin_ref[0] + (t % n_groups_x) * TILE_W).astype(jnp.int32)
    gy0 = (origin_ref[1] + (t // n_groups_x) * TILE_H).astype(jnp.int32)
    xi = (gx0 + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
          ).astype(dtype)
    yi = (gy0 + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
          ).astype(dtype)
    px = xi + jnp.asarray(0.5, dtype)
    py = yi + jnp.asarray(0.5, dtype)

    depth_ref[0] = init_ref[0]
    winner_ref[0] = jnp.full((TILE_H, TILE_W), -1.0, dtype)

    lane = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
    group_base = (lane // STRIP_W) * STRIP_W

    n_chunks = pl.cdiv(rows, DMA_ROWS)

    def get_dma(slot, ci):
        return pltpu.make_async_copy(
            rec_hbm.at[pl.ds(seg_start + ci * DMA_ROWS, DMA_ROWS), :],
            buf.at[slot], sem.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        get_dma(0, 0).start()

    def chunk_body(ci, _):
        slot = ci % 2

        @pl.when(ci + 1 < n_chunks)
        def _():
            get_dma((ci + 1) % 2, ci + 1).start()

        get_dma(slot, ci).wait()

        def row_body(i, _):
            @pl.when(ci * DMA_ROWS + i < rows)
            def _():
                row8 = jnp.broadcast_to(buf[slot, i][None, :],
                                        (TILE_H, TILE_W))

                def fld(f):                       # exact lane-group bcast
                    return jnp.take_along_axis(row8, group_base + f, axis=1)

                ax, ay = fld(0), fld(1)
                bx, by = fld(2), fld(3)
                cx, cy = fld(4), fld(5)
                b0, b1, b2, _ = semantics.barycentric(
                    ax, ay, bx, by, cx, cy, px, py, jnp)
                covered = semantics.coverage_mask(b0, b1, b2)
                z = semantics.affine_z(fld(6), fld(7), fld(8), b0, b1, b2)
                covered &= jnp.isfinite(z)
                covered &= (xi >= fld(9)) & (xi <= fld(10))
                covered &= (yi >= fld(11)) & (yi <= fld(12))
                tid = fld(13)
                covered &= tid >= 0               # -1 = empty slot

                zc = jnp.where(covered, z, jnp.inf)
                better = zc < depth_ref[0]        # strict: first drawn wins
                depth_ref[0] = jnp.where(better, zc, depth_ref[0])
                winner_ref[0] = jnp.where(better, tid, winner_ref[0])
            return 0

        jax.lax.fori_loop(0, DMA_ROWS, row_body, 0)
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)


@functools.partial(jax.jit, static_argnames=(
    "n_groups_x", "n_groups_y", "interpret"))
def _strip_call_jit(row_start, rows_per_group, records, init_tiles,
                    n_groups_x, n_groups_y, interpret, origin=None):
    n_groups = n_groups_x * n_groups_y
    if origin is None:
        origin = jnp.zeros((2,), jnp.int32)
    kernel = functools.partial(_strip_kernel, n_groups_x=n_groups_x)
    tile_block = pl.BlockSpec((1, TILE_H, TILE_W),
                              lambda t, s, c, o: (t, 0, 0),
                              memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            tile_block,
        ],
        out_specs=[tile_block, tile_block],
        scratch_shapes=[
            pltpu.VMEM((2, DMA_ROWS, TILE_W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_groups, TILE_H, TILE_W), jnp.float32),
            jax.ShapeDtypeStruct((n_groups, TILE_H, TILE_W), jnp.float32),
        ],
        interpret=interpret,
    )(row_start, rows_per_group, origin.astype(jnp.int32),
      records, init_tiles)


def depth_resolve_strips(setup, init_depth, height: int, width: int,
                         interpret: bool | None = None,
                         strict_capacity: bool = True):
    """Strip-parallel phase A.  Same contract as
    raster_tiled.depth_resolve_tiled: (depth (H, W), winner (H, W) i32)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_groups_x = _cdiv(width, TILE_W)
    n_groups_y = _cdiv(height, TILE_H)
    f = int(setup["valid"].shape[0])
    key = (f, n_groups_x, n_groups_y)

    if not strict_capacity:
        # resolve a previous frame's totals once their D2H has landed
        # (same deferral pattern as raster_tiled._PENDING_TOTALS)
        prev = _STRIP_PENDING.get(key)
        if prev is not None:
            p_tot, r_tot, p_caps, age = prev
            ready = getattr(p_tot, "is_ready", lambda: True)()
            if ready or age >= 8:
                _STRIP_PENDING.pop(key)
                import numpy as _np
                pt, rt = int(_np.asarray(p_tot)), int(_np.asarray(r_tot))
                if pt > p_caps[0] or rt > p_caps[1]:
                    _STRIP_CAPACITY[key] = (_quantize_capacity(pt),
                                            _quantize_capacity(rt))
            else:
                _STRIP_PENDING[key] = (p_tot, r_tot, p_caps, age + 1)

    caps = _STRIP_CAPACITY.get(key)
    if caps is None:                          # first frame: sync once
        *_, spans, total = raster_tiled._tile_spans(setup, STRIP_W, TILE_H)
        pair_cap = _quantize_capacity(int(jax.device_get(total)))
        row_cap = pair_cap                    # rows <= pairs always
        caps = (pair_cap, row_cap)
    _STRIP_CAPACITY[key] = caps
    pair_cap, row_cap = caps

    records, row_start, rows_per_group, pair_total, row_total = \
        _build_strip_records(setup, pair_cap, row_cap,
                             n_groups_x, n_groups_y)
    init_tiles = _to_tiles(jnp.asarray(init_depth), n_groups_y, n_groups_x,
                           TILE_H, TILE_W, jnp.inf)
    depth_t, winner_t = _strip_call_jit(
        row_start, rows_per_group, records, init_tiles,
        n_groups_x, n_groups_y, interpret)
    depth = _from_tiles(depth_t, n_groups_y, n_groups_x, TILE_H, TILE_W,
                        height, width)
    winner = _from_tiles(winner_t.astype(jnp.int32), n_groups_y, n_groups_x,
                         TILE_H, TILE_W, height, width)

    # overflow check (pairs dropped by binning, or rows truncated)
    if strict_capacity:
        pt = int(jax.device_get(pair_total))
        rt = int(jax.device_get(row_total))
        if pt > pair_cap or rt > row_cap:
            _STRIP_CAPACITY[key] = (_quantize_capacity(pt),
                                    _quantize_capacity(rt))
            return depth_resolve_strips(setup, init_depth, height, width,
                                        interpret, strict_capacity)
    elif key not in _STRIP_PENDING:
        for arr in (pair_total, row_total):
            try:
                arr.copy_to_host_async()
            except AttributeError:
                pass
        _STRIP_PENDING[key] = (pair_total, row_total, caps, 0)
    return depth, winner
