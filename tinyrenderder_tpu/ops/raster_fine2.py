"""Grouped-strip fine rasterization — slot rows decoupled from tiles.

The round-2 fine kernel (ops.raster_fine) packs 8 (strip, triangle)
pairs per vector step, but a record row's 8 slots are the 8 strips of
ONE tile, so rows per tile = max over that tile's strip bin sizes.  On
the stress scene that inflates rows to ~2.5x the ideal sum/8 (strip
imbalance), and rows bound BOTH the pre-stage's big record gather and
the kernel's step count — the round-2 verdict's top single-chip perf
item.

The key observation: the kernel reads every slot's pixel origin from a
tiny side input, so NOTHING binds a record row's 8 slots to one tile —
or a slot to any particular strip at all.  A record row may combine
ANY 8 strips from anywhere on screen.  This module exploits that:

  * all strips are sorted by bin size with ONE flat descending argsort
    and the rank-r strip goes to (group r//8, slot r%8).  A group's
    rows = its largest member = the rank-8g sorted count, so
    row_total = sum(sorted[0::8]) — the OPTIMUM over all partitions
    into 8-slot groups (the i-th largest group max can never beat the
    8(i-1)-th sorted count, and this packing achieves it).  Grouped
    rows <= raster_fine's per-tile rows always; measured ~2x fewer on
    imbalanced scenes, and within max/8 of the ideal sum/8 floor
    (round 2 used a per-class matching that was ~1.5x the floor at
    stress — the mod-8 class binding it assumed was never required);
  * a group's per-slot pixel origins ride a tiny (G, 2, 128) int32 side
    input; the kernel rebuilds xi/yi per lane group from it (a few
    register ops), everything else — record layout, DMA streaming,
    column expansion, the argmin depth merge, lazy loop-2 — is the
    raster_fine kernel verbatim;
  * the kernel is PASS-LOCAL (depth starts at +inf): merging against
    the frame depth moves to the XLA post stage as a per-pixel
    strict-less select, which is bitwise-identical to the in-kernel
    merge (a candidate beats the frame iff it beats both its in-pass
    competitors and the stored depth; < is transitive over the same f32
    compares).  This removes the per-group init-depth gather from the
    hot path entirely (the stats launch, which needs running-depth
    event semantics, still takes an init input);
  * group outputs regroup into per-ACTIVE-TILE compact blocks with one
    strip-slab gather + compact transposes, after which
    raster_sparse._post_sparse_jit is reused unchanged.

Sorted groups also auto-compact: group rows are descending, so active
groups are a prefix of the grid — no id scatter/clamp machinery.

Exactness: within a lane (pixel), candidates still arrive in per-strip
submission order across ascending rows, argmin takes the first minimum,
and cross-block/cross-pass merges stay strict-less — the reference's
first-drawn-wins z-test (our_gl.cpp:165).  The merge keeps the coarse
kernel's argmin op structure (e35d513); verified bitwise vs the coarse
and fine kernels by tests/test_fine2.py.

Replaces the same serial hot loop as every other backend:
our_gl.cpp:147-200.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinyrenderder_tpu.ops import semantics
from tinyrenderder_tpu.ops.raster import BACKGROUND
from tinyrenderder_tpu.ops.raster_fine import (COL_ID, DMA_ROWS, LOOP1_COLS,
                                               MAX_VARY, NCOL, REC_ROWS,
                                               STRIP_W, STRIPS, SUB_ROWS,
                                               VARY_COL)
from tinyrenderder_tpu.ops.raster_tiled import (TILE_H, TILE_W, _build_bins,
                                                _cdiv, _next_pow2,
                                                _quantize_soft,
                                                _quantize_tight, _tile_spans,
                                                _vertex_stage)

__all__ = ["render_pass_fine2"]


# ---------------------------------------------------------------------------
# Pre-stage: class-sorted strip groups -> interleaved compact records
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=(
    "shader", "width", "height", "pair_cap", "row_cap", "rec_cap", "g_cap",
    "a_cap", "tile_h", "tile_w", "nty_band", "ty_stride", "ntx_band",
    "geom_axis"))
def _pre_fine2_jit(attrs, uniforms, shader, width, height, pair_cap,
                   row_cap, rec_cap, g_cap, a_cap, tile_h, tile_w,
                   ty_lo=None, nty_band=None, ty_stride=1, tx_lo=None,
                   ntx_band=None, geom_axis=None, ty_rows=None):
    """Fused pre-stage: vertex transform, setup, strip binning, class
    sort + group assignment, slot interleave, record build, active-tile
    mapping — one dispatch.

    ``ty_lo``/``nty_band`` band-clip the binning for the sharded path
    (see raster_fine._pre_fine_jit); ``tx_lo``/``ntx_band`` clip
    columns the same way (2-D blocks)."""
    if tile_w != TILE_W:
        raise ValueError("fine2 requires 128-lane tiles")
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
    sx_lo = None if tx_lo is None else tx_lo * STRIPS
    sx_hi = None if tx_lo is None else sx_lo + (nsx - 1)

    tx0, ty0, span_x, spans, pair_total = _tile_spans(
        setup, STRIP_W, tile_h, ty_lo, ty_hi, sx_lo, sx_hi,
        ty_stride=ty_stride)
    sorted_tri, start, counts, sorted_key = _build_bins(
        tx0, ty0, span_x, spans, pair_cap, nsx, nty, return_keys=True)

    # ---- grouping: ONE flat descending argsort assigns strip at rank r
    # to (group r//8, slot r%8).  A group's rows = its largest member =
    # the rank-(8g) count, so row_total = sum(sorted[0::8]) — the
    # optimum over ALL partitions into 8-slot groups (the i-th largest
    # group max is >= the 8(i-1)-th sorted count, which this achieves).
    # The kernel reads each slot's pixel origin from x0y0, so nothing
    # binds a slot to the strip's in-tile lane class.
    order_f = jnp.argsort(-counts)                  # (n_strips,) stable
    pos = (jnp.zeros((n_strips,), jnp.int32)
           .at[order_f].set(jnp.arange(n_strips, dtype=jnp.int32)))
    sortc = counts[order_f]
    group_rows = sortc[0::STRIPS]                   # (P,) descending
    group_start = (jnp.cumsum(group_rows) - group_rows).astype(jnp.int32)
    row_total = jnp.sum(group_rows)
    n_groups = jnp.sum((group_rows > 0).astype(jnp.int32))
    g_of = pos // STRIPS                            # strip -> group
    j_of = pos - g_of * STRIPS                      # strip -> slot

    # ---- interleaved slot fill (same machinery as raster_fine, with
    # the strip's assigned (group row base, slot) instead of the tile's)
    q = jnp.arange(pair_cap, dtype=jnp.int32)
    live_pair = sorted_key < n_strips
    s_safe = jnp.minimum(sorted_key, n_strips - 1)
    strip_tbl = jnp.stack([start[:-1],
                           group_start[g_of] * STRIPS + j_of],
                          axis=1)                   # (n_strips, 2)
    sg = strip_tbl[s_safe]                          # ONE packed gather
    rank = q - sg[:, 0]
    dst = sg[:, 1] + rank * STRIPS
    dst = jnp.where(live_pair & (dst < row_cap * STRIPS),
                    dst, row_cap * STRIPS)
    tri8 = (jnp.full((row_cap * STRIPS,), -1, jnp.int32)
            .at[dst].set(sorted_tri, mode="drop")
            .reshape(row_cap, STRIPS))

    # ---- per-triangle column table -> one packed row gather (verbatim
    # from raster_fine)
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
    rec_full = jnp.zeros((rec_cap + DMA_ROWS, REC_ROWS, 128), jnp.float32)
    rec_full = jax.lax.dynamic_update_slice(rec_full, rec, (0, 0, 0))

    # ---- per-group slot origins: lanes [16k, 16k+16) carry slot k's
    # band-local pixel origin (the kernel adds the global origin)
    sid_of = order_f.reshape(n_tiles, STRIPS)       # (P, 8) strip per slot
    tid_of = sid_of // STRIPS                       # its tile
    xk = ((tid_of % ntx) * tile_w
          + STRIP_W * (sid_of - tid_of * STRIPS))   # its in-tile strip
    yk = (tid_of // ntx) * (tile_h * ty_stride)     # interleave-aware
    x0y0 = jnp.stack([jnp.repeat(xk, 16, axis=1,
                                 total_repeat_length=128),
                      jnp.repeat(yk, 16, axis=1,
                                 total_repeat_length=128)],
                     axis=1)                        # (P, 2, 128) i32
    x0y0 = x0y0[:g_cap]

    # scheduled-group row windows, clamped to the row budget
    start_g = jnp.minimum(group_start[:g_cap], row_cap).astype(jnp.int32)
    rows_g = jnp.minimum(group_rows[:g_cap],
                         row_cap - start_g).astype(jnp.int32)

    # ---- active-tile mapping for the post-stage regroup
    counts8 = counts.reshape(n_tiles, STRIPS)       # strip s = 8*tile + k
    rows_t = jnp.max(counts8, axis=1)
    active = rows_t > 0
    n_active = jnp.sum(active.astype(jnp.int32))
    apos = jnp.cumsum(active.astype(jnp.int32)) - 1
    slot = jnp.where(active, apos, a_cap)
    ids = jnp.full((a_cap,), n_tiles, jnp.int32).at[slot].set(
        jnp.arange(n_tiles, dtype=jnp.int32), mode="drop")
    kernel_ids = jnp.minimum(ids, n_tiles - 1)
    # src: tile's strip k -> its assigned flat compact index g*8 + j
    src8 = pos.reshape(n_tiles, STRIPS)
    src = src8[kernel_ids]                          # (A, 8)
    live = ((counts8[kernel_ids] > 0)               # strip has pairs
            & (src < g_cap * STRIPS)                # group was scheduled
            & (ids < n_tiles)[:, None])             # real active entry
    return (setup, rec_full, ids, kernel_ids, src, live, start_g, rows_g,
            x0y0, sid_of, pair_total, row_total, n_groups, n_active,
            n_vary)


# ---------------------------------------------------------------------------
# Kernel — raster_fine's kernel with per-slot pixel origins and +inf init
# ---------------------------------------------------------------------------

def _fine2_kernel(start_ref, rows_ref, origin_ref,
                  rec_hbm, x0y0_ref,
                  depth_ref, winner_ref, vary_ref, buf, sem, planes_ref,
                  *, tile_h, n_vary, dma_rows=DMA_ROWS, sub=SUB_ROWS,
                  ev_ref=None, init_ref=None):
    i = pl.program_id(0)
    seg_start = start_ref[i]
    count = rows_ref[i]                 # record ROWS for this group
    tile_w = 128

    dtype = jnp.float32
    # per-slot pixel coordinates: lanes [16k, 16k+16) are slot k's strip
    j16 = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1) % 16
    ri = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
    xi = (origin_ref[0] + x0y0_ref[0, 0][None, :] + j16).astype(dtype)
    yi = (origin_ref[1] + x0y0_ref[0, 1][None, :] + ri).astype(dtype)
    half = jnp.asarray(0.5, dtype)
    px = (xi + half)[None]
    py = (yi + half)[None]
    xi = xi[None]
    yi = yi[None]

    if init_ref is None:
        depth_ref[0] = jnp.full((tile_h, tile_w), jnp.inf, dtype)
    else:
        depth_ref[0] = init_ref[0]      # stats launch: running depth
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

    lane16 = jax.lax.broadcasted_iota(jnp.int32, (dma_rows, 128), 1) // 16
    lane16_sub = jax.lax.broadcasted_iota(jnp.int32, (sub, 128), 1) // 16

    def expand(slot, cols):
        for n, c in enumerate(cols):
            lane_rows = buf[slot, :, c // 16, :]        # (dma_rows, 128)
            idx = 8 * (c % 16) + lane16                 # static pattern
            planes_ref[n] = jnp.take_along_axis(lane_rows, idx, axis=1)

    def extract(slot, r0, c):
        lane_rows = buf[slot, pl.ds(r0, sub), c // 16, :]
        idx = 8 * (c % 16) + lane16_sub
        return jnp.take_along_axis(lane_rows, idx, axis=1)[:, None, :]

    def stream(cols, process_sub, lazy=False):
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
                row0 = ci * dma_rows + s * sub

                @pl.when(row0 < count)
                def _():
                    process_sub(slot, s * sub, row0)
                return 0

            jax.lax.fori_loop(0, dma_rows // sub, sub_body, 0)
            return 0

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

    def planes(r0, j0, n):                          # n x (sub, 1, 128)
        return [planes_ref[j, pl.ds(r0, sub), :][:, None, :]
                for j in range(j0, j0 + n)]

    def live_mask(row0):
        row_idx = (row0
                   + jax.lax.broadcasted_iota(jnp.int32, (sub, 1, 1), 0))
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
        covered &= ids >= 0                          # -1 = empty slot
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
        # same argmin merge as the coarse/fine kernels (e35d513)
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
            ids = extract(slot, r0, COL_ID)
            mine = ((winner_ref[0][None] == ids)
                    & (ids >= 0)
                    & live_mask(row0))
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

        stream((), vary_sub, lazy=True)


@functools.partial(jax.jit, static_argnames=(
    "tile_h", "n_vary", "interpret", "dma_rows", "sub", "collect_stats"))
def _fine2_call_jit(start_g, rows_g, rec, x0y0, tile_h, n_vary,
                    interpret, origin=None, dma_rows=DMA_ROWS,
                    sub=SUB_ROWS, collect_stats=False, init_g=None):
    g_cap = x0y0.shape[0]
    if origin is None:
        origin = jnp.zeros((2,), jnp.int32)
    kernel = functools.partial(_fine2_kernel, tile_h=tile_h, n_vary=n_vary,
                               dma_rows=dma_rows, sub=sub)

    n_planes = len(LOOP1_COLS)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),     # records stay in HBM
        pl.BlockSpec((1, 2, 128), lambda i, s, r, o: (i, 0, 0),
                     memory_space=pltpu.VMEM),    # slot origins
    ]
    if collect_stats:
        in_specs.append(
            pl.BlockSpec((1, tile_h, 128), lambda i, s, r, o: (i, 0, 0),
                         memory_space=pltpu.VMEM))   # running-depth init

        def fine2_kernel(s_r, r_r, o_r, rec_r, xy_r, init_r,
                         depth_o, winner_o, vary_o, ev_o, b, sm, p):
            kernel(s_r, r_r, o_r, rec_r, xy_r,
                   depth_o, winner_o, vary_o, b, sm, p,
                   ev_ref=ev_o, init_ref=init_r)
    else:
        fine2_kernel = kernel

    out_block = pl.BlockSpec((1, tile_h, 128),
                             lambda i, s, r, o: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    vary_block = pl.BlockSpec((1, max(n_vary, 1), tile_h, 128),
                              lambda i, s, r, o: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    ev_block = pl.BlockSpec((1, 2, tile_h, 128),
                            lambda i, s, r, o: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [out_block, out_block, vary_block]
    out_shape = [
        jax.ShapeDtypeStruct((g_cap, tile_h, 128), jnp.float32),
        jax.ShapeDtypeStruct((g_cap, tile_h, 128), jnp.float32),
        jax.ShapeDtypeStruct((g_cap, max(n_vary, 1), tile_h, 128),
                             jnp.float32),
    ]
    if collect_stats:
        out_specs.append(ev_block)
        out_shape.append(
            jax.ShapeDtypeStruct((g_cap, 2, tile_h, 128), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(g_cap,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, dma_rows, REC_ROWS, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((n_planes, dma_rows, 128), jnp.float32),
        ],
    )
    operands = [start_g, rows_g, origin.astype(jnp.int32), rec, x0y0]
    if collect_stats:
        operands.append(init_g)
    out = pl.pallas_call(
        fine2_kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*operands)
    if collect_stats:
        return out
    return list(out) + [None]


# ---------------------------------------------------------------------------
# Post: regroup group outputs into active-tile compact blocks
# ---------------------------------------------------------------------------

def _strips_of(x, th):
    """(G, th, 128) -> (G*8, th, 16) compact strip slabs."""
    g = x.shape[0]
    return (x.reshape(g, th, STRIPS, STRIP_W)
             .transpose(0, 2, 1, 3).reshape(g * STRIPS, th, STRIP_W))


def _fine2_shared_post(kernel_ids, src, d_g, v_g, uniforms, shader, spec,
                       tile_h):
    """The exactness-sensitive core shared VERBATIM by _post_fine2_jit
    and _post_fine2_image_jit (one definition so the two paths can
    never drift — the merge/regroup structure is pinned, e35d513):
    slot-source clamp, the (A, 8, th, 16)->(A, th, 128) regroup
    closure, the NEW depth strips, and a LAZY group-space shade+regroup
    (a closure so each caller traces it at the same point its original
    inline code did — shading stays in GROUP space; moving it to tile
    space measured +7 ms at 2048^2)."""
    from tinyrenderder_tpu.ops.raster_sparse import _pack_rgb
    from tinyrenderder_tpu.shaders import finalize_color

    a_cap = kernel_ids.shape[0]
    gc8 = d_g.shape[0] * STRIPS
    src_c = jnp.clip(src, 0, gc8 - 1)               # (A, 8)

    def to_tiles(x):                                # (A, 8, th, 16) ->
        return (x.transpose(0, 2, 1, 3)             # (A, th, 128)
                 .reshape(a_cap, tile_h, STRIPS * STRIP_W))

    d_new = _strips_of(d_g, tile_h)[src_c]          # (A, 8, th, 16)

    def shade_regroup():
        vary = {}
        i = 0
        for name, c in spec:
            vary[name] = jnp.moveaxis(v_g[:, i:i + c], 1, -1)  # (G,th,tw,c)
            i += c
        rgb = shader.fragment(uniforms, vary, jnp)
        color_g = _pack_rgb(finalize_color(rgb, jnp))  # (G, th, 128) i32
        return to_tiles(_strips_of(color_g, tile_h)[src_c])

    return src_c, to_tiles, d_new, shade_regroup


@functools.partial(jax.jit, static_argnames=("shader", "spec", "tile_h"))
def _post_fine2_jit(ft, ids, kernel_ids, src, live, d_g, w_g, v_g,
                    uniforms, winner_offset, shader, spec, tile_h):
    """Fused post stage: fragment-shade the PASS-LOCAL group outputs in
    group space (elementwise — a group's strips belonging to different
    tiles is irrelevant to shading), then regroup only THREE planes
    (depth, winner, packed color) into per-active-tile blocks and merge
    into the frame with a per-pixel strict-less select — bitwise
    identical to the in-kernel merge against a preloaded init (see
    module docstring).  Regrouping the 3 post-shading planes instead of
    the 3+V varying planes keeps the strip-transpose traffic ~5x
    smaller on Phong-class shaders (measured: the varying regroup cost
    +7 ms at 2048^2)."""
    from tinyrenderder_tpu.ops.raster_sparse import FrameTiles

    a_cap = kernel_ids.shape[0]
    src_c, to_tiles, d_new, shade_regroup = _fine2_shared_post(
        kernel_ids, src, d_g, v_g, uniforms, shader, spec, tile_h)
    d_old = (ft.depth[kernel_ids]                   # (A, th, 128)
             .reshape(a_cap, tile_h, STRIPS, STRIP_W)
             .transpose(0, 2, 1, 3))                # (A, 8, th, 16)
    live4 = live[:, :, None, None]
    won = live4 & (d_new < d_old)                   # strict-less merge
    d_m = to_tiles(jnp.where(won, d_new, d_old))
    won_t = to_tiles(won)
    new_depth = ft.depth.at[ids].set(d_m, mode="drop")

    w_new = to_tiles(_strips_of(w_g, tile_h)[src_c]).astype(jnp.int32)
    w_m = jnp.where(won_t, w_new + winner_offset, ft.winner[kernel_ids])
    new_winner = ft.winner.at[ids].set(w_m, mode="drop")

    if not spec:
        return FrameTiles(color=ft.color, depth=new_depth,
                          winner=new_winner)
    c_new = shade_regroup()
    c_m = jnp.where(won_t, c_new, ft.color[kernel_ids])
    new_color = ft.color.at[ids].set(c_m, mode="drop")
    return FrameTiles(color=new_color, depth=new_depth, winner=new_winner)


@functools.partial(jax.jit, static_argnames=("shader", "spec", "tile_h"))
def _post_fine2_image_jit(kernel_ids, src, live, d_g, v_g,
                          uniforms, shader, spec, tile_h):
    """Fresh-frame single-pass variant of _post_fine2_jit for the
    direct-to-image path (raster_sparse.render_frame_fused_image): the
    running frame depth is +inf everywhere, so the strict-less merge
    reduces to ``d_new < inf`` and the winner regroup plus all three
    frame-tile gathers/scatters vanish.  The shared regroup/shade core
    is _fine2_shared_post — only the fresh-frame select differs from
    the general merge.  Returns compact packed-color tiles (A, th, 128)
    with losers forced to background 0."""
    _src_c, to_tiles, d_new, shade_regroup = _fine2_shared_post(
        kernel_ids, src, d_g, v_g, uniforms, shader, spec, tile_h)
    won = live[:, :, None, None] & (d_new < jnp.inf)
    won_t = to_tiles(won)
    c_new = shade_regroup()
    return jnp.where(won_t, c_new, 0)


@functools.partial(jax.jit, static_argnames=("g_cap", "tile_h"))
def _init_strips_jit(ft_depth, sid_of, g_cap, tile_h):
    """(G_cap, th, 128) running-depth init for the STATS launch: slot
    k's lanes carry its assigned strip's current frame depth."""
    n_tiles = ft_depth.shape[0]
    sids = jnp.minimum(sid_of[:g_cap], n_tiles * STRIPS - 1)  # (G, 8)
    view = ft_depth.reshape(n_tiles, tile_h, STRIPS, STRIP_W)
    slabs = view[sids // STRIPS, :, sids % STRIPS, :]  # (G, 8, th, 16)
    return (slabs.transpose(0, 2, 1, 3)
            .reshape(sids.shape[0], tile_h, STRIPS * STRIP_W))


# ---------------------------------------------------------------------------
# Pass driver (contract-compatible with raster_sparse.render_pass_tiles)
# ---------------------------------------------------------------------------

# (F, ntx, nty) -> (pair_cap, row_cap, g_cap, a_cap)
_FINE2_CAPACITY: dict = {}
_FINE2_PENDING: dict = {}


def _quantize_groups(n_groups: int, n_tiles: int) -> int:
    from tinyrenderder_tpu.ops import raster_sparse
    return raster_sparse._quantize_active(n_groups, n_tiles)


def _resolve_pending(key, n_tiles):
    from tinyrenderder_tpu.ops import raster_sparse
    prev = _FINE2_PENDING.get(key)
    if prev is None:
        return
    totals_dev, prev_caps, age = prev
    ready = getattr(totals_dev, "is_ready", lambda: True)()
    # never block on an un-landed D2H (see raster_sparse._resolve_pending)
    if ready:
        _FINE2_PENDING.pop(key)
        pt, rt, ng, na = (int(x) for x in np.asarray(totals_dev))
        # compare against the CURRENT caps, not the pending snapshot —
        # another path may have grown them since this entry was queued
        # and the snapshot's max() would revert that growth
        pc, rc, gc, ac = _FINE2_CAPACITY.get(key, prev_caps)
        if pt > pc or rt > rc or ng > gc or na > ac:
            import logging
            logging.getLogger(__name__).warning(
                "fine2 overflow (pairs %d/%d, rows %d/%d, groups %d/%d, "
                "tiles %d/%d) detected %d frame(s) late; capacity grown",
                pt, pc, rt, rc, ng, gc, na, ac, age + 1)
            _FINE2_CAPACITY[key] = (
                max(pc, _quantize_tight(pt)),
                max(rc, _quantize_tight(rt)),
                max(gc, _quantize_groups(ng, n_tiles)),
                max(ac, raster_sparse._quantize_active(na, n_tiles)))
    else:
        _FINE2_PENDING[key] = (totals_dev, prev_caps, age + 1)


def _resolve_caps(key, attrs, uniforms, shader, width, height,
                  tile_h, tile_w, n_tiles):
    caps = _FINE2_CAPACITY.get(key)
    if caps is None:
        caps = _probe_caps(attrs, uniforms, shader, width, height,
                           tile_h, tile_w, n_tiles)
    _FINE2_CAPACITY[key] = caps
    return caps


@functools.partial(jax.jit, static_argnames=("pair_cap", "width", "height",
                                             "tile_h", "tile_w"))
def _probe_rows_jit(setup, pair_cap, width, height, tile_h, tile_w):
    """Grouped row/group/active totals from the strip bins."""
    ntx = _cdiv(width, tile_w)
    nty = _cdiv(height, tile_h)
    tx0, ty0, span_x, spans, _ = _tile_spans(setup, STRIP_W, tile_h)
    _, _, counts = _build_bins(tx0, ty0, span_x, spans, pair_cap,
                               ntx * STRIPS, nty)
    group_rows = -jnp.sort(-counts)[0::STRIPS]      # flat free packing
    rows_t = jnp.max(counts.reshape(ntx * nty, STRIPS), axis=1)
    return (jnp.sum(group_rows),
            jnp.sum((group_rows > 0).astype(jnp.int32)),
            jnp.sum((rows_t > 0).astype(jnp.int32)))


def _probe_caps(attrs, uniforms, shader, width, height, tile_h, tile_w,
                n_tiles):
    from tinyrenderder_tpu.ops import raster_fine, raster_sparse
    setup, pair_total = raster_fine._probe_totals_jit(
        attrs, uniforms, shader, width, height, tile_h, tile_w)
    pair_cap = _quantize_tight(int(jax.device_get(pair_total)))
    row_total, n_groups, n_active = _probe_rows_jit(
        setup, pair_cap, width, height, tile_h, tile_w)
    rt, ng, na = (int(x) for x in
                  jax.device_get((row_total, n_groups, n_active)))
    return (pair_cap, _quantize_tight(rt), _quantize_groups(ng, n_tiles),
            raster_sparse._quantize_active(na, n_tiles))


def render_pass_fine2(ft, attrs: dict, shader, uniforms: dict,
                      width: int, height: int, winner_offset: int = 0,
                      tile_h: int = TILE_H, tile_w: int = TILE_W,
                      strict_capacity: bool = True,
                      interpret: bool | None = None,
                      collect_stats: bool = False,
                      _caps: tuple | None = None):
    """Grouped-strip render of one (mesh, shader) pass on a
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
        _FINE2_CAPACITY[key] = caps
    else:
        caps = _resolve_caps(key, attrs, uniforms, shader, width, height,
                             tile_h, tile_w, n_tiles)
    pair_cap, row_cap, g_cap, a_cap = caps
    rec_cap = _next_pow2(row_cap)

    spec = (tuple(shader.varying_spec.items())
            if shader.writes_color else ())
    n_vary = sum(c for _, c in spec)
    (setup, rec, ids, kernel_ids, src, live, start_g, rows_g, x0y0,
     sid_of, pair_total, row_total, n_groups, n_active, _) = _pre_fine2_jit(
        attrs, uniforms, shader, width, height, pair_cap, row_cap,
        rec_cap, g_cap, a_cap, tile_h, tile_w)
    d_g, w_g, v_g, _ = _fine2_call_jit(
        start_g, rows_g, rec, x0y0, tile_h, n_vary, interpret)
    new_ft = _post_fine2_jit(ft, ids, kernel_ids, src, live, d_g, w_g,
                             v_g, uniforms, jnp.int32(winner_offset),
                             shader, spec, tile_h)
    overflowed = ((pair_total > pair_cap) | (row_total > row_cap)
                  | (n_groups > g_cap) | (n_active > a_cap))
    events = None
    if collect_stats:
        # separate stats launch seeded with the RUNNING frame depth so
        # event counts honor earlier passes (our_gl.cpp:194-200); the
        # frame kernel itself stays pass-local and init-free
        init_g = _init_strips_jit(ft.depth, sid_of, g_cap, tile_h)
        d_ev, w_ev, _, ev_g = _fine2_call_jit(
            start_g, rows_g, rec, x0y0, tile_h, 0, interpret,
            collect_stats=True, init_g=init_g)
        events = _reduce_events2_jit(ev_g, d_ev, w_ev)

    if strict_capacity:
        pt, rt, ng, na = (int(x) for x in jax.device_get(
            (pair_total, row_total, n_groups, n_active)))
        if pt > pair_cap or rt > row_cap or ng > g_cap or na > a_cap:
            from tinyrenderder_tpu.ops import raster_sparse as rs
            # grow from the CURRENT store, not the plan snapshot
            # (another same-key pass may have grown it — f67fb41)
            cpc, crc, cgc, cac = _FINE2_CAPACITY.get(
                key, (pair_cap, row_cap, g_cap, a_cap))
            grown = (max(cpc, _quantize_tight(pt)),
                     max(crc, _quantize_tight(rt)),
                     max(cgc, _quantize_groups(ng, n_tiles)),
                     max(cac, rs._quantize_active(na, n_tiles)))
            _FINE2_CAPACITY[key] = grown
            return render_pass_fine2(ft, attrs, shader, uniforms,
                                     width, height, winner_offset,
                                     tile_h, tile_w, strict_capacity,
                                     interpret, collect_stats, _caps=grown)
    else:
        raster_sparse._fold_or_stage_pending(
            _FINE2_PENDING, key,
            jnp.stack([pair_total, row_total, n_groups, n_active]), caps)
    if collect_stats:
        return new_ft, setup, overflowed, events
    return new_ft, setup, overflowed


@jax.jit
def _reduce_events2_jit(ev_g, d_g, w_g):
    """Exact counters from the stats launch's group planes: the launch
    is init-seeded, so group blocks hold running-depth-correct events;
    unscheduled/empty slots produced no events and lost every pixel."""
    frags = jnp.sum(ev_g[:, 0].astype(jnp.int32))   # exact past 2^24
    max_z = jnp.max(ev_g[:, 1])
    won = w_g.astype(jnp.int32) >= 0
    min_z = jnp.min(jnp.where(won, d_g, jnp.inf))
    return frags, min_z, max_z


@functools.partial(jax.jit, static_argnames=("pair_cap", "width", "height",
                                             "tile_h", "tile_w"))
def _probe_both_jit(setup, pair_cap, width, height, tile_h, tile_w):
    """One-shot dispatch probe: per-tile rows (raster_fine's layout),
    grouped rows (this module's layout), group count and active tiles —
    all from a single strip binning."""
    ntx = _cdiv(width, tile_w)
    nty = _cdiv(height, tile_h)
    tx0, ty0, span_x, spans, _ = _tile_spans(setup, STRIP_W, tile_h)
    _, _, counts = _build_bins(tx0, ty0, span_x, spans, pair_cap,
                               ntx * STRIPS, nty)
    rows_t = jnp.max(counts.reshape(ntx * nty, STRIPS), axis=1)
    group_rows = -jnp.sort(-counts)[0::STRIPS]      # flat free packing
    return (jnp.sum(rows_t),
            jnp.sum(group_rows),
            jnp.sum((group_rows > 0).astype(jnp.int32)),
            jnp.sum((rows_t > 0).astype(jnp.int32)))
