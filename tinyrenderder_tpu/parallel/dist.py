"""SPMD multi-device rendering: framebuffer row bands over a device mesh.

The reference renders one framebuffer on one CPU thread
(our_gl.cpp:147-200).  The TPU-native scaling axis is *pixel ownership*:
shard the framebuffer's rows across a ``jax.sharding.Mesh`` with
``jax.shard_map``, replicate the (small) geometry, and let every device
rasterize only its band.  Because each pixel lives on exactly one device,
depth resolution needs **no collectives at all** — the only communication
is the implicit output layout (and a host gather when writing the TGA).
This is the renderer's analogue of sequence parallelism: the "ring" the
scaling book would stream is unnecessary since triangle setup is tiny
compared to per-pixel work.

Semantics are identical to the single-device scan path: each band runs
ops.raster.depth_resolve_xla / shade_winners with a global pixel-row
offset (``lax.axis_index * band_h``), so sharded output is
pixel-identical to unsharded (asserted by tests/test_parallel.py on 8
virtual CPU devices — the multi-node-tests-without-a-cluster strategy,
SURVEY.md §4.4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from tinyrenderder_tpu import math3d
from tinyrenderder_tpu.ops import raster, semantics
from tinyrenderder_tpu.ops.raster import FrameBuffers

__all__ = ["make_mesh", "render_pass_sharded", "render_frame_sharded",
           "render_pass_geometry_sharded", "render_frame_geometry_sharded",
           "new_sharded_framebuffers", "AXIS"]

AXIS = "rows"
AXIS_Y, AXIS_X = "ty", "tx"


def make_mesh(n_devices: int | None = None) -> Mesh:
    """1-D device mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"requested {n_devices} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n_devices]), (AXIS,))


def make_mesh_grid(n_rows: int, n_cols: int) -> Mesh:
    """2-D ('ty', 'tx') device mesh: framebuffer sharded in both screen
    axes (row bands x column bands)."""
    devices = jax.devices()
    n = n_rows * n_cols
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n]).reshape(n_rows, n_cols),
                (AXIS_Y, AXIS_X))


def new_sharded_framebuffers(mesh: Mesh, width: int, height: int) -> FrameBuffers:
    """Fresh framebuffers laid out as row bands (1-D mesh) or screen
    blocks (2-D mesh) across the devices (init_zbuffer semantics: depth
    cleared to +inf, our_gl.cpp:72-74)."""
    if mesh.axis_names == (AXIS_Y, AXIS_X):
        if height % mesh.shape[AXIS_Y] or width % mesh.shape[AXIS_X]:
            raise ValueError(f"{width}x{height} not divisible by the "
                             f"{dict(mesh.shape)} mesh")
        sharding = NamedSharding(mesh, P(AXIS_Y, AXIS_X))
    else:
        n = mesh.devices.size
        if height % n:
            raise ValueError(f"height {height} not divisible by {n} devices")
        sharding = NamedSharding(mesh, P(AXIS))

    @functools.partial(jax.jit, out_shardings=sharding)
    def init():
        return FrameBuffers(
            color=jnp.zeros((height, width, 3), jnp.uint8),
            depth=jnp.full((height, width), jnp.inf, jnp.float32),
            winner=jnp.full((height, width), raster.BACKGROUND, jnp.int32),
        )

    return init()


@functools.lru_cache(maxsize=None)
def _sharded_pass_fn(mesh: Mesh, shader, width: int, height: int, chunk: int):
    n = mesh.devices.size
    band_h = height // n
    vp = math3d.viewport(0, 0, width, height)

    def shard_body(fb: FrameBuffers, attrs, uniforms, winner_offset):
        y0 = jax.lax.axis_index(AXIS) * band_h
        dtype = attrs["position"].dtype
        # replicated geometry work: vertex transform + triangle setup is
        # tiny next to per-pixel work, so every device redoes it rather
        # than paying an all-gather (scaling-book style tradeoff)
        clip, varyings = shader.vertex(uniforms, attrs, jnp)
        setup = semantics.triangle_setup_planes(
            clip, jnp.asarray(vp, dtype=dtype), width, height, jnp)
        # the fresh winner buffer must carry the same device-varying type
        # as the depth it is scanned with (shard_map vma tracking)
        init_winner = jax.lax.pcast(
            jnp.full((band_h, width), raster.BACKGROUND, jnp.int32),
            AXIS, to="varying")
        depth, winner_local = raster.depth_resolve_xla(
            setup, band_h, width, chunk=chunk, init_depth=fb.depth,
            init_winner=init_winner, y0=y0)
        won = winner_local >= 0
        new_winner = jnp.where(won, winner_local + winner_offset, fb.winner)
        if shader.writes_color:
            color = raster.shade_winners(fb.color, winner_local, setup,
                                         varyings, shader, uniforms,
                                         band_h, width, y0=y0)
        else:
            color = fb.color             # depth-only pass
        return FrameBuffers(color=color, depth=depth, winner=new_winner)

    fb_spec = FrameBuffers(color=P(AXIS), depth=P(AXIS), winner=P(AXIS))
    mapped = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(fb_spec, P(), P(), P()),
        out_specs=fb_spec)
    return jax.jit(mapped)


def render_pass_sharded(mesh: Mesh, fb: FrameBuffers, attrs: dict, shader,
                        uniforms: dict, winner_offset: int = 0,
                        chunk: int = 8) -> FrameBuffers:
    """Render one (mesh, shader) pass with the framebuffer row-sharded
    over ``mesh``.  Same per-pixel results as raster.render_pass_xla."""
    height, width = fb.color.shape[:2]
    fn = _sharded_pass_fn(mesh, shader, width, height, chunk)
    attrs = {k: jnp.asarray(v) for k, v in attrs.items()}
    return fn(fb, attrs, dict(uniforms), jnp.int32(winner_offset))


def render_frame_sharded(mesh: Mesh, passes, width: int, height: int,
                         chunk: int = 8, tiled: bool | None = None,
                         return_output_depth: bool = False):
    """Full multi-pass frame (the main.cpp:647-736 flow) on a sharded
    framebuffer.  ``passes``: iterable of (attrs, shader, uniforms) or
    (attrs, shader, uniforms, exclude_from_output_depth).

    Passes flagged ``exclude_from_output_depth`` get the reference's
    z-snapshot-around-the-eye-pass semantics (main.cpp:700,730): their
    depth writes are restored away before any later pass and excluded
    from the frame's *output* depth.  The snapshot is a free pytree
    reference (sharded arrays are immutable) and needs no collectives.

    ``tiled=None`` uses the production binned/Pallas pipeline when the
    band height is tile-aligned, else the scan path.

    Returns ``fb``, or ``(fb, output_depth)`` when
    ``return_output_depth`` — ``fb.depth`` always includes every pass,
    ``output_depth`` is the post-restore depth SSAO/z-viz should see.
    """
    from tinyrenderder_tpu.ops import raster_tiled
    two_d = mesh.axis_names == (AXIS_Y, AXIS_X)
    if tiled is None:
        if two_d:
            tiled = (height % (mesh.shape[AXIS_Y] * raster_tiled.TILE_H) == 0
                     and width % (mesh.shape[AXIS_X] * raster_tiled.TILE_W) == 0)
        else:
            tiled = height % (mesh.devices.size * raster_tiled.TILE_H) == 0
    if two_d and not tiled:
        raise ValueError("2-D meshes require the tiled pipeline "
                         "(tile-aligned blocks)")
    fb = new_sharded_framebuffers(mesh, width, height)
    offset = 0
    snapshot_depth = None
    in_excluded = False
    for item in passes:
        attrs, shader, uniforms, *rest = item
        exclude = bool(rest[0]) if rest else False
        if exclude:
            if not in_excluded:
                snapshot_depth = fb.depth       # immutable: free snapshot
                in_excluded = True
        elif in_excluded:
            # main.cpp:730: restore before any later pass renders
            fb = FrameBuffers(color=fb.color, depth=snapshot_depth,
                              winner=fb.winner)
            in_excluded = False
        if tiled:
            fb = render_pass_sharded_tiled(mesh, fb, attrs, shader, uniforms,
                                           winner_offset=offset)
        else:
            fb = render_pass_sharded(mesh, fb, attrs, shader, uniforms,
                                     winner_offset=offset, chunk=chunk)
        offset += attrs["position"].shape[0]
    if return_output_depth:
        out_depth = snapshot_depth if in_excluded else fb.depth
        return fb, out_depth
    return fb



# ---------------------------------------------------------------------------
# Geometry (triangle) parallelism: the collectives-based SPMD analogue
# ---------------------------------------------------------------------------

def _geometry_pass_fn(mesh: Mesh, shader, width: int, height: int,
                      chunk: int, f_shard: int):
    """SPMD triangle parallelism (SURVEY.md §2 parallelism checklist):
    the face arrays are sharded over the mesh in contiguous submission-
    order blocks, every device rasterizes its block over the FULL frame,
    and the per-device results merge with XLA collectives over ICI:

      * depth: ``lax.pmin`` — all-reduce-min of the per-device z-buffers.
      * winner: min global triangle id among devices achieving the
        merged z (the reference's strict-less first-drawn-wins tie rule
        our_gl.cpp:165 IS min-id-at-min-z, since submission order is id
        order).
      * color: each device shades only pixels its triangle won; an
        exactly-one-contributor ``lax.psum`` assembles the frame.

    Complements the zero-collective pixel-ownership sharding
    (_sharded_pass_fn): that path scales per-pixel work, this one scales
    per-triangle work for high-poly/small-frame regimes — together they
    are the renderer's data/tensor-parallel pair.  Bitwise-identical to
    the single-device scan path (tests/test_parallel.py)."""
    vp = math3d.viewport(0, 0, width, height)
    BIG = jnp.int32(1 << 30)

    def shard_body(fb: FrameBuffers, attrs_shard, uniforms, winner_offset):
        base = jax.lax.axis_index(AXIS) * f_shard
        dtype = attrs_shard["position"].dtype
        clip, varyings = shader.vertex(uniforms, attrs_shard, jnp)
        setup = semantics.triangle_setup_planes(
            clip, jnp.asarray(vp, dtype=dtype), width, height, jnp)
        init_winner = jax.lax.pcast(
            jnp.full((height, width), raster.BACKGROUND, jnp.int32),
            AXIS, to="varying")
        init_depth = jax.lax.pcast(fb.depth, AXIS, to="varying")
        depth_l, winner_l = raster.depth_resolve_xla(
            setup, height, width, chunk=chunk, init_depth=init_depth,
            init_winner=init_winner)
        # ---- ICI merge ----
        zmin = jax.lax.pmin(depth_l, AXIS)
        cand = jnp.where((winner_l >= 0) & (depth_l == zmin),
                         winner_l + base, BIG)
        gwin = jax.lax.pmin(cand, AXIS)
        drawn = gwin < BIG
        new_winner = jnp.where(drawn, gwin + winner_offset, fb.winner)
        if shader.writes_color:
            mine = drawn & (cand == gwin)      # this device owns the pixel
            color_l = raster.shade_winners(
                fb.color, jnp.where(mine, winner_l, raster.BACKGROUND),
                setup, varyings, shader, uniforms, height, width)
            col = jax.lax.psum(
                jnp.where(mine[..., None], color_l.astype(jnp.int32), 0),
                AXIS).astype(jnp.uint8)
            any_mine = jax.lax.psum(mine.astype(jnp.int32), AXIS) > 0
            color = jnp.where(any_mine[..., None], col, fb.color)
        else:
            color = fb.color
        return FrameBuffers(color=color, depth=zmin, winner=new_winner)

    attrs_spec = P(AXIS)                        # faces sharded, axis 0
    fb_spec = FrameBuffers(color=P(), depth=P(), winner=P())
    mapped = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(fb_spec, attrs_spec, P(), P()),
        out_specs=fb_spec)
    return jax.jit(mapped)


def render_pass_geometry_sharded(mesh: Mesh, fb: FrameBuffers, attrs: dict,
                                 shader, uniforms: dict,
                                 winner_offset: int = 0,
                                 chunk: int = 8) -> FrameBuffers:
    """One pass with triangles sharded over the mesh (see
    _geometry_pass_fn).  The framebuffer is replicated; face arrays are
    padded to a device multiple with degenerate (w=0, auto-rejected)
    triangles so contiguous blocks preserve submission order."""
    n = mesh.devices.size
    f = attrs["position"].shape[0]
    f_shard = -(-max(f, 1) // n)
    pad = f_shard * n - f
    if pad:
        attrs = {k: jnp.concatenate(
            [jnp.asarray(v),
             jnp.zeros((pad,) + tuple(v.shape[1:]), v.dtype)], axis=0)
            for k, v in attrs.items()}
    fn = _geometry_pass_fn(mesh, shader, width=fb.width, height=fb.height,
                           chunk=chunk, f_shard=f_shard)
    return fn(fb, attrs, uniforms, jnp.int32(winner_offset))


def render_frame_geometry_sharded(mesh: Mesh, passes, width: int,
                                  height: int, chunk: int = 8):
    """Multi-pass frame with geometry parallelism (incl. the z-snapshot
    semantics around excluded passes, main.cpp:700,730).  Returns
    (fb, output_depth)."""
    fb = raster.new_framebuffers(width, height)
    offset = 0
    snapshot_depth = None
    in_excluded = False
    for item in passes:
        attrs, shader, uniforms, *rest = item
        exclude = bool(rest[0]) if rest else False
        if exclude:
            if not in_excluded:
                snapshot_depth = fb.depth
                in_excluded = True
        elif in_excluded:
            fb = FrameBuffers(color=fb.color, depth=snapshot_depth,
                              winner=fb.winner)
            in_excluded = False
        fb = render_pass_geometry_sharded(mesh, fb, attrs, shader,
                                          uniforms, winner_offset=offset,
                                          chunk=chunk)
        offset += attrs["position"].shape[0]
    out_depth = snapshot_depth if in_excluded else fb.depth
    return fb, out_depth


# ---------------------------------------------------------------------------
# Production sharded path: per-band CSR binning + the Pallas tile kernel
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _sharded_tiled_fn(mesh: Mesh, shader, width: int, height: int,
                      capacity: int, tile_h: int, tile_w: int,
                      interpret: bool):
    from tinyrenderder_tpu.ops import raster_pallas, raster_tiled

    two_d = mesh.axis_names == (AXIS_Y, AXIS_X)
    n_rows = mesh.shape[AXIS_Y] if two_d else mesh.devices.size
    n_cols = mesh.shape[AXIS_X] if two_d else 1
    band_h = height // n_rows
    band_w = width // n_cols
    band_tiles_y = band_h // tile_h
    band_tiles_x = band_w // tile_w
    spec = (tuple(shader.varying_spec.items())
            if shader.writes_color else ())
    n_vary = sum(c for _, c in spec)
    vp = math3d.viewport(0, 0, width, height)

    def shard_body(fb: FrameBuffers, attrs, uniforms, winner_offset):
        iy = jax.lax.axis_index(AXIS_Y if two_d else AXIS)
        ix = jax.lax.axis_index(AXIS_X) if two_d else jnp.int32(0)
        ty_lo = iy * band_tiles_y
        ty_hi = ty_lo + band_tiles_y - 1
        tx_lo = ix * band_tiles_x
        tx_hi = tx_lo + band_tiles_x - 1
        dtype = attrs["position"].dtype

        clip, varyings = shader.vertex(uniforms, attrs, jnp)
        setup = semantics.triangle_setup_planes(
            clip, jnp.asarray(vp, dtype=dtype), width, height, jnp)
        tx0, ty0, span_x, spans, total = raster_tiled._tile_spans(
            setup, tile_w, tile_h, ty_lo, ty_hi,
            tx_lo if two_d else None, tx_hi if two_d else None)
        sorted_tri, start, counts = raster_tiled._build_bins(
            tx0, ty0, span_x, spans, capacity, band_tiles_x, band_tiles_y)
        vary_corners = (raster_tiled._flatten_varyings(varyings, spec)
                        if spec else None)
        records = raster_pallas.build_pair_records(
            setup, sorted_tri, vary_corners)
        init_tiles = raster_tiled._to_tiles(
            fb.depth, band_tiles_y, band_tiles_x, tile_h, tile_w, jnp.inf)
        origin = jnp.stack([ix * jnp.int32(band_w), iy * jnp.int32(band_h)])
        depth_t, winner_t, vary_t = raster_pallas._pallas_call_jit(
            start[:-1], counts, records, init_tiles,
            band_tiles_x, band_tiles_y, tile_h, tile_w, n_vary, interpret,
            origin=origin)
        new_fb = raster_tiled._post_pallas_jit(
            fb, depth_t, winner_t, vary_t, uniforms, winner_offset,
            shader, spec, band_w, band_h, tile_h, tile_w)
        t_out = total.reshape(1, 1) if two_d else total.reshape(1)
        return new_fb, t_out              # per-block totals, gathered

    if two_d:
        block = P(AXIS_Y, AXIS_X)
        total_spec = P(AXIS_Y, AXIS_X)
    else:
        block = P(AXIS)
        total_spec = P(AXIS)
    fb_spec = FrameBuffers(color=block, depth=block, winner=block)
    # check_vma=False: pallas_call's out_shapes don't carry vma metadata
    mapped = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(fb_spec, P(), P(), P()),
        out_specs=(fb_spec, total_spec),
        check_vma=False)
    return jax.jit(mapped)


def render_pass_sharded_tiled(mesh: Mesh, fb: FrameBuffers, attrs: dict,
                              shader, uniforms: dict,
                              winner_offset: int = 0,
                              tile_h: int | None = None,
                              tile_w: int | None = None,
                              _capacity: int | None = None) -> FrameBuffers:
    """One pass through the binned/Pallas pipeline with the framebuffer
    row-sharded over ``mesh``: each device bins triangles against its own
    band's tile grid and rasterizes only those — still zero collectives."""
    from tinyrenderder_tpu.ops import raster_tiled

    if tile_h is None:
        tile_h = raster_tiled.TILE_H
    if tile_w is None:
        tile_w = raster_tiled.TILE_W
    height, width = fb.color.shape[:2]
    two_d = mesh.axis_names == (AXIS_Y, AXIS_X)
    n_rows = mesh.shape[AXIS_Y] if two_d else mesh.devices.size
    n_cols = mesh.shape[AXIS_X] if two_d else 1
    if (height % n_rows) or (height // n_rows) % tile_h:
        raise ValueError(f"height {height} not divisible into {n_rows} "
                         f"tile-aligned bands")
    if (width % n_cols) or (width // n_cols) % tile_w:
        raise ValueError(f"width {width} not divisible into {n_cols} "
                         f"tile-aligned columns")
    f = attrs["position"].shape[0]
    if f == 0:
        return fb
    attrs = {k: jnp.asarray(v) for k, v in attrs.items()}
    uniforms = dict(uniforms)

    key = (f, width, height, n_rows, n_cols, "sharded")
    capacity = (_capacity if _capacity is not None
                else raster_tiled._PAIR_CAPACITY.get(key))
    if capacity is None:
        # first frame: sync once on the unsharded full-screen pair count
        # (an upper bound for every band)
        setup0, _ = raster_tiled._vertex_setup_jit(
            attrs, uniforms, shader, width, height)
        *_, total0 = raster_tiled._tile_spans(setup0, tile_w, tile_h)
        capacity = raster_tiled._quantize_capacity(
            int(jax.device_get(total0)))
    raster_tiled._PAIR_CAPACITY[key] = capacity

    interpret = jax.default_backend() != "tpu"
    fn = _sharded_tiled_fn(mesh, shader, width, height, capacity,
                           tile_h, tile_w, interpret)
    new_fb, totals = fn(fb, attrs, uniforms, jnp.int32(winner_offset))
    tot = int(jax.device_get(jnp.max(totals)))
    if tot > capacity:
        return render_pass_sharded_tiled(
            mesh, fb, attrs, shader, uniforms, winner_offset, tile_h,
            tile_w, _capacity=raster_tiled._quantize_capacity(tot))
    return new_fb
