"""Per-stage timing of the SPARSE (production TPU) pipeline.

Usage: python scripts/profile_sparse.py [config]
  config: phong2048 | textured800 | gouraud800 | sponza | shadowdepth
"""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from tinyrenderder_tpu.ops import raster_pallas, raster_sparse
from tinyrenderder_tpu.ops.raster_tiled import _cdiv


def t(fn, n=20, warmup=3):
    from bench import _force, _measure_rtt
    for _ in range(warmup):
        _force(fn())
    rtt = _measure_rtt()
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    _force(r)
    return (time.perf_counter() - t0 - rtt) / n * 1e3


def main():
    cfg = sys.argv[1] if len(sys.argv) > 1 else "phong2048"
    import numpy as np

    from bench import _camera, _head, _lights
    from tinyrenderder_tpu import math3d
    from tinyrenderder_tpu.shaders import (DepthShader, GouraudShader,
                                           PhongShader, TexturedShader)
    key, fill, rim = _lights()
    if cfg == "sponza":
        W, H = 1280, 800
        from tinyrenderder_tpu.models import procedural
        wall = procedural.head_wall(grid=3)
        view = math3d.lookat((0, 0.3, 6.5), (0, 0, 0), (0, 1, 0))
        proj = math3d.perspective(60.0, W / H, 0.1, 50.0)
        shader = PhongShader(key, fill, rim, normal_map_strength=0.5)
        uniforms = shader.build_uniforms(view, proj, wall.materials[0],
                                         np.float32)
        attrs = wall.face_attributes(np.float32)
    else:
        W = H = {"phong2048": 2048, "textured800": 800,
                 "gouraud800": 800, "shadowdepth": 1024}[cfg]
        shader = {"phong2048": PhongShader(key, fill, rim,
                                           normal_map_strength=0.5),
                  "textured800": TexturedShader(light_world=key),
                  "gouraud800": GouraudShader(light_world=key),
                  "shadowdepth": DepthShader()}[cfg]
        head = _head(96, 144)
        cam = _camera(W, H)
        uniforms = shader.build_uniforms(cam.view_matrix,
                                         cam.projection_matrix,
                                         head.materials[0], np.float32)
        attrs = head.face_attributes(np.float32)
    attrs = {k: jnp.asarray(v) for k, v in attrs.items()}
    from tinyrenderder_tpu.scene import _to_device_cached
    uniforms = {k: _to_device_cached(v) for k, v in uniforms.items()}

    print("backend:", jax.default_backend(), "config:", cfg, "=",
          f"{W}x{H}", file=sys.stderr)

    th, tw = raster_sparse.TILE_H, raster_sparse.TILE_W
    ntx, nty = _cdiv(W, tw), _cdiv(H, th)
    ft = raster_sparse.new_frame_tiles(W, H)

    # warm once through the public entry (resolves capacities)
    out = raster_sparse.render_pass_tiles(ft, attrs, shader, uniforms, W, H)
    jax.block_until_ready(out[0])
    key = (attrs["position"].shape[0], ntx, nty, th, tw)
    capacity, a_cap = raster_sparse._SPARSE_CAPACITY[key][:2]
    spec = (tuple(shader.varying_spec.items())
            if shader.writes_color else ())
    n_vary = sum(c for _, c in spec)
    print(f"pairs cap={capacity} active cap={a_cap} of {ntx*nty} tiles "
          f"n_vary={n_vary}")

    pre = lambda: raster_sparse._pre_sparse_jit(
        attrs, uniforms, shader, W, H, capacity, a_cap, th, tw)
    (setup, records, ids, kernel_ids, start_a, counts_a, total,
     n_active) = pre()
    jax.block_until_ready(records)
    print(f"pairs={int(jax.device_get(total))} "
          f"active={int(jax.device_get(n_active))}")
    print(f"pre (vertex+setup+bins+records+compact): {t(pre):.2f} ms")

    interp = jax.default_backend() != "tpu"
    kern = lambda: raster_pallas._pallas_call_sparse_jit(
        kernel_ids, start_a, counts_a, records, ft.depth,
        ntx, nty, th, tw, n_vary, interp)
    depth_c, winner_c, vary_c, _ = kern()
    jax.block_until_ready(depth_c)
    print(f"kernel (loop1+loop2): {t(kern):.2f} ms")
    kern0 = lambda: raster_pallas._pallas_call_sparse_jit(
        kernel_ids, start_a, counts_a, records, ft.depth,
        ntx, nty, th, tw, 0, interp)
    jax.block_until_ready(kern0()[0])
    print(f"kernel depth-only (loop1): {t(kern0):.2f} ms")

    post = lambda: raster_sparse._post_sparse_jit(
        ft, ids, kernel_ids, depth_c, winner_c, vary_c, uniforms,
        jnp.int32(0), shader, spec)[0]
    jax.block_until_ready(post().color)
    print(f"post (phase C shade+scatter): {t(post):.2f} ms")

    untile = lambda: raster_sparse.tiles_to_buffers(ft, W, H)
    jax.block_until_ready(untile().color)
    print(f"tiles_to_buffers (transfer boundary): {t(untile):.2f} ms")

    full = lambda: raster_sparse.render_pass_tiles(
        ft, attrs, shader, uniforms, W, H, strict_capacity=False)[0]
    jax.block_until_ready(full().color)
    print(f"full pass: {t(full):.2f} ms")


if __name__ == "__main__":
    main()
