"""Fine-vs-coarse sparse path on real TPU: parity + per-config timing.

Usage: python scripts/bench_fine.py [config ...]
Configs: sponza phong2048 textured800 gouraud800 shadowdepth
"""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from tinyrenderder_tpu import math3d
from tinyrenderder_tpu.ops import raster_fine, raster_sparse


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


def build(cfg):
    import numpy as np

    from bench import _camera, _head, _lights
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
    return W, H, attrs, shader, uniforms


def main():
    cfgs = sys.argv[1:] or ["sponza"]
    from tinyrenderder_tpu.scene import _to_device_cached
    for cfg in cfgs:
        W, H, attrs, shader, uniforms = build(cfg)
        attrs = {k: jnp.asarray(v) for k, v in attrs.items()}
        uniforms = {k: _to_device_cached(v) for k, v in uniforms.items()}
        ft0 = raster_sparse.new_frame_tiles(W, H)

        t0 = time.perf_counter()
        ft_c, _, _ = raster_sparse.render_pass_tiles(
            ft0, attrs, shader, uniforms, W, H)
        jax.block_until_ready(ft_c.depth)
        t1 = time.perf_counter()
        ft_f, _, _ = raster_fine.render_pass_fine(
            ft0, attrs, shader, uniforms, W, H)
        jax.block_until_ready(ft_f.depth)
        t2 = time.perf_counter()

        fb_c = raster_sparse.tiles_to_buffers(ft_c, W, H)
        fb_f = raster_sparse.tiles_to_buffers(ft_f, W, H)
        d_c, d_f = np.asarray(fb_c.depth), np.asarray(fb_f.depth)
        w_c, w_f = np.asarray(fb_c.winner), np.asarray(fb_f.winner)
        c_c = np.asarray(fb_c.color).astype(int)
        c_f = np.asarray(fb_f.color).astype(int)
        both = np.isfinite(d_c) & np.isfinite(d_f)
        print(f"[{cfg}] parity: cov="
              f"{(np.isfinite(d_c) == np.isfinite(d_f)).all()} "
              f"win={(w_c == w_f).all()} "
              f"depth_bw={bool((d_c[both] == d_f[both]).all())} "
              f"color_maxdiff={np.abs(c_c - c_f).max()} "
              f"(compile c={t1-t0:.0f}s f={t2-t1:.0f}s)")

        key = (attrs["position"].shape[0],
               -(-W // raster_sparse.TILE_W), -(-H // raster_sparse.TILE_H))
        print(f"  caps coarse={raster_sparse._SPARSE_CAPACITY.get(key)} "
              f"fine={raster_fine._FINE_CAPACITY.get(key)}")

        coarse = lambda: raster_sparse.render_pass_tiles(
            ft0, attrs, shader, uniforms, W, H, strict_capacity=False)[0]
        fine = lambda: raster_fine.render_pass_fine(
            ft0, attrs, shader, uniforms, W, H, strict_capacity=False)[0]
        ms_c = t(coarse)
        ms_f = t(fine)
        print(f"  coarse {ms_c:7.2f} ms   fine {ms_f:7.2f} ms   "
              f"speedup {ms_c / ms_f:.2f}x")


if __name__ == "__main__":
    main()
