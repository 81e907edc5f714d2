"""End-to-end asset pipeline: OBJ + MTL + TGA textures from disk through
ModelManager into a parity-checked render (the reference's
loadModel -> render flow, main.cpp:483-489 + 647-668)."""

import os

import numpy as np

from helpers import assert_parity, default_view, make_pass, render_engine, render_oracle
from tinyrenderder_tpu.models import procedural
from tinyrenderder_tpu.models.manager import ModelManager
from tinyrenderder_tpu.shaders import PhongShader
from tinyrenderder_tpu.utils import tga

KEY = np.array([1.0, 1.4, 1.0])
FILL = np.array([-0.3, 0.5, 0.2])
RIM = np.array([-1.0, 0.8, -1.5])


def _write_scene(tmp_path):
    """A quad pyramid with full material maps, written as real files."""
    obj = tmp_path / "pyramid.obj"
    obj.write_text("""mtllib pyramid.mtl
v -1 0 -1
v  1 0 -1
v  1 0  1
v -1 0  1
v  0 1.5 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
vt 0.5 0.5
usemtl stone
f 1/1 2/2 5/5
f 2/2 3/3 5/5
f 3/3 4/4 5/5
f 4/4 1/1 5/5
f 4/4 3/3 2/2 1/1
""")
    (tmp_path / "pyramid.mtl").write_text("""newmtl stone
map_Kd pyramid_diffuse.tga
map_Bump pyramid_nm.tga
map_Ks pyramid_spec.tga
""")
    for name, tex in (("pyramid_diffuse", procedural.checker_texture(32)),
                      ("pyramid_nm", procedural.sphere_normal_texture(32)),
                      ("pyramid_spec", procedural.gradient_specular_texture(32))):
        tga.TGAImage.from_rgb(tex).write_tga_file(
            str(tmp_path / f"{name}.tga"))
    return str(obj)


def test_obj_mtl_tga_pipeline_parity(tmp_path):
    path = _write_scene(tmp_path)
    manager = ModelManager()
    mesh = manager.load_model(path)
    assert mesh is not None
    assert mesh.nfaces == 6            # 4 tris + 1 quad fan-triangulated
    mat = mesh.materials[0]
    assert mat.has_diffuse and mat.has_normal and mat.has_specular
    # textures round-tripped through TGA keep exact bytes (after unflip)
    assert np.array_equal(mat.diffuse[::-1], procedural.checker_texture(32))

    view, proj = default_view(eye=(0, 1.2, 3.2), target=(0, 0.4, 0))
    p = make_pass(mesh, PhongShader(KEY, FILL, RIM, normal_map_strength=0.5),
                  view, proj)
    frame = render_oracle([p], 80, 64)
    fb = render_engine([p], 80, 64, backend="tiled")
    assert np.isfinite(frame.zbuffer).sum() > 200
    assert_parity(frame, fb)

    # manager cache: second load returns the same object
    assert manager.load_model(path) is mesh
