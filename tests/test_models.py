"""Mesh / OBJ loader / ModelManager tests."""

import numpy as np
import pytest

from tinyrenderder_tpu.models import procedural
from tinyrenderder_tpu.models.manager import ModelManager
from tinyrenderder_tpu.models.mesh import Mesh
from tinyrenderder_tpu.models.obj import load_obj
from tinyrenderder_tpu.utils import tga

CUBE_OBJ = """
# simple cube-ish quad mesh with polygon faces
mtllib demo.mtl
v -1 -1 0
v 1 -1 0
v 1 1 0
v -1 1 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
vn 0 0 1
usemtl mat0
f 1/1/1 2/2/1 3/3/1 4/4/1
"""

MTL = """
newmtl mat0
map_Kd tex_diffuse.tga
"""


@pytest.fixture
def obj_dir(tmp_path):
    (tmp_path / "quad.obj").write_text(CUBE_OBJ)
    (tmp_path / "demo.mtl").write_text(MTL)
    tex = tga.TGAImage(data=procedural.checker_texture(16)[..., ::-1])  # BGR file
    tga.write(tex, tmp_path / "tex_diffuse.tga")
    return tmp_path


def test_obj_fan_triangulation_and_flipuv(obj_dir):
    mesh = load_obj(str(obj_dir / "quad.obj"))
    assert mesh.nfaces == 2                       # quad -> 2 triangles
    assert mesh.nverts == 4                       # joined identical vertices
    # FlipUVs: v' = 1 - v
    assert mesh.uvs[0].tolist() == [0.0, 1.0]
    assert mesh.uvs[2].tolist() == [1.0, 0.0]
    assert np.allclose(mesh.normals, [[0, 0, 1]] * 4)
    assert mesh.materials[0].has_diffuse
    assert mesh.materials[0].diffuse.shape == (16, 16, 3)


def test_obj_negative_indices(tmp_path):
    (tmp_path / "neg.obj").write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
    mesh = load_obj(str(tmp_path / "neg.obj"))
    assert mesh.nfaces == 1
    assert np.allclose(mesh.positions[mesh.faces[0]],
                       [[0, 0, 0], [1, 0, 0], [0, 1, 0]])


def test_normal_generation_area_weighted(tmp_path):
    (tmp_path / "tri.obj").write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    mesh = load_obj(str(tmp_path / "tri.obj"))
    # single CCW triangle in xy-plane -> +z normal on all corners
    assert np.allclose(mesh.normals, [[0, 0, 1]] * 3)


def test_normal_generation_preserves_authored_rows():
    """Mixed vertex buffers (submeshes with and without authored normals
    merged, e.g. multi-primitive glTF/FBX) only FILL the missing rows —
    regression: any zero row used to trigger a full regeneration that
    discarded authored shading."""
    from tinyrenderder_tpu.models.mesh import Mesh
    authored = np.array([0.0, 0.6, 0.8])     # deliberately not the face
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [2, 0, 0],
                    [3, 0, 0], [2, 1, 0]], float)
    normals = np.zeros((6, 3))
    normals[:3] = authored                   # first triangle: authored
    mesh = Mesh(positions=pos, normals=normals,
                faces=np.array([[0, 1, 2], [3, 4, 5]], np.int32))
    mesh.generate_normals_if_needed()
    assert np.allclose(mesh.normals[:3], authored)       # untouched
    assert np.allclose(mesh.normals[3:], [[0, 0, 1]] * 3)  # generated


def test_tangent_generation():
    mesh = procedural.uv_sphere(8, 12)
    mesh.tangents = np.zeros_like(mesh.tangents)
    mesh.compute_tangents_if_needed()
    lens = np.linalg.norm(mesh.tangents, axis=-1)
    assert np.all(lens > 0.9)  # unit or fallback (1,0,0)
    # tangents orthogonal to unit normals where generated
    dots = np.abs((mesh.tangents * mesh.normals).sum(-1))
    assert np.percentile(dots, 90) < 1e-6


def test_local_aabb_margin():
    mesh = Mesh(positions=np.array([[0, 0, 0], [2, 2, 2.0]]),
                faces=np.array([[0, 1, 0]], dtype=np.int32)).finalize()
    box = mesh.get_local_aabb()
    assert np.allclose(box.min, [-0.02] * 3)
    assert np.allclose(box.max, [2.02] * 3)


def test_legacy_accessors_oob():
    mesh = procedural.plane()
    assert np.array_equal(mesh.vert(999, 0), np.zeros(3))
    assert np.array_equal(mesh.normal(999, 0), [0, 0, 1])
    assert np.array_equal(mesh.uv(-1, 0), np.zeros(2))


def test_manager_cache_and_unload(obj_dir):
    mgr = ModelManager()
    m1 = mgr.load_model(str(obj_dir / "quad.obj"))
    m2 = mgr.load_model(str(obj_dir / "quad.obj"))
    assert m1 is m2                                   # cache hit
    assert mgr.stats() == {"quad.obj": 2}
    assert mgr.unload_model(str(obj_dir / "quad.obj"))
    assert not mgr.unload_model(str(obj_dir / "quad.obj"))
    m3 = mgr.load_model(str(obj_dir / "quad.obj"))
    assert m3 is not m1
    mgr.unload_all()
    assert mgr.stats() == {}


def test_manager_missing_file_returns_none():
    mgr = ModelManager()
    assert mgr.load_model("/nonexistent/foo.obj") is None


def test_face_attributes_shapes():
    mesh = procedural.bumpy_head(8, 10)
    attrs = mesh.face_attributes(np.float32)
    f = mesh.nfaces
    assert attrs["position"].shape == (f, 3, 3)
    assert attrs["uv"].shape == (f, 3, 2)
    assert attrs["position"].dtype == np.float32


def test_native_obj_parser_matches_python(tmp_path):
    """The C++ tokenizer (native/obj_loader.cpp) must produce arrays
    identical to the Python loader, including polygon fan triangulation,
    negative/partial index triples, group and material submesh splits."""
    import numpy as np
    import pytest

    from tinyrenderder_tpu.models import obj
    from tinyrenderder_tpu.utils import native

    if not native.obj_available():
        pytest.skip("native library not built")

    content = """# test
mtllib test.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
vn 0 0 1
g quad
usemtl matA
f 1/1/1 2/2/1 3/3/1 4/4/1
o tri
usemtl matB
f -4//-1 -3// -2
f 1/1 2/2 3/3
usemtl matA
f 2/2/1 3/3/1 4/4/1
"""
    p = tmp_path / "test.obj"
    p.write_text(content)
    a = obj.load_obj(str(p), load_textures=False, use_native=False)
    b = obj.load_obj(str(p), load_textures=False, use_native=True)
    assert np.array_equal(a.positions, b.positions)
    assert np.array_equal(a.faces, b.faces)
    assert np.array_equal(a.uvs, b.uvs)
    assert np.array_equal(a.normals, b.normals)
    assert len(a.submeshes) == len(b.submeshes)
    for sa, sb in zip(a.submeshes, b.submeshes):
        assert (sa.name, sa.start_index, sa.index_count, sa.material_index) \
            == (sb.name, sb.start_index, sb.index_count, sb.material_index)
    assert [m.name for m in a.materials] == [m.name for m in b.materials]


def test_obj_loader_malformed_indices(tmp_path):
    """Out-of-range indices must not crash (or read out of bounds in the
    native path): a bad vertex index drops the corner, a bad texcoord /
    normal index falls back to the missing-attribute default — and both
    loader paths agree on the result."""
    import numpy as np

    from tinyrenderder_tpu.models import obj
    from tinyrenderder_tpu.utils import native

    content = """v 0 0 0
v 1 0 0
v 1 1 0
vt 0 0
vt 1 1
vn 0 0 1
f 1/999999/1 2/0/1 3/2/99
f 1/1/1 999 2/2/1 3/1/1
f -999 1 2
"""
    p = tmp_path / "bad.obj"
    p.write_text(content)
    a = obj.load_obj(str(p), load_textures=False, use_native=False)
    # face 1: all vi valid; ti 999999 and 0 out of range -> (0,0) uv;
    #         ni 99 out of range -> zero normal. face 2: corner "999"
    #         dropped, fan over remaining 3 corners. face 3: "-999"
    #         dropped, only 2 corners left -> no triangle.
    assert a.nfaces == 2
    assert np.array_equal(a.uvs[0], [0.0, 0.0])
    if native.obj_available():
        b = obj.load_obj(str(p), load_textures=False, use_native=True)
        assert np.array_equal(a.positions, b.positions)
        assert np.array_equal(a.faces, b.faces)
        assert np.array_equal(a.uvs, b.uvs)
        assert np.array_equal(a.normals, b.normals)


def test_native_rejects_malformed_numbers_like_python(tmp_path):
    """A malformed numeric token raises on BOTH loader paths — which
    parser a user gets (native .so built or not) must not change load
    semantics (regression: strtod silently parsed prefixes)."""
    from tinyrenderder_tpu.utils import native
    for bad in ("v 0.5 abc 1\nv 0 0 0\nv 1 0 0\nf 1 2 3\n",
                "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1x 2 3\n",
                "v 0 0 0\nvt 0.5 zz\nv 1 0 0\nv 0 1 0\nf 1/1 2/1 3/1\n"):
        p = tmp_path / "bad.obj"
        p.write_text(bad)
        with pytest.raises((ValueError, IndexError)):
            load_obj(str(p), load_textures=False, use_native=False)
        if native.obj_available():
            with pytest.raises(ValueError):
                load_obj(str(p), load_textures=False, use_native=True)
    # a well-formed file still loads identically on both paths
    p = tmp_path / "good.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    a = load_obj(str(p), load_textures=False, use_native=False)
    if native.obj_available():
        b = load_obj(str(p), load_textures=False, use_native=True)
        np.testing.assert_array_equal(a.faces, b.faces)
        np.testing.assert_allclose(a.positions, b.positions)


def test_mtllib_multiple_and_spaced_filenames(tmp_path):
    """mtllib accepts multiple library names per the spec, and a single
    filename containing spaces when that file exists (exporter reality);
    both loader paths share the rule."""
    from tinyrenderder_tpu.models import obj
    from tinyrenderder_tpu.utils import native
    (tmp_path / "a.mtl").write_text("newmtl matA\nmap_Kd a_diffuse.tga\n")
    (tmp_path / "b.mtl").write_text("newmtl matB\nmap_Kd b_diffuse.tga\n")
    (tmp_path / "my lib.mtl").write_text(
        "newmtl matC\nmap_Kd c_diffuse.tga\n")
    content = ("mtllib a.mtl b.mtl\n"
               "mtllib my lib.mtl\n"
               "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
               "usemtl matB\nf 1 2 3\n")
    p = tmp_path / "m.obj"
    p.write_text(content)
    for use_native in ([False, True] if native.obj_available()
                       else [False]):
        m = obj.load_obj(str(p), load_textures=False,
                         use_native=use_native)
        names = [mat.name for mat in m.materials]
        assert "matB" in names, use_native
        # materials from BOTH a.mtl and the spaced filename resolved
        # (maps dict populated => load_mtl parsed them); the mesh only
        # binds matB, so just assert the load path didn't lose faces
        assert m.nfaces == 1
