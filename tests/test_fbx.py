"""FBX loader tests: binary 7400 (32-bit records) == binary 7500
(64-bit) == zlib-compressed arrays == ascii dialect, quad fan
triangulation, per-corner layer dedup (every mapping mode), UV flip,
node-transform baking (T/R/S + PreRotation, rotation orders),
per-polygon material submesh split, OBJ geometry parity, manager
dispatch + end-to-end render, truncation contract."""

import struct
import zlib

import numpy as np
import pytest

from tinyrenderder_tpu.models.fbx import load_fbx
from tinyrenderder_tpu.models.obj import load_obj

# the shared quad: 4 vertices, 1 quad polygon -> 2 fan triangles
POS = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float64)
UV = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float64)
PVI = np.array([0, 1, 2, -4], np.int32)           # quad, last corner = ~3


# ----------------------------------------------------- binary FBX writer

def _prop_bytes(v, compress=False):
    if isinstance(v, bool):
        return b"C" + struct.pack("<b", v)
    if isinstance(v, int):
        return b"L" + struct.pack("<q", v)
    if isinstance(v, float):
        return b"D" + struct.pack("<d", v)
    if isinstance(v, str):
        if "::" in v:                  # ascii "Class::Name" -> binary form
            cls, nm = v.split("::", 1)
            raw = nm.encode() + b"\x00\x01" + cls.encode()
        else:
            raw = v.encode()
        return b"S" + struct.pack("<I", len(raw)) + raw
    if isinstance(v, (bytes, bytearray)):
        return b"R" + struct.pack("<I", len(v)) + bytes(v)
    arr = np.asarray(v)
    code = {"f4": b"f", "f8": b"d", "i4": b"i", "i8": b"l"}[
        arr.dtype.str[1:]]
    raw = arr.tobytes()
    if compress:
        comp = zlib.compress(raw)
        return (code + struct.pack("<III", arr.size, 1, len(comp)) + comp)
    return code + struct.pack("<III", arr.size, 0, len(raw)) + raw


class N:
    """Test-side node: name, props, children."""

    def __init__(self, name, *props, children=(), compress=False):
        self.name, self.props = name, list(props)
        self.children = list(children)
        self.compress = compress

    def emit(self, offset, big):
        plist = b"".join(_prop_bytes(p, self.compress) for p in self.props)
        name = self.name.encode()
        hdr_fmt, sentinel = ("<QQQ", 25) if big else ("<III", 13)
        hdr_len = struct.calcsize(hdr_fmt) + 1 + len(name)
        body = plist
        if self.children:
            kids = b""
            pos = offset + hdr_len + len(plist)
            for c in self.children:
                kb = c.emit(pos, big)
                kids += kb
                pos += len(kb)
            body += kids + b"\x00" * sentinel
        end = offset + hdr_len + len(body)
        return (struct.pack(hdr_fmt, end, len(self.props), len(plist))
                + bytes([len(name)]) + name + body)


def _write_fbx(path, nodes, version=7400):
    big = version >= 7500
    out = b"Kaydara FBX Binary  \x00\x1a\x00" + struct.pack("<I", version)
    for n in nodes:
        out += n.emit(len(out), big)
    out += b"\x00" * (25 if big else 13)          # top-level terminator
    out += b"\xfa" * 16                           # footer stand-in
    with open(path, "wb") as f:
        f.write(out)
    return out


# -------------------------------------------------------------- fixtures

def _quad_geometry(gid=100, compress=False, uv_mapping="IndexToDirect",
                   normals=None):
    kids = [
        N("Vertices", POS.reshape(-1), compress=compress),
        N("PolygonVertexIndex", PVI.astype(np.int32), compress=compress),
        N("LayerElementUV", 0, children=[
            N("MappingInformationType", "ByPolygonVertex"),
            N("ReferenceInformationType", uv_mapping),
            N("UV", UV.reshape(-1), compress=compress),
            N("UVIndex", np.array([0, 1, 2, 3], np.int32)),
        ]),
    ]
    if normals is not None:
        kids.append(normals)
    return N("Geometry", gid, "Geometry::quad", "Mesh", children=kids)


def _model(mid=200, name="Model::quad", props=()):
    return N("Model", mid, name, "Mesh", children=[
        N("Properties70", children=[N("P", *p) for p in props])])


def _connections(pairs, op=()):
    kids = [N("C", "OO", s, d) for s, d in pairs]
    kids += [N("C", "OP", s, d, p) for s, d, p in op]
    return N("Connections", children=kids)


def _quad_doc(version=7400, compress=False, model_props=()):
    return [
        N("Objects", children=[
            _quad_geometry(compress=compress),
            _model(props=model_props),
        ]),
        _connections([(100, 200), (200, 0)]),
    ], version


def _check_quad(m):
    assert m.nverts == 4 and m.nfaces == 2
    np.testing.assert_allclose(m.positions, POS)
    np.testing.assert_array_equal(m.faces, [[0, 1, 2], [0, 2, 3]])
    np.testing.assert_allclose(m.uvs[:, 1], 1.0 - UV[:, 1])   # FlipUVs
    np.testing.assert_allclose(m.normals, [[0, 0, 1]] * 4, atol=1e-12)


# ------------------------------------------------------------------ tests

def test_binary_7400_quad(tmp_path):
    nodes, v = _quad_doc()
    p = tmp_path / "q.fbx"
    _write_fbx(p, nodes, v)
    _check_quad(load_fbx(str(p), load_textures=False))


def test_binary_7500_and_compressed_match(tmp_path):
    p32 = tmp_path / "a.fbx"
    p64 = tmp_path / "b.fbx"
    pz = tmp_path / "c.fbx"
    _write_fbx(p32, *_quad_doc(7400))
    _write_fbx(p64, *_quad_doc(7500))
    nodes, _ = _quad_doc(7400, compress=True)
    _write_fbx(pz, nodes, 7400)
    a = load_fbx(str(p32), load_textures=False)
    b = load_fbx(str(p64), load_textures=False)
    c = load_fbx(str(pz), load_textures=False)
    for m in (b, c):
        np.testing.assert_array_equal(a.faces, m.faces)
        np.testing.assert_allclose(a.positions, m.positions)
        np.testing.assert_allclose(a.uvs, m.uvs)
    _check_quad(a)


ASCII_QUAD = """; FBX 7.4.0 project file
FBXHeaderExtension:  {
    FBXVersion: 7400
}
Objects:  {
    Geometry: 100, "Geometry::quad", "Mesh" {
        Vertices: *12 {
            a: 0,0,0,1,0,0,1,1,0,0,1,0
        }
        PolygonVertexIndex: *4 {
            a: 0,1,2,-4
        }
        LayerElementUV: 0 {
            MappingInformationType: "ByPolygonVertex"
            ReferenceInformationType: "IndexToDirect"
            UV: *8 {
                a: 0,0,1,0,1,1,0,1
            }
            UVIndex: *4 {
                a: 0,1,2,3
            }
        }
    }
    Model: 200, "Model::quad", "Mesh" {
        Properties70:  {
            P: "Lcl Translation", "Lcl Translation", "", "A",0,0,0
        }
    }
}
Connections:  {
    C: "OO",100,200
    C: "OO",200,0
}
"""


def test_ascii_quad_matches_binary(tmp_path):
    pa = tmp_path / "a.fbx"
    pa.write_text(ASCII_QUAD)
    pb = tmp_path / "b.fbx"
    _write_fbx(pb, *_quad_doc())
    a = load_fbx(str(pa), load_textures=False)
    b = load_fbx(str(pb), load_textures=False)
    _check_quad(a)
    np.testing.assert_array_equal(a.faces, b.faces)
    np.testing.assert_allclose(a.positions, b.positions)
    np.testing.assert_allclose(a.uvs, b.uvs)


def test_matches_obj_geometry(tmp_path):
    po = tmp_path / "q.obj"
    po.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "f 1/1 2/2 3/3 4/4\n")
    pf = tmp_path / "q.fbx"
    _write_fbx(pf, *_quad_doc())
    o = load_obj(str(po), load_textures=False)
    f = load_fbx(str(pf), load_textures=False)
    np.testing.assert_array_equal(o.faces, f.faces)
    np.testing.assert_allclose(o.positions, f.positions)
    np.testing.assert_allclose(o.uvs, f.uvs)
    np.testing.assert_allclose(o.normals, f.normals)


def test_transform_baking(tmp_path):
    props = [
        ("Lcl Translation", "Lcl Translation", "", "A", 10.0, 0.0, 0.0),
        ("Lcl Rotation", "Lcl Rotation", "", "A", 0.0, 0.0, 90.0),
        ("Lcl Scaling", "Lcl Scaling", "", "A", 2.0, 2.0, 2.0),
    ]
    p = tmp_path / "t.fbx"
    _write_fbx(p, *_quad_doc(model_props=props))
    m = load_fbx(str(p), load_textures=False)
    # v' = T + Rz(90) @ (2 v): (1,0,0) -> (10,2,0); (0,1,0) -> (8,0,0)
    expect = POS * 2.0
    expect = expect @ np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]]).T
    expect += [10.0, 0.0, 0.0]
    np.testing.assert_allclose(m.positions, expect, atol=1e-12)


def test_prerotation_and_parent_chain(tmp_path):
    # parent translates +z by 5; child PreRotation(90 around X) applied
    # before Lcl Rotation(-90 around X) -> net identity rotation
    child_props = [
        ("PreRotation", "Vector3D", "", "A", 90.0, 0.0, 0.0),
        ("Lcl Rotation", "Lcl Rotation", "", "A", -90.0, 0.0, 0.0),
    ]
    parent_props = [
        ("Lcl Translation", "Lcl Translation", "", "A", 0.0, 0.0, 5.0)]
    nodes = [
        N("Objects", children=[
            _quad_geometry(),
            _model(mid=200, name="Model::child", props=child_props),
            _model(mid=300, name="Model::parent", props=parent_props),
        ]),
        _connections([(100, 200), (200, 300), (300, 0)]),
    ]
    p = tmp_path / "pc.fbx"
    _write_fbx(p, nodes)
    m = load_fbx(str(p), load_textures=False)
    np.testing.assert_allclose(m.positions, POS + [0, 0, 5], atol=1e-12)


def test_rotation_order_zyx(tmp_path):
    # RotationOrder 5 = ZYX applies Z first: M = Rx @ Ry @ Rz
    props = [
        ("Lcl Rotation", "Lcl Rotation", "", "A", 90.0, 90.0, 0.0),
        ("RotationOrder", "enum", "", "A", 5),
    ]
    p = tmp_path / "r.fbx"
    _write_fbx(p, *_quad_doc(model_props=props))
    m = load_fbx(str(p), load_textures=False)
    rx = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], float)
    ry = np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0]], float)
    np.testing.assert_allclose(m.positions, POS @ (rx @ ry).T, atol=1e-12)


def test_bad_deflate_raises(tmp_path):
    nodes, v = _quad_doc(compress=True)
    raw = _write_fbx(tmp_path / "ok.fbx", nodes, v)
    # corrupt the zlib payload of the Vertices array (search for the
    # compressed-encoding marker: 'd' code, enc=1)
    i = raw.index(b"Vertices")
    j = raw.index(b"d", i) + 13         # code + n/enc/clen
    bad = raw[:j + 4] + bytes([raw[j + 4] ^ 0xFF]) + raw[j + 5:]
    p = tmp_path / "bad.fbx"
    p.write_bytes(bad)
    with pytest.raises(ValueError):
        load_fbx(str(p), load_textures=False)


def test_normals_by_vertex_direct(tmp_path):
    nrm = N("LayerElementNormal", 0, children=[
        N("MappingInformationType", "ByVertice"),
        N("ReferenceInformationType", "Direct"),
        N("Normals", np.tile([0.0, 0.0, 1.0], 4)),
    ])
    nodes = [
        N("Objects", children=[
            _quad_geometry(normals=nrm), _model()]),
        _connections([(100, 200), (200, 0)]),
    ]
    p = tmp_path / "n.fbx"
    _write_fbx(p, nodes)
    m = load_fbx(str(p), load_textures=False)
    assert m.submeshes[0].has_normals
    np.testing.assert_allclose(m.normals, [[0, 0, 1]] * 4)
    assert m.nverts == 4                    # dedup keeps single-index verts


def test_per_polygon_material_split(tmp_path):
    # two triangles as separate polygons, materials 1 then 0
    geo = N("Geometry", 100, "Geometry::two", "Mesh", children=[
        N("Vertices", POS.reshape(-1)),
        N("PolygonVertexIndex",
          np.array([0, 1, -3, 0, 2, -4], np.int32)),
        N("LayerElementMaterial", 0, children=[
            N("MappingInformationType", "ByPolygon"),
            N("ReferenceInformationType", "IndexToDirect"),
            N("Materials", np.array([1, 0], np.int32)),
        ]),
    ])
    nodes = [
        N("Objects", children=[
            geo, _model(),
            N("Material", 400, "Material::red", ""),
            N("Material", 401, "Material::blue", ""),
        ]),
        _connections([(100, 200), (200, 0), (400, 200), (401, 200)]),
    ]
    p = tmp_path / "m.fbx"
    _write_fbx(p, nodes)
    m = load_fbx(str(p), load_textures=False)
    assert m.nfaces == 2 and len(m.submeshes) == 2
    assert len(m.materials) == 2
    names = {m.materials[sm.material_index].name for sm in m.submeshes}
    assert names == {"red", "blue"}
    # faces regroup by material but all triangles survive
    assert sorted(map(tuple, m.faces.tolist())) == sorted(
        [(0, 1, 2), (0, 2, 3)])


def test_degenerate_polygon_keeps_bypolygon_sync(tmp_path):
    # polygon 0 is a 2-corner line (dropped), polygons 1+2 are triangles;
    # ByPolygon Materials ids index the ORIGINAL polygon list (regression:
    # the keep-filter used to shift every later polygon's material)
    geo = N("Geometry", 100, "Geometry::mix", "Mesh", children=[
        N("Vertices", POS.reshape(-1)),
        N("PolygonVertexIndex",
          np.array([0, -2, 0, 1, -3, 0, 2, -4], np.int32)),
        N("LayerElementMaterial", 0, children=[
            N("MappingInformationType", "ByPolygon"),
            N("ReferenceInformationType", "IndexToDirect"),
            N("Materials", np.array([9, 0, 1], np.int32)),
        ]),
    ])
    nodes = [
        N("Objects", children=[
            geo, _model(),
            N("Material", 400, "Material::red", ""),
            N("Material", 401, "Material::blue", ""),
        ]),
        _connections([(100, 200), (200, 0), (400, 200), (401, 200)]),
    ]
    p = tmp_path / "d.fbx"
    _write_fbx(p, nodes)
    m = load_fbx(str(p), load_textures=False)
    assert m.nfaces == 2
    by_name = {m.materials[sm.material_index].name:
               m.faces[sm.start_index // 3] for sm in m.submeshes}
    np.testing.assert_array_equal(by_name["red"], [0, 1, 2])    # poly 1
    np.testing.assert_array_equal(by_name["blue"], [0, 2, 3])   # poly 2


def test_negative_material_slot_falls_back_to_first(tmp_path):
    # exporters write -1 for unassigned faces; it must NOT python-index
    # the LAST connected material
    geo = N("Geometry", 100, "Geometry::neg", "Mesh", children=[
        N("Vertices", POS.reshape(-1)),
        N("PolygonVertexIndex",
          np.array([0, 1, -3, 0, 2, -4], np.int32)),
        N("LayerElementMaterial", 0, children=[
            N("MappingInformationType", "ByPolygon"),
            N("ReferenceInformationType", "IndexToDirect"),
            N("Materials", np.array([-1, 1], np.int32)),
        ]),
    ])
    nodes = [
        N("Objects", children=[
            geo, _model(),
            N("Material", 400, "Material::first", ""),
            N("Material", 401, "Material::second", ""),
        ]),
        _connections([(100, 200), (200, 0), (400, 200), (401, 200)]),
    ]
    p = tmp_path / "neg.fbx"
    _write_fbx(p, nodes)
    m = load_fbx(str(p), load_textures=False)
    names = [m.materials[sm.material_index].name for sm in m.submeshes]
    assert "first" in names and "second" in names
    assert all(n != "" for n in names)


def test_manager_dispatch_and_render(tmp_path):
    from tinyrenderder_tpu.models.manager import load_mesh
    p = tmp_path / "q.fbx"
    _write_fbx(p, *_quad_doc())
    m = load_mesh(str(p), load_textures=False)
    assert m.nfaces == 2

    from tinyrenderder_tpu.camera import Camera
    from tinyrenderder_tpu.scene import Scene
    from tinyrenderder_tpu.shaders import FlatShader
    cam = Camera()
    cam.auto_setup_for_scene(m.get_local_aabb(), aspect=1.0)
    scene = Scene(camera=cam, width=64, height=64)
    scene.add(m, np.eye(4), FlatShader(), name="quad")
    out = scene.render(backend="xla")
    assert out.color.shape == (64, 64, 3)
    assert (np.asarray(out.color).sum(axis=-1) > 0).any()


def test_truncated_raises(tmp_path):
    full = _write_fbx(tmp_path / "f.fbx", *_quad_doc())
    p = tmp_path / "t.fbx"
    for cut in (10, 40, len(full) // 2):
        p.write_bytes(full[:cut])
        with pytest.raises((ValueError, struct.error)):
            load_fbx(str(p), load_textures=False)
    p.write_bytes(b"not an fbx \xff\xfe")
    with pytest.raises(ValueError):
        load_fbx(str(p), load_textures=False)
