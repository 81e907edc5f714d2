"""Loader robustness fuzz: random truncations and byte corruptions of
valid OBJ/PLY/STL/glTF/COLLADA/FBX/OFF files must raise a clean exception (ValueError /
OSError / KeyError / UnicodeError family) or return a mesh — never hang,
crash the interpreter, or leak numpy broadcasting errors from
unvalidated shapes.

The reference gets this resilience from Assimp's validation layer
(aiProcess_ValidateDataStructure, model.cpp:99); here each parser
carries its own bounds checks, pinned by this suite.
"""

import json
import struct

import numpy as np
import pytest

from tinyrenderder_tpu.models.collada import load_collada
from tinyrenderder_tpu.models.fbx import load_fbx
from tinyrenderder_tpu.models.gltf import load_gltf
from tinyrenderder_tpu.models.off import load_off
from tinyrenderder_tpu.models.obj import load_obj
from tinyrenderder_tpu.models.ply import load_ply
from tinyrenderder_tpu.models.stl import load_stl

# exceptions a parser may legitimately raise on malformed input
# (ET.ParseError subclasses SyntaxError, not ValueError)
from xml.etree.ElementTree import ParseError as _XMLParseError  # noqa: E402

OK_ERRORS = (ValueError, OSError, KeyError, IndexError, TypeError,
             UnicodeDecodeError, json.JSONDecodeError, struct.error,
             EOFError, _XMLParseError)


def _quad_stl():
    tris = np.array([[[0, 0, 0], [1, 0, 0], [1, 1, 0]],
                     [[0, 0, 0], [1, 1, 0], [0, 1, 0]]], np.float64)
    out = b"\x00" * 80 + struct.pack("<I", len(tris))
    for t in tris:
        out += struct.pack("<3f", 0, 0, 1)
        for v in t:
            out += struct.pack("<3f", *v)
        out += struct.pack("<H", 0)
    return out


def _quad_ply():
    header = (b"ply\nformat binary_little_endian 1.0\n"
              b"element vertex 4\n"
              b"property float x\nproperty float y\nproperty float z\n"
              b"element face 2\n"
              b"property list uchar int vertex_indices\n"
              b"end_header\n")
    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                     "<f4").tobytes()
    faces = (struct.pack("<B3i", 3, 0, 1, 2)
             + struct.pack("<B3i", 3, 0, 2, 3))
    return header + verts + faces


def _quad_obj():
    return (b"v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
            b"f 1 2 3\nf 1 3 4\n")


def _quad_glb():
    pos = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                   "<f4")
    idx = np.array([0, 1, 2, 0, 2, 3], "<u2")
    bind = pos.tobytes() + idx.tobytes()
    j = {
        "asset": {"version": "2.0"},
        "buffers": [{"byteLength": len(bind)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": pos.nbytes},
            {"buffer": 0, "byteOffset": pos.nbytes,
             "byteLength": idx.nbytes},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
        ],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0},
                                    "indices": 1}]}],
        "nodes": [{"mesh": 0}],
        "scenes": [{"nodes": [0]}],
    }
    jb = json.dumps(j).encode()
    jb += b" " * (-len(jb) % 4)
    bb = bind + b"\x00" * (-len(bind) % 4)
    body = (struct.pack("<II", len(jb), 0x4E4F534A) + jb
            + struct.pack("<II", len(bb), 0x004E4942) + bb)
    return struct.pack("<III", 0x46546C67, 2, 12 + len(body)) + body


def _quad_dae():
    return b"""<?xml version="1.0"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
  <asset><up_axis>Y_UP</up_axis></asset>
  <library_geometries><geometry id="q"><mesh>
    <source id="pos"><float_array id="pa" count="12">
      0 0 0 1 0 0 1 1 0 0 1 0</float_array>
      <technique_common><accessor source="#pa" count="4" stride="3">
        <param name="X" type="float"/><param name="Y" type="float"/>
        <param name="Z" type="float"/></accessor></technique_common>
    </source>
    <vertices id="v"><input semantic="POSITION" source="#pos"/></vertices>
    <triangles count="2"><input semantic="VERTEX" source="#v" offset="0"/>
      <p>0 1 2 0 2 3</p></triangles>
  </mesh></geometry></library_geometries>
  <library_visual_scenes><visual_scene id="s">
    <node><instance_geometry url="#q"/></node>
  </visual_scene></library_visual_scenes>
  <scene><instance_visual_scene url="#s"/></scene>
</COLLADA>"""


def _quad_fbx():
    # reuse the binary writer from the FBX tests (zlib-compressed arrays
    # so the fuzz also hits the deflate path)
    from test_fbx import _quad_doc
    nodes, version = _quad_doc(compress=True)
    out = b"Kaydara FBX Binary  \x00\x1a\x00" + struct.pack("<I", version)
    for n in nodes:
        out += n.emit(len(out), version >= 7500)
    return out + b"\x00" * 13 + b"\xfa" * 16


def _quad_off():
    return (b"OFF\n4 1 0\n0 0 0\n1 0 0\n1 1 0\n0 1 0\n4 0 1 2 3\n")


LOADERS = {
    "stl": (_quad_stl, load_stl),
    "ply": (_quad_ply, load_ply),
    "obj": (_quad_obj, load_obj),
    "glb": (_quad_glb, load_gltf),
    "dae": (_quad_dae, load_collada),
    "fbx": (_quad_fbx, load_fbx),
    "off": (_quad_off, load_off),
}


@pytest.mark.parametrize("fmt", sorted(LOADERS))
def test_truncation_fuzz(fmt, tmp_path):
    make, loader = LOADERS[fmt]
    data = make()
    p = tmp_path / f"t.{fmt}"
    # every truncation point on a small grid + the last 20 byte-by-byte
    points = sorted(set(range(0, len(data), max(1, len(data) // 64)))
                    | set(range(max(0, len(data) - 20), len(data))))
    for n in points:
        p.write_bytes(data[:n])
        try:
            m = loader(str(p), load_textures=False)
        except OK_ERRORS:
            continue
        assert m.positions.shape[1] == 3        # clean partial parse


@pytest.mark.parametrize("fmt", sorted(LOADERS))
def test_corruption_fuzz(fmt, tmp_path):
    make, loader = LOADERS[fmt]
    data = make()
    p = tmp_path / f"c.{fmt}"
    rng = np.random.default_rng(0xC0FFEE + len(data))
    for trial in range(60):
        buf = bytearray(data)
        for _ in range(int(rng.integers(1, 4))):
            # substitutions AND offset-shifting insert/delete mutations:
            # the harsher class for binary containers (length fields,
            # record framing) — a 2000-trial/format sweep of this
            # mutator passed clean at HEAD (session 5)
            op = int(rng.integers(0, 3))
            pos = int(rng.integers(0, max(len(buf), 1)))
            if op == 0 and buf:
                buf[min(pos, len(buf) - 1)] = int(rng.integers(0, 256))
            elif op == 1:
                buf[pos:pos] = bytes([int(rng.integers(0, 256))])
            elif buf:
                del buf[min(pos, len(buf) - 1)]
        p.write_bytes(bytes(buf))
        try:
            m = loader(str(p), load_textures=False)
        except OK_ERRORS:
            continue
        # a mesh that parsed must be structurally sane
        assert m.positions.ndim == 2 and m.positions.shape[1] == 3
        assert m.faces.ndim == 2 and m.faces.shape[1] == 3
        if m.faces.size:
            assert m.faces.min() >= 0 and m.faces.max() < m.nverts


def test_empty_and_garbage_files(tmp_path):
    for fmt, (_, loader) in LOADERS.items():
        p = tmp_path / f"e.{fmt}"
        p.write_bytes(b"")
        # permissive text formats (obj) may parse empty -> empty mesh;
        # binary containers must raise
        try:
            m = loader(str(p), load_textures=False)
            assert m.nverts == 0 and m.nfaces == 0
        except OK_ERRORS:
            pass
        p.write_bytes(b"\xde\xad\xbe\xef" * 16)
        try:
            loader(str(p), load_textures=False)
        except OK_ERRORS:
            pass
