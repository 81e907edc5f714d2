"""COLLADA loader tests: triangles/polylist/polygons parsing,
multi-offset index dedup (the per-corner (vi,ni,ti) tuple case),
node-transform baking, up_axis conversion, OBJ-geometry parity,
material binding + texture chain, manager dispatch."""

import numpy as np
import pytest

from tinyrenderder_tpu.models.collada import load_collada
from tinyrenderder_tpu.models.obj import load_obj

POS = "0 0 0  1 0 0  1 1 0  0 1 0"
UV = "0 0  1 0  1 1  0 1"


def _doc(body, up="Y_UP"):
    return f"""<?xml version="1.0"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
  <asset><up_axis>{up}</up_axis></asset>
  {body}
</COLLADA>"""


def _geometry(prim, extra_sources=""):
    return f"""
  <library_geometries>
    <geometry id="quad" name="quad"><mesh>
      <source id="pos"><float_array id="pa" count="12">{POS}</float_array>
        <technique_common><accessor source="#pa" count="4" stride="3">
          <param name="X" type="float"/><param name="Y" type="float"/>
          <param name="Z" type="float"/></accessor></technique_common>
      </source>
      {extra_sources}
      <vertices id="vtx"><input semantic="POSITION" source="#pos"/></vertices>
      {prim}
    </mesh></geometry>
  </library_geometries>
  <library_visual_scenes>
    <visual_scene id="s"><node><instance_geometry url="#quad"/></node>
    </visual_scene>
  </library_visual_scenes>
  <scene><instance_visual_scene url="#s"/></scene>"""


UV_SOURCE = f"""
<source id="uvs"><float_array id="ua" count="8">{UV}</float_array>
  <technique_common><accessor source="#ua" count="4" stride="2">
    <param name="S" type="float"/><param name="T" type="float"/>
  </accessor></technique_common></source>"""


def _check_quad(m, with_uv=False):
    assert m.nverts == 4 and m.nfaces == 2
    np.testing.assert_allclose(
        m.positions, [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]])
    np.testing.assert_array_equal(m.faces, [[0, 1, 2], [0, 2, 3]])
    np.testing.assert_allclose(m.normals, [[0, 0, 1]] * 4, atol=1e-12)
    if with_uv:
        np.testing.assert_allclose(
            m.uvs, [[0, 1], [1, 1], [1, 0], [0, 0]])  # V flipped


def test_dae_triangles(tmp_path):
    prim = """<triangles count="2">
      <input semantic="VERTEX" source="#vtx" offset="0"/>
      <p>0 1 2 0 2 3</p></triangles>"""
    p = tmp_path / "q.dae"
    p.write_text(_doc(_geometry(prim)))
    _check_quad(load_collada(str(p), load_textures=False))


def test_dae_polylist_and_polygons(tmp_path):
    plist = """<polylist count="1">
      <input semantic="VERTEX" source="#vtx" offset="0"/>
      <vcount>4</vcount><p>0 1 2 3</p></polylist>"""
    pgons = """<polygons count="1">
      <input semantic="VERTEX" source="#vtx" offset="0"/>
      <p>0 1 2 3</p></polygons>"""
    for prim in (plist, pgons):
        p = tmp_path / "q.dae"
        p.write_text(_doc(_geometry(prim)))
        _check_quad(load_collada(str(p), load_textures=False))


def test_dae_multi_offset_dedup_and_uv(tmp_path):
    """Independent VERTEX/TEXCOORD offsets: 6 corner tuples, 4 unique ->
    dedup merges shared corners (JoinIdenticalVertices analogue)."""
    prim = """<triangles count="2">
      <input semantic="VERTEX" source="#vtx" offset="0"/>
      <input semantic="TEXCOORD" source="#uvs" offset="1" set="0"/>
      <p>0 0 1 1 2 2  0 0 2 2 3 3</p></triangles>"""
    p = tmp_path / "q.dae"
    p.write_text(_doc(_geometry(prim, UV_SOURCE)))
    m = load_collada(str(p), load_textures=False)
    _check_quad(m, with_uv=True)
    assert m.submeshes[0].has_texcoords


def test_dae_matches_obj_geometry(tmp_path):
    prim = """<triangles count="2">
      <input semantic="VERTEX" source="#vtx" offset="0"/>
      <input semantic="TEXCOORD" source="#uvs" offset="1" set="0"/>
      <p>0 0 1 1 2 2  0 0 2 2 3 3</p></triangles>"""
    pd = tmp_path / "q.dae"
    pd.write_text(_doc(_geometry(prim, UV_SOURCE)))
    po = tmp_path / "q.obj"
    po.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
                  "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
                  "f 1/1 2/2 3/3\nf 1/1 3/3 4/4\n")
    md = load_collada(str(pd), load_textures=False)
    mo = load_obj(str(po), load_textures=False)
    np.testing.assert_array_equal(md.positions, mo.positions)
    np.testing.assert_array_equal(md.faces, mo.faces)
    np.testing.assert_allclose(md.uvs, mo.uvs)


def test_dae_node_transforms(tmp_path):
    body = _geometry("""<triangles count="2">
      <input semantic="VERTEX" source="#vtx" offset="0"/>
      <p>0 1 2 0 2 3</p></triangles>""")
    body = body.replace(
        '<node><instance_geometry url="#quad"/></node>',
        """<node><translate>10 0 0</translate><scale>2 2 2</scale>
             <node><instance_geometry url="#quad"/></node></node>""")
    p = tmp_path / "t.dae"
    p.write_text(_doc(body))
    m = load_collada(str(p), load_textures=False)
    base = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                    np.float64)
    np.testing.assert_allclose(m.positions, base * 2 + [10, 0, 0])

    body2 = body.replace(
        "<translate>10 0 0</translate><scale>2 2 2</scale>",
        "<rotate>1 0 0 90</rotate>")
    p.write_text(_doc(body2))
    m2 = load_collada(str(p), load_textures=False)
    # the quad's generated +z normal rotated +90 deg about x -> -y
    np.testing.assert_allclose(m2.normals, [[0, -1, 0]] * 4, atol=1e-12)


def test_dae_z_up_conversion(tmp_path):
    prim = """<triangles count="2">
      <input semantic="VERTEX" source="#vtx" offset="0"/>
      <p>0 1 2 0 2 3</p></triangles>"""
    p = tmp_path / "z.dae"
    p.write_text(_doc(_geometry(prim), up="Z_UP"))
    m = load_collada(str(p), load_textures=False)
    # the xy-plane quad becomes xz-plane: old +y -> +z... Z_UP fix maps
    # (x, y, z) -> (x, z, -y)
    np.testing.assert_allclose(
        m.positions, [[0, 0, 0], [1, 0, 0], [1, 0, -1], [0, 0, -1]],
        atol=1e-12)


def test_dae_x_up_conversion(tmp_path):
    prim = """<triangles count="2">
      <input semantic="VERTEX" source="#vtx" offset="0"/>
      <p>0 1 2 0 2 3</p></triangles>"""
    p = tmp_path / "x.dae"
    p.write_text(_doc(_geometry(prim), up="X_UP"))
    m = load_collada(str(p), load_textures=False)
    # Assimp's X_UP fix maps (x, y, z) -> (-y, x, z): the file's +x axis
    # becomes world +y (NOT -y — regression for the inverted rotation)
    np.testing.assert_allclose(
        m.positions, [[0, 0, 0], [0, 1, 0], [-1, 1, 0], [-1, 0, 0]],
        atol=1e-12)


def test_dae_vertices_level_normal_input(tmp_path):
    """<vertices> may declare NORMAL beside POSITION; both share the
    VERTEX index (regression: these inputs were silently dropped)."""
    geometry = """<geometry id="g"><mesh>
    <source id="pos"><float_array id="pa" count="12">
      0 0 0 1 0 0 1 1 0 0 1 0</float_array>
      <technique_common><accessor source="#pa" count="4" stride="3">
        <param name="X" type="float"/><param name="Y" type="float"/>
        <param name="Z" type="float"/></accessor></technique_common>
    </source>
    <source id="nrm"><float_array id="na" count="12">
      0 0 -1 0 0 -1 0 0 -1 0 0 -1</float_array>
      <technique_common><accessor source="#na" count="4" stride="3">
        <param name="X" type="float"/><param name="Y" type="float"/>
        <param name="Z" type="float"/></accessor></technique_common>
    </source>
    <vertices id="vtx">
      <input semantic="POSITION" source="#pos"/>
      <input semantic="NORMAL" source="#nrm"/>
    </vertices>
    <triangles count="2">
      <input semantic="VERTEX" source="#vtx" offset="0"/>
      <p>0 1 2 0 2 3</p></triangles>
  </mesh></geometry>"""
    p = tmp_path / "vn.dae"
    p.write_text(_doc(geometry))
    m = load_collada(str(p), load_textures=False)
    assert m.submeshes[0].has_normals
    # authored -z normals survive (finalize would generate +z ones)
    np.testing.assert_allclose(m.normals, [[0, 0, -1]] * 4, atol=1e-12)


def test_dae_material_binding_and_texture(tmp_path):
    """instance_material binds the symbol to a material whose effect
    chain resolves an image file; per-submesh material indices."""
    from tinyrenderder_tpu.utils import tga
    tex = np.zeros((4, 4, 3), np.uint8)
    tex[..., 1] = 180                      # G is index 1 in BGR and RGB
    tga.write(tga.TGAImage(data=tex), str(tmp_path / "wall.tga"))

    prim = """<triangles count="2" material="SYM">
      <input semantic="VERTEX" source="#vtx" offset="0"/>
      <p>0 1 2 0 2 3</p></triangles>"""
    body = _geometry(prim)
    body = body.replace('<instance_geometry url="#quad"/>', """
      <instance_geometry url="#quad"><bind_material><technique_common>
        <instance_material symbol="SYM" target="#mat0"/>
      </technique_common></bind_material></instance_geometry>""")
    body += """
  <library_images><image id="img0"><init_from>wall.tga</init_from>
  </image></library_images>
  <library_effects><effect id="fx0"><profile_COMMON>
    <newparam sid="surf0"><surface type="2D"><init_from>img0</init_from>
      </surface></newparam>
    <newparam sid="samp0"><sampler2D><source>surf0</source></sampler2D>
      </newparam>
    <technique sid="common"><phong><diffuse>
      <texture texture="samp0" texcoord="uv0"/></diffuse></phong>
    </technique>
  </profile_COMMON></effect></library_effects>
  <library_materials><material id="mat0" name="wallmat">
    <instance_effect url="#fx0"/></material></library_materials>"""
    p = tmp_path / "m.dae"
    p.write_text(_doc(body))
    m = load_collada(str(p))
    assert len(m.materials) == 1
    assert m.materials[0].name == "wallmat"
    assert m.materials[0].has_diffuse
    np.testing.assert_array_equal(m.materials[0].diffuse[..., 1], 180)
    assert m.submeshes[0].material_index == 0


def test_dae_mixed_arity_polylist(tmp_path):
    """Ragged vcount (quad + triangle in one polylist) takes the
    per-polygon fallback and fans identically to the uniform path."""
    prim = """<polylist count="2">
      <input semantic="VERTEX" source="#vtx" offset="0"/>
      <vcount>4 3</vcount><p>0 1 2 3 0 2 3</p></polylist>"""
    p = tmp_path / "q.dae"
    p.write_text(_doc(_geometry(prim)))
    m = load_collada(str(p), load_textures=False)
    assert m.nfaces == 3          # quad fans to 2 + 1 triangle
    np.testing.assert_array_equal(
        m.faces, [[0, 1, 2], [0, 2, 3], [0, 2, 3]])


def test_dae_ignored_input_still_widens_tuple(tmp_path):
    """A second TEXCOORD set (ignored) at its own offset must still
    count toward the <p> tuple stride."""
    prim = """<triangles count="2">
      <input semantic="VERTEX" source="#vtx" offset="0"/>
      <input semantic="TEXCOORD" source="#uvs" offset="1" set="0"/>
      <input semantic="TEXCOORD" source="#uvs" offset="2" set="1"/>
      <p>0 0 3 1 1 3 2 2 3  0 0 3 2 2 3 3 3 3</p></triangles>"""
    p = tmp_path / "q.dae"
    p.write_text(_doc(_geometry(prim, UV_SOURCE)))
    m = load_collada(str(p), load_textures=False)
    _check_quad(m, with_uv=True)


def test_dae_bad_inputs(tmp_path):
    p = tmp_path / "bad.dae"
    p.write_text("<notcollada/>")
    with pytest.raises(ValueError, match="not a COLLADA"):
        load_collada(str(p), load_textures=False)
    # out-of-range index
    prim = """<triangles count="2">
      <input semantic="VERTEX" source="#vtx" offset="0"/>
      <p>0 1 9 0 2 3</p></triangles>"""
    p.write_text(_doc(_geometry(prim)))
    with pytest.raises(ValueError, match="out of range"):
        load_collada(str(p), load_textures=False)
    # vcount/p mismatch
    prim = """<polylist count="1">
      <input semantic="VERTEX" source="#vtx" offset="0"/>
      <vcount>4</vcount><p>0 1 2</p></polylist>"""
    p.write_text(_doc(_geometry(prim)))
    with pytest.raises(ValueError, match="mismatch"):
        load_collada(str(p), load_textures=False)


def test_dae_manager_dispatch(tmp_path):
    from tinyrenderder_tpu.models.manager import load_mesh
    prim = """<triangles count="2">
      <input semantic="VERTEX" source="#vtx" offset="0"/>
      <p>0 1 2 0 2 3</p></triangles>"""
    p = tmp_path / "q.dae"
    p.write_text(_doc(_geometry(prim)))
    m = load_mesh(str(p), load_textures=False)
    assert m.nfaces == 2 and m.nverts == 4
