"""COLLADA (.dae) loader — fifth mesh format (OBJ/PLY/STL/glTF/DAE).

The last Assimp-pipeline behavior class the other formats don't
exercise (reference ``ReadFile`` with a fixed postprocess chain,
model.cpp:91-99): COLLADA's ``<p>`` streams carry *independent index
tuples per corner* (VERTEX/NORMAL/TEXCOORD each with its own offset
into the tuple), so loading requires the (vi, ni, ti)->vertex dedup the
reference gets from ``aiProcess_JoinIdenticalVertices`` — done here
vectorized over the whole primitive block (np.unique on index rows),
the same contract as the OBJ loader's per-corner key dedup.

Also covered: ``<polylist>``/``<polygons>`` fan triangulation
(aiProcess_Triangulate), node-hierarchy transform baking
(``<matrix>`` row-major, ``<translate>``, ``<rotate>`` axis-angle
degrees, ``<scale>``; world matrix applied to positions, inverse-
transpose to normals = PreTransformVertices), the ``up_axis`` asset
conversion (Z_UP/X_UP -> the Y_UP the renderer assumes, like Assimp's
ColladaLoader), V flip (aiProcess_FlipUVs, model.cpp:93), and the
material->effect->sampler->surface->image texture chain with the
reference's filename-probe fallback (model.cpp:207-267).

Feeds the same ``Mesh`` SoA + ``finalize()`` postprocess as every
other loader.  Scope: core geometry + common-profile materials;
controllers/animations/physics are ignored (static-geometry parity).
"""

from __future__ import annotations

import logging
import os
import urllib.parse
import xml.etree.ElementTree as ET

import numpy as np

from tinyrenderder_tpu.models.mesh import (Material, Mesh, SubMesh,
                                           dedup_rows_stable)
from tinyrenderder_tpu.models.obj import load_material_textures

log = logging.getLogger("tinyrenderder_tpu.collada")

__all__ = ["load_collada"]


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _localize(root):
    """Strip XML namespaces in place so .find works on local names."""
    for el in root.iter():
        el.tag = _strip_ns(el.tag)
    return root


def _floats(text: str | None) -> np.ndarray:
    s = (text or "").split()
    return np.array(s, np.float64) if s else np.zeros(0, np.float64)


def _ints(text: str | None) -> np.ndarray:
    s = (text or "").split()
    return np.array(s, np.int64) if s else np.zeros(0, np.int64)


class _Sources:
    """id -> resolved (N, stride) float arrays for one <mesh>."""

    def __init__(self, mesh_el):
        self.arrays: dict[str, np.ndarray] = {}
        self.sources: dict[str, np.ndarray] = {}
        self.vertices: dict[str, list[tuple[str, str]]] = {}
        for src in mesh_el.findall("source"):
            sid = src.get("id")
            fa = src.find("float_array")
            if sid is None or fa is None:
                continue
            data = _floats(fa.text)
            acc = src.find("technique_common/accessor")
            stride = int(acc.get("stride", 1)) if acc is not None else 1
            count = (int(acc.get("count"))
                     if acc is not None and acc.get("count") else
                     data.size // max(stride, 1))
            need = count * stride
            if data.size < need:
                raise ValueError(f"COLLADA source '{sid}' truncated: "
                                 f"{data.size} floats, need {need}")
            self.sources[sid] = data[:need].reshape(count, stride)
        for v in mesh_el.findall("vertices"):
            vid = v.get("id")
            if vid is None:
                continue
            self.vertices[vid] = [(i.get("semantic", ""),
                                   (i.get("source") or "").lstrip("#"))
                                  for i in v.findall("input")]

    def resolve(self, ref: str, semantic: str) -> np.ndarray | None:
        ref = ref.lstrip("#")
        if ref in self.vertices:              # <vertices> indirection
            for sem, src in self.vertices[ref]:
                if sem == semantic or (semantic == "VERTEX"
                                       and sem == "POSITION"):
                    return self.sources.get(src)
            return None
        return self.sources.get(ref)


def _primitive_inputs(prim, sources: _Sources):
    """[(semantic, offset, array)] with max tuple width."""
    inputs = []
    width = 1
    for i in prim.findall("input"):
        sem = i.get("semantic", "")
        off = int(i.get("offset", 0))
        # every input widens the index tuple, even ones we ignore
        # (e.g. a second TEXCOORD set or COLOR) — <p> strides over all
        width = max(width, off + 1)
        if sem == "TEXCOORD" and int(i.get("set", 0)) != 0:
            continue                          # first UV set only
        ref = (i.get("source") or "").lstrip("#")
        if sem == "VERTEX" and ref in sources.vertices:
            # the COLLADA 1.4 spec lets <vertices> declare NORMAL /
            # TEXCOORD inputs beside POSITION; they all share the
            # VERTEX index (= this primitive offset)
            seen = {s for s, _, _ in inputs}
            for vsem, vsrc in sources.vertices[ref]:
                arr = sources.sources.get(vsrc)
                out_sem = "VERTEX" if vsem == "POSITION" else vsem
                if arr is not None and out_sem not in seen:
                    inputs.append((out_sem, off, arr))
            continue
        arr = sources.resolve(i.get("source") or "", sem)
        if arr is not None:
            inputs.append((sem, off, arr))
    return inputs, width


def _triangulate_rows(vcounts: np.ndarray) -> np.ndarray:
    """Corner indices (into the flat corner stream) of fan triangles."""
    if vcounts.size and (vcounts == vcounts[0]).all():
        # uniform arity (all-triangle / all-quad files): one vectorized
        # fan — a Python loop here costs ~1 s at Sponza scale
        n = int(vcounts[0])
        if n < 3:
            return np.zeros((0, 3), np.int64)
        m = vcounts.size
        starts = np.arange(m, dtype=np.int64)[:, None] * n     # (m, 1)
        k = np.arange(1, n - 1, dtype=np.int64)[None, :]       # (1, n-2)
        c0 = np.broadcast_to(starts, (m, n - 2))
        return np.stack([c0, starts + k, starts + k + 1],
                        axis=-1).reshape(-1, 3)
    tris = []
    base = 0
    for n in vcounts:
        n = int(n)
        for k in range(1, n - 1):
            tris.append((base, base + k, base + k + 1))
        base += n
    return np.asarray(tris, np.int64).reshape(-1, 3)


def _geometry_triangles(geom_el, sources: _Sources):
    """Yields (material_symbol, corner_tuples (C, width), tri_corners
    (F, 3) indices into C, inputs) per primitive block."""
    mesh_el = geom_el.find("mesh")
    if mesh_el is None:
        return
    for prim in mesh_el:
        tag = _strip_ns(prim.tag)
        if tag not in ("triangles", "polylist", "polygons"):
            continue
        inputs, width = _primitive_inputs(prim, sources)
        if not any(sem == "VERTEX" for sem, _, _ in inputs):
            continue
        if tag == "polygons":
            plist = [_ints(p.text) for p in prim.findall("p")]
            vcounts = np.array([p.size // width for p in plist], np.int64)
            idx = (np.concatenate(plist) if plist
                   else np.zeros(0, np.int64))
        else:
            idx = _ints(prim.find("p").text
                        if prim.find("p") is not None else None)
            if tag == "polylist":
                vcounts = _ints(prim.find("vcount").text
                                if prim.find("vcount") is not None
                                else None)
            else:
                vcounts = np.full(idx.size // (3 * width), 3, np.int64)
        if idx.size % width:
            raise ValueError("COLLADA <p> length not a multiple of the "
                             "input tuple width")
        corners = idx.reshape(-1, width)
        if corners.shape[0] != int(vcounts.sum()):
            raise ValueError("COLLADA vcount/<p> mismatch")
        tri_corners = _triangulate_rows(vcounts)
        yield prim.get("material", ""), corners, tri_corners, inputs


def _node_local_matrix(node) -> np.ndarray:
    m = np.eye(4)
    for el in node:
        tag = _strip_ns(el.tag)
        if tag == "matrix":
            m = m @ _floats(el.text).reshape(4, 4)     # row-major per spec
        elif tag == "translate":
            t = np.eye(4)
            t[:3, 3] = _floats(el.text)[:3]
            m = m @ t
        elif tag == "rotate":
            x, y, z, deg = _floats(el.text)[:4]
            axis = np.array([x, y, z])
            n = np.linalg.norm(axis)
            if n > 0:
                axis /= n
                a = np.deg2rad(deg)
                c, s = np.cos(a), np.sin(a)
                K = np.array([[0, -axis[2], axis[1]],
                              [axis[2], 0, -axis[0]],
                              [-axis[1], axis[0], 0]])
                r = np.eye(4)
                r[:3, :3] = (np.eye(3) * c + s * K
                             + (1 - c) * np.outer(axis, axis))
                m = m @ r
        elif tag == "scale":
            sc = np.eye(4)
            sc[:3, :3] = np.diag(_floats(el.text)[:3])
            m = m @ sc
    return m


def _walk_nodes(node, parent: np.ndarray, out: list, depth: int = 0):
    if depth > 256:
        raise ValueError("COLLADA node graph too deep (cycle?)")
    world = parent @ _node_local_matrix(node)
    for ig in node.findall("instance_geometry"):
        url = (ig.get("url") or "").lstrip("#")
        binds = {}
        for im in ig.findall(
                "bind_material/technique_common/instance_material"):
            binds[im.get("symbol", "")] = (im.get("target")
                                           or "").lstrip("#")
        out.append((url, world, binds))
    for child in node.findall("node"):
        _walk_nodes(child, world, out, depth + 1)


_UP_FIX = {
    "Y_UP": np.eye(4),
    # Z_UP -> Y_UP: rotate -90 deg about x (z becomes y)
    "Z_UP": np.array([[1, 0, 0, 0], [0, 0, 1, 0],
                      [0, -1, 0, 0], [0, 0, 0, 1]], np.float64),
    # X_UP -> Y_UP: rotate about z so the file's +x maps to +y
    # (Assimp ColladaParser convention: rows {0,-1,0; 1,0,0; 0,0,1})
    "X_UP": np.array([[0, -1, 0, 0], [1, 0, 0, 0],
                      [0, 0, 1, 0], [0, 0, 0, 1]], np.float64),
}


def _material_textures(root, mat_id: str, directory: str,
                       probe: Material) -> Material:
    """material -> effect -> newparam sampler2D -> surface -> image
    chain for the diffuse map; ``probe`` (the filename-fallback Material,
    loaded ONCE per file by the caller) fills the rest."""
    name = mat_id
    img_path = None
    mat_el = None
    for m in root.iter("material"):
        if m.get("id") == mat_id:
            mat_el = m
            name = m.get("name", mat_id)
            break
    if mat_el is not None:
        fx_url = None
        ie = mat_el.find("instance_effect")
        if ie is not None:
            fx_url = (ie.get("url") or "").lstrip("#")
        fx = None
        for e in root.iter("effect"):
            if e.get("id") == fx_url:
                fx = e
                break
        if fx is not None:
            # diffuse <texture texture="SAMPLER"> anywhere in the effect
            sampler_id = None
            for tex in fx.iter("texture"):
                sampler_id = tex.get("texture")
                break
            surface_id = sampler_id
            if sampler_id:
                for np_el in fx.iter("newparam"):
                    if np_el.get("sid") == sampler_id:
                        s2 = np_el.find("sampler2D/source")
                        if s2 is not None and s2.text:
                            surface_id = s2.text.strip()
            image_id = surface_id
            if surface_id:
                for np_el in fx.iter("newparam"):
                    if np_el.get("sid") == surface_id:
                        init = np_el.find("surface/init_from")
                        if init is not None and init.text:
                            image_id = init.text.strip()
            if image_id:
                for img in root.iter("image"):
                    if img.get("id") == image_id:
                        init = img.find("init_from")
                        if init is not None and init.text:
                            img_path = init.text.strip()
                        break
    diffuse = probe.diffuse
    if img_path:
        rel = urllib.parse.unquote(img_path).replace("\\", "/")
        rel = rel[7:] if rel.startswith("file://") else rel
        full = (rel if os.path.isabs(rel)
                else os.path.join(directory, rel))
        from tinyrenderder_tpu.models.obj import _try_read_texture
        img = _try_read_texture(full)
        if img is not None:
            diffuse = img
        else:
            log.warning("Failed to load COLLADA texture: %s", img_path)
    return Material(name=name, diffuse=diffuse, normal=probe.normal,
                    specular=probe.specular, emission=probe.emission)


def load_collada(path: str, load_textures: bool = True) -> Mesh:
    """Load a COLLADA .dae file into a finalized Mesh (same postprocess
    contract as the other loaders)."""
    directory = os.path.dirname(os.path.abspath(path))
    stem = os.path.splitext(os.path.basename(path))[0]

    root = _localize(ET.parse(path).getroot())
    if _strip_ns(root.tag) != "COLLADA":
        raise ValueError("not a COLLADA file (root element is "
                         f"'{root.tag}')")

    up_el = root.find("asset/up_axis")
    up = (up_el.text or "Y_UP").strip() if up_el is not None else "Y_UP"
    up_fix = _UP_FIX.get(up, np.eye(4))

    geoms = {g.get("id"): g for g in root.iter("geometry")}

    # instance list from the active visual scene; all geometries
    # untransformed if the file has no scene graph
    instances: list[tuple[str, np.ndarray, dict]] = []
    scene_url = None
    ivs = root.find("scene/instance_visual_scene")
    if ivs is not None:
        scene_url = (ivs.get("url") or "").lstrip("#")
    vscene = None
    for vs in root.iter("visual_scene"):
        if scene_url in (None, vs.get("id")):
            vscene = vs
            break
    if vscene is not None:
        for node in vscene.findall("node"):
            _walk_nodes(node, np.eye(4), instances)
    if not instances:
        instances = [(gid, np.eye(4), {}) for gid in geoms]

    mat_ids: list[str] = []          # COLLADA material ids, in first use order
    mat_index: dict[str, int] = {}

    all_pos, all_nrm, all_uv, all_faces = [], [], [], []
    submeshes: list[SubMesh] = []
    v_off = 0
    f_off = 0
    any_nrm_flag = False
    for gid, world, binds in instances:
        geom = geoms.get(gid)
        if geom is None:
            continue
        world = up_fix @ world
        lin = world[:3, :3]
        nmat = (np.linalg.inv(lin).T
                if abs(np.linalg.det(lin)) > 1e-12 else np.eye(3))
        sources = _Sources(geom.find("mesh")
                           if geom.find("mesh") is not None else geom)
        for material_sym, corners, tri_corners, inputs in \
                _geometry_triangles(geom, sources):
            # vectorized (vi, ni, ti, ...) -> vertex id dedup
            # (JoinIdenticalVertices analogue, first occurrence wins)
            uniq, corner_vid = dedup_rows_stable(corners)

            nv = uniq.shape[0]
            pos = np.zeros((nv, 3))
            nrm = np.zeros((nv, 3))
            uv = np.zeros((nv, 2))
            has_n = has_uv = False
            for sem, off, arr in inputs:
                sel = uniq[:, off]
                if sel.size and (sel.min() < 0
                                 or sel.max() >= arr.shape[0]):
                    raise ValueError(
                        f"COLLADA {sem} index out of range")
                if sem == "VERTEX":
                    pos = arr[sel][:, :3]
                elif sem == "NORMAL":
                    nrm = arr[sel][:, :3]
                    has_n = True
                elif sem == "TEXCOORD":
                    uv = arr[sel][:, :2].copy()
                    uv[:, 1] = 1.0 - uv[:, 1]   # aiProcess_FlipUVs
                    has_uv = True
            any_nrm_flag |= has_n
            pos = pos @ lin.T + world[:3, 3]
            if has_n:
                nrm = nrm @ nmat.T

            faces = corner_vid[tri_corners].astype(np.int32)
            target = binds.get(material_sym, material_sym)
            if target not in mat_index:
                mat_index[target] = len(mat_ids)
                mat_ids.append(target)
            all_pos.append(pos)
            all_nrm.append(nrm)
            all_uv.append(uv)
            all_faces.append(faces + v_off)
            submeshes.append(SubMesh(
                name=geom.get("name", gid or "mesh"),
                start_index=f_off * 3, index_count=faces.size,
                material_index=mat_index[target],
                has_normals=has_n, has_texcoords=has_uv))
            v_off += nv
            f_off += faces.shape[0]

    if not all_pos:
        raise ValueError("COLLADA file contains no triangle geometry")

    if load_textures:
        probe = load_material_textures("", {}, directory, stem)
        materials = [_material_textures(root, mid, directory, probe)
                     for mid in mat_ids]
    else:
        materials = [Material(name=mid) for mid in mat_ids]
    if not materials:
        materials = [Material(name="")]

    mesh = Mesh(positions=np.concatenate(all_pos),
                faces=np.concatenate(all_faces),
                normals=(np.concatenate(all_nrm)
                         if any_nrm_flag else None),
                uvs=np.concatenate(all_uv),
                submeshes=submeshes, materials=materials, name=stem)
    mesh.finalize()
    log.info("Model loaded (dae): %s (vertices: %d, faces: %d, "
             "primitives: %d)", path, mesh.nverts, mesh.nfaces,
             len(submeshes))
    return mesh
