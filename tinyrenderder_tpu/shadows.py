"""Two-pass hard shadow mapping (benchmark config #4, BASELINE.md).

The reference snapshot has no shadow pass (SURVEY.md scope fence), but the
tinyrenderer course it follows renders one: pass 1 rasterizes the scene's
depth from the light's viewpoint; pass 2 shades normally, gating the
lit terms by a depth comparison against that shadow map.

TPU shape: the shadow map is just a depth-only frame render (the engine's
phase A with no shading), producing an (S, S) float32 array that pass 2's
``ShadowMappedShader`` samples with nearest gathers — the same machinery
as texture sampling.  Both passes run through any backend (oracle / xla /
tiled), so shadowed renders have a golden path too.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from tinyrenderder_tpu import math3d
from tinyrenderder_tpu.camera import Camera
from tinyrenderder_tpu.scene import RenderResult, Scene
from tinyrenderder_tpu.shaders import DepthShader, PhongShader, ShadowMappedShader

__all__ = ["light_camera_for_scene", "render_depth_from_light",
           "shadowed_scene", "render_with_shadows", "ShadowSettings"]


@dataclass
class ShadowSettings:
    size: int = 1024          # shadow map resolution (square)
    fov_margin: float = 1.3   # widen the light frustum beyond the scene
    distance_factor: float = 2.5


def light_camera_for_scene(scene: Scene, light_dir,
                           settings: ShadowSettings | None = None) -> Camera:
    """Place a camera looking down ``light_dir`` (direction light travels
    *from*, i.e. the shaders' to-light vector) framing the whole scene.
    Cached on the scene: the AABB sweep + frustum math is pure host work
    that repeats identically every frame of a static-light loop."""
    settings = settings or ShadowSettings()
    ckey = (tuple((id(p.mesh), p.model_matrix.tobytes())
                  for p in scene.passes),
            np.asarray(light_dir, np.float64).tobytes(),
            settings.size, settings.fov_margin, settings.distance_factor)
    cached = scene.__dict__.get("_shadow_light_cam")
    if cached is not None and cached[0] == ckey:
        return cached[1]
    boxes = scene.world_aabbs()
    lo = np.min([b.min for b in boxes], axis=0)
    hi = np.max([b.max for b in boxes], axis=0)
    center = (lo + hi) * 0.5
    radius = float(np.linalg.norm(hi - lo)) * 0.5
    radius = max(radius, 1e-3)
    d = math3d.normalized(np.asarray(light_dir, dtype=np.float64))
    dist = radius * settings.distance_factor

    cam = Camera()
    cam.set_eye(center + d * dist)
    cam.set_target(center)
    up = (0.0, 1.0, 0.0) if abs(d[1]) < 0.99 else (1.0, 0.0, 0.0)
    cam.set_up(np.asarray(up))
    fov = 2.0 * np.degrees(np.arctan2(radius, dist)) * settings.fov_margin
    cam.set_fov(float(np.clip(fov, 10.0, 120.0)))
    cam.set_aspect(1.0)
    cam.set_clipping(dist - radius * 1.5, dist + radius * 1.5)
    scene.__dict__["_shadow_light_cam"] = (ckey, cam)
    return cam


def _merged_world_mesh(scene: Scene):
    """All scene meshes merged into one, model matrices baked into the
    positions — the light's depth pass has no per-mesh state (DepthShader
    uses no lights/materials), so one pass replaces len(passes) passes.
    Cached on the scene keyed by the pass list and matrices."""
    from tinyrenderder_tpu.models.mesh import Mesh

    key = tuple((id(p.mesh), p.model_matrix.tobytes())
                for p in scene.passes)
    cached = scene.__dict__.get("_shadow_merged")
    if cached is not None and cached[0] == key:
        return cached[1]
    pos, fac = [], []
    offset = 0
    for p in scene.passes:
        m = p.model_matrix
        ph = p.mesh.positions @ m[:3, :3].T + m[:3, 3]
        w = (p.mesh.positions @ m[3:4, :3].T + m[3, 3]).reshape(-1, 1)
        pos.append(ph / w)                      # AABB-style w divide
        fac.append(p.mesh.faces + offset)
        offset += p.mesh.nverts
    merged = Mesh(positions=np.concatenate(pos),
                  faces=np.concatenate(fac), name="shadow_merged")
    scene.__dict__["_shadow_merged"] = (key, merged)
    return merged


def render_depth_from_light(scene: Scene, light_cam: Camera,
                            settings: ShadowSettings,
                            backend: str = "xla",
                            transfer: bool = True,
                            strict_capacity: bool = True) -> np.ndarray:
    """Pass 1: depth-only render of every mesh from the light's view.
    ``transfer=False`` keeps the shadow map on device (it is consumed as
    a pass-2 uniform, so a host round trip is pure overhead);
    ``strict_capacity=False`` skips the per-pass pair-count host sync
    (~30 ms tunnel RTT — it was half the measured shadow frame)."""
    merged = _merged_world_mesh(scene)
    ckey = (id(merged), id(light_cam), settings.size)
    cached = scene.__dict__.get("_shadow_depth_scene")
    if cached is not None and cached[0] == ckey:
        depth_scene = cached[1]
    else:
        depth_scene = Scene(camera=light_cam, width=settings.size,
                            height=settings.size)
        depth_scene.add(merged, np.eye(4), DepthShader(),
                        name="lightdepth")
        scene.__dict__["_shadow_depth_scene"] = (ckey, depth_scene)
    result = depth_scene.render(backend=backend, frustum_cull=False,
                                collect_stats=transfer, transfer=transfer,
                                strict_capacity=strict_capacity)
    if transfer:
        return np.asarray(result.full_depth, dtype=np.float32)
    return result.full_depth.astype("float32")


def shadowed_scene(scene: Scene, light_dir, shadow_map: np.ndarray,
                   light_cam: Camera, settings: ShadowSettings) -> Scene:
    """Pass 2 scene: every PhongShader pass swapped for a
    ShadowMappedShader carrying its model-space -> light-screen matrix.

    Cached on the source scene: the pass list, shader objects and
    shadow matrices are static across a static-light loop — only the
    shadow MAP changes per frame, and it flows through build_uniforms as
    data (the shader invariant), so a cache hit just swaps the map on
    the existing shaders.  Rebuilding scene + shader objects per frame
    cost several host-side ms and defeated the jit/uniform caches."""
    vp_l = math3d.viewport(0, 0, settings.size, settings.size)
    light_vp = vp_l @ light_cam.projection_matrix @ light_cam.view_matrix

    ckey = (tuple((id(p.mesh), p.model_matrix.tobytes(), id(p.shader))
                  for p in scene.passes),
            light_vp.tobytes(), id(scene.camera),
            scene.width, scene.height)
    cached = scene.__dict__.get("_shadow_lit_scene")
    if cached is not None and cached[0] == ckey:
        lit = cached[1]
        for p in lit.passes:
            if isinstance(p.shader, ShadowMappedShader):
                p.shader.shadow_map = shadow_map
        return lit

    out = Scene(camera=scene.camera, width=scene.width, height=scene.height)
    for p in scene.passes:
        sh = p.shader
        if isinstance(sh, PhongShader) and not isinstance(sh, ShadowMappedShader):
            shadow_matrix = light_vp @ p.model_matrix
            sh = ShadowMappedShader(
                sh.key_light_world, sh.fill_light_world, sh.rim_light_world,
                shadow_matrix=shadow_matrix, shadow_map=shadow_map,
                normal_map_strength=sh.normal_map_strength)
        out.add(p.mesh, p.model_matrix, sh, name=p.name,
                material_index=p.material_index,
                exclude_from_output_depth=p.exclude_from_output_depth)
    scene.__dict__["_shadow_lit_scene"] = (ckey, out)
    return out


def render_with_shadows(scene: Scene, light_dir,
                        settings: ShadowSettings | None = None,
                        backend: str = "xla", frustum_cull: bool = True,
                        collect_stats: bool = True, transfer: bool = True,
                        strict_capacity: bool = True,
                        ) -> tuple[RenderResult, np.ndarray]:
    """Full two-pass shadowed render.  Returns (result, shadow_map)."""
    settings = settings or ShadowSettings()
    light_cam = light_camera_for_scene(scene, light_dir, settings)
    shadow_map = render_depth_from_light(scene, light_cam, settings, backend,
                                         transfer=transfer,
                                         strict_capacity=strict_capacity)
    lit = shadowed_scene(scene, light_dir, shadow_map, light_cam, settings)
    result = lit.render(backend=backend, frustum_cull=frustum_cull,
                        collect_stats=collect_stats, transfer=transfer,
                        strict_capacity=strict_capacity)
    return result, shadow_map
