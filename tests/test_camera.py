"""Camera tests: presets, setters, matrix recomputation, auto-framing."""

import numpy as np
import pytest

from tinyrenderder_tpu import math3d
from tinyrenderder_tpu.camera import Camera, Preset, setup_camera_for_rendering
from tinyrenderder_tpu.math3d import AABB


def test_preset_values():
    cam = Camera(Preset.SPONZA_SCENE, aspect=1.5)
    p = cam.params
    assert p.eye.tolist() == [0, 15, 40]
    assert p.fov == 55.0 and p.near_plane == 0.5 and p.far_plane == 500.0
    assert p.aspect == 1.5
    cam2 = Camera(Preset.OVERVIEW)
    assert cam2.params.up.tolist() == [0, 0, -1]


def test_setters_recompute():
    cam = Camera()
    v0 = cam.view_matrix
    cam.set_eye((1, 2, 3))
    assert not np.allclose(cam.view_matrix, v0)
    p0 = cam.projection_matrix
    cam.set_fov(30.0)
    assert not np.allclose(cam.projection_matrix, p0)
    cam.set_clipping(0.5, 50.0)
    assert cam.params.near_plane == 0.5


def test_view_matches_math3d_lookat():
    cam = Camera()
    cam.set_eye((-3.4019, 2.2001, 1.8026))
    cam.set_target((1.3555, 1.5116, -0.9686))
    expected = math3d.lookat(cam.params.eye, cam.params.target, cam.params.up)
    assert np.array_equal(cam.view_matrix, expected)


def test_view_projection_order():
    cam = Camera()
    vp = cam.view_projection_matrix
    assert np.allclose(vp, cam.projection_matrix @ cam.view_matrix)


def test_auto_setup_scene():
    cam = Camera()
    cam.auto_setup_for_scene(AABB((-10, 0, -10), (10, 5, 10)), aspect=1.5)
    # target is the scene center
    assert np.allclose(cam.params.target, [0, 2.5, 0])
    # camera sits above and behind the center
    assert cam.params.eye[2] > 0 and cam.params.eye[1] > 2.5
    assert cam.params.far_plane >= 100.0


def test_setup_for_multiple_models_union():
    cam = Camera()
    cam.setup_for_multiple_models(
        [AABB((-1, -1, -1), (0, 0, 0)), AABB((0, 0, 0), (5, 1, 1))], 1.0)
    assert np.allclose(cam.params.target, [2, 0, 0])
    cam2 = Camera()
    cam2.setup_for_multiple_models([], 1.0)   # falls back to DEFAULT preset
    assert cam2.params.eye.tolist() == [0, 0, 10]


def test_setup_camera_for_rendering_fallback():
    cam = Camera()
    setup_camera_for_rendering(cam, [], 1200, 800, auto_adjust=True)
    assert cam.params.fov == 55.0  # SPONZA_SCENE preset
    assert cam.params.aspect == pytest.approx(1200 / 800)
