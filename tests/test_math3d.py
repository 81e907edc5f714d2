"""Unit tests for math3d: transforms vs closed form, frustum, AABB."""

import math

import numpy as np
import pytest

from tinyrenderder_tpu import math3d
from tinyrenderder_tpu.math3d import AABB, Frustum, Plane


def test_lookat_matches_reference_formula():
    eye = math3d.vec3(-3.4019, 2.2001, 1.8026)
    target = math3d.vec3(1.3555, 1.5116, -0.9686)
    up = math3d.vec3(0, 1, 0)
    m = math3d.lookat(eye, target, up)

    z = math3d.normalized(eye - target)
    x = math3d.normalized(math3d.cross(up, z))
    y = math3d.cross(z, x)
    assert np.allclose(m[0, :3], x)
    assert np.allclose(m[1, :3], y)
    assert np.allclose(m[2, :3], z)
    assert np.allclose(m[:3, 3], [-np.dot(x, eye), -np.dot(y, eye), -np.dot(z, eye)])
    assert np.allclose(m[3], [0, 0, 0, 1])
    # eye maps to origin
    assert np.allclose(m @ np.append(eye, 1.0), [0, 0, 0, 1], atol=1e-12)


def test_perspective_matches_reference_formula():
    fov, aspect, n, f = 70.0, 1.5, 0.05, 500.0
    m = math3d.perspective(fov, aspect, n, f)
    t = math.tan(math.radians(fov) / 2)
    assert m[0, 0] == pytest.approx(1.0 / (aspect * t))
    assert m[1, 1] == pytest.approx(1.0 / t)
    assert m[2, 2] == pytest.approx((f + n) / (n - f))
    assert m[2, 3] == pytest.approx(2 * f * n / (n - f))
    assert m[3, 2] == -1.0 and m[3, 3] == 0.0
    # near/far planes map to -1/+1 NDC z
    for zd, expect in ((-n, -1.0), (-f, 1.0)):
        v = m @ np.array([0, 0, zd, 1.0])
        assert v[2] / v[3] == pytest.approx(expect)


def test_viewport_z_passthrough():
    m = math3d.viewport(0, 0, 800, 600)
    v = m @ np.array([0.0, 0.0, 0.25, 1.0])
    assert v[0] == 400 and v[1] == 300
    assert v[2] == 0.25  # our_gl.cpp:67 quirk: z unchanged
    corner = m @ np.array([-1.0, -1.0, 0.0, 1.0])
    assert corner[0] == 0 and corner[1] == 0


def test_rotation_matrices():
    r = math3d.rotation_y(math.pi / 2)
    assert np.allclose(r @ np.array([0, 0, 1, 1.0]), [1, 0, 0, 1], atol=1e-12)
    r = math3d.rotation_x(math.pi / 2)
    assert np.allclose(r @ np.array([0, 1, 0, 1.0]), [0, 0, 1, 1], atol=1e-12)
    r = math3d.rotation_z(math.pi / 2)
    assert np.allclose(r @ np.array([1, 0, 0, 1.0]), [0, 1, 0, 1], atol=1e-12)


def test_aabb_transform_divides_by_w():
    box = AABB((-1, -1, -1), (1, 1, 1))
    m = math3d.translation_matrix(5, 0, 0) @ math3d.scale_matrix(2, 2, 2)
    t = box.transform(m)
    assert np.allclose(t.min, [3, -2, -2])
    assert np.allclose(t.max, [7, 2, 2])


def test_aabb_of_points_margin():
    pts = np.array([[0, 0, 0], [1, 2, 4.0]])
    box = AABB.of_points(pts, margin_frac=0.01)
    assert np.allclose(box.min, [-0.01, -0.02, -0.04])
    assert np.allclose(box.max, [1.01, 2.02, 4.04])


def test_plane_distance():
    p = Plane.from_point((0, 2, 0), (0, 1, 0))  # y = 1 plane, normalized
    assert p.distance((0, 3, 0)) == pytest.approx(2.0)
    assert p.distance((0, 0, 0)) == pytest.approx(-1.0)


def test_frustum_culling_basic():
    view = math3d.lookat((0, 0, 5), (0, 0, 0), (0, 1, 0))
    proj = math3d.perspective(60.0, 1.0, 0.1, 100.0)
    fr = Frustum.from_matrix(proj @ view)
    assert fr.intersects(AABB((-1, -1, -1), (1, 1, 1)))           # at origin
    assert not fr.intersects(AABB((0, 0, 50), (1, 1, 51)))        # behind camera
    assert not fr.intersects(AABB((100, 0, 0), (101, 1, 1)))      # far right
    assert fr.intersects(AABB((-100, -100, -50), (100, 100, 50)))  # envelops


def test_frustum_reference_convention_quirk():
    """The reference's column extraction (our_gl.cpp:212-262) fails to cull
    a box behind the camera — we replicate that behavior under
    convention='reference' and fix it under 'standard'."""
    view = math3d.lookat((0, 0, 5), (0, 0, 0), (0, 1, 0))
    proj = math3d.perspective(60.0, 1.0, 0.1, 100.0)
    m = proj @ view
    behind = AABB((0, 0, 50), (1, 1, 51))
    assert Frustum.from_matrix(m, "reference").intersects(behind)
    assert not Frustum.from_matrix(m, "standard").intersects(behind)


def test_frustum_plane_extraction_matches_manual():
    """Verify the index pattern (col3 +/- colk) against points known to be
    inside/outside."""
    proj = math3d.perspective(90.0, 1.0, 1.0, 10.0)
    fr = Frustum.from_matrix(proj)  # camera at origin looking down -z
    inside = (0, 0, -5)
    for plane in fr.planes:
        assert plane.distance(inside) > 0
    # near plane: z = -1 boundary
    assert fr.planes[Frustum.NEAR].distance((0, 0, -0.5)) < 0
    assert fr.planes[Frustum.FAR].distance((0, 0, -11)) < 0
    # 90 deg fov, aspect 1: |x| < |z|
    assert fr.planes[Frustum.LEFT].distance((-6, 0, -5)) < 0
    assert fr.planes[Frustum.RIGHT].distance((6, 0, -5)) < 0
    assert fr.planes[Frustum.BOTTOM].distance((0, -6, -5)) < 0
    assert fr.planes[Frustum.TOP].distance((0, 6, -5)) < 0
