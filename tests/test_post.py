"""Post-processing tests: SSAO vs a literal per-pixel reference loop,
z-buffer visualization, composite."""

import math

import numpy as np

from tinyrenderder_tpu.ops import post


def reference_ssao(zbuffer, w, h, x, y):
    """Literal transcription of compute_ssao_at (main.cpp:324-362)."""
    center = zbuffer[y, x]
    if not math.isfinite(center):
        return 1.0
    occluded = total = 0
    for direction in range(post.AO_NUM_DIRECTIONS):
        angle = 2.0 * math.pi * direction / post.AO_NUM_DIRECTIONS
        dx, dy = math.cos(angle), math.sin(angle)
        for step in range(1, post.AO_STEPS_PER_DIRECTION + 1):
            radius = step / post.AO_STEPS_PER_DIRECTION * post.AO_SAMPLE_RADIUS
            # C round() = half away from zero
            vx, vy = x + dx * radius, y + dy * radius
            sx = int(math.floor(vx + 0.5)) if vx >= 0 else -int(math.floor(-vx + 0.5))
            sy = int(math.floor(vy + 0.5)) if vy >= 0 else -int(math.floor(-vy + 0.5))
            if sx < 0 or sx >= w or sy < 0 or sy >= h:
                continue
            s = zbuffer[sy, sx]
            if not math.isfinite(s):
                total += 1
                continue
            if s < center - post.AO_OCCLUSION_THRESHOLD:
                occluded += 1
            total += 1
    if total == 0:
        return 1.0
    return 1.0 - occluded / total * post.AO_INTENSITY


def random_depth(w, h, seed=5):
    rng = np.random.RandomState(seed)
    z = rng.uniform(-1, 1, size=(h, w))
    z[rng.uniform(size=(h, w)) < 0.3] = np.inf      # background holes
    return z


def test_ssao_matches_reference_loop():
    w = h = 40
    z = random_depth(w, h)
    ao = post.ssao_map(z, np)
    for y in range(0, h, 3):
        for x in range(0, w, 3):
            expected = reference_ssao(z, w, h, x, y)
            assert ao[y, x] == np.float64(expected), (x, y)


def test_ssao_offsets_count_and_range():
    taps = post.ssao_offsets()
    assert len(taps) == 64
    assert max(max(abs(a), abs(b)) for a, b in taps) == 16
    # first direction is +x: offsets (2, 0), (4, 0), ... (16, 0)
    assert taps[:8] == [(2 * s, 0) for s in range(1, 9)]


def test_ssao_infinite_center_is_one():
    z = np.full((8, 8), np.inf)
    assert (post.ssao_map(z, np) == 1.0).all()


def test_zbuffer_image_normalization():
    z = np.full((4, 4), np.inf)
    z[1, 1] = 0.0
    z[2, 2] = 1.0
    img = post.zbuffer_to_image(z, np)
    assert img[1, 1] == 255          # nearest -> darkest is... inverted: 1 - norm
    assert img[2, 2] == 0
    assert img[0, 0] == 255          # infinite = white


def test_zbuffer_image_empty_is_white():
    z = np.full((4, 4), np.inf)
    assert (post.zbuffer_to_image(z, np) == 255).all()


def test_zbuffer_image_degenerate_range():
    z = np.full((4, 4), 0.5)
    img = post.zbuffer_to_image(z, np)
    assert (img == 255).all()        # all at min -> 1 - 0 = 1 -> 255


def test_zbuffer_image_degenerate_range_f32_large_magnitude():
    """All-equal depths at |z| > 2^4 in float32: the reference's
    ``zmin + 1e-7`` range guard is below half an ulp there (a no-op),
    which used to leave 0/0 = NaN bytes on the device path while the
    f64 oracle yielded 255 — the clamped-denominator fix must keep both
    at 255 (plus a mixed case where one pixel differs)."""
    import jax.numpy as jnp
    z32 = np.full((4, 8), 50.0, dtype=np.float32)
    img_dev = np.asarray(post.zbuffer_to_image(jnp.asarray(z32), jnp))
    img_host = post.zbuffer_to_image(z32.astype(np.float64), np)
    np.testing.assert_array_equal(img_dev, img_host)
    assert (img_dev == 255).all()
    # non-degenerate at the same magnitude still produces a gradient
    z32[0, 0] = 49.0
    img_dev = np.asarray(post.zbuffer_to_image(jnp.asarray(z32), jnp))
    assert img_dev[0, 0] == 255 and (img_dev.ravel()[1:] == 0).all()


def test_composite_truncates():
    color = np.full((2, 2, 3), 200, dtype=np.uint8)
    ao = np.full((2, 2), 128, dtype=np.uint8)
    out = post.composite(color, ao, np)
    assert (out == int(200 * (128 / 255))).all()
    ao255 = np.full((2, 2), 255, dtype=np.uint8)
    assert (post.composite(color, ao255, np) == 200).all()


def test_ssao_jnp_matches_numpy():
    import jax.numpy as jnp
    z = random_depth(32, 32).astype(np.float32)
    a_np = post.ssao_map(z, np)
    a_j = np.asarray(post.ssao_map(jnp.asarray(z), jnp))
    assert np.abs(a_np - a_j).max() < 1e-6
    i_np = post.zbuffer_to_image(z, np)
    i_j = np.asarray(post.zbuffer_to_image(jnp.asarray(z), jnp))
    assert np.abs(i_np.astype(int) - i_j.astype(int)).max() <= 1


def test_composite_exhaustive_contract():
    """All 65536 byte pairs: the integer composite matches the
    reference's f64 formula except on the 12 double-rounding pairs
    (products divisible by 255), where it differs by exactly 1 LSB —
    within the engine's <=1-LSB color contract.  And the numpy path is
    BITWISE-identical to the jitted device path (regression: the old
    f64-host/f32-device split disagreed on e.g. c=3, ao=170)."""
    c = np.arange(256, dtype=np.uint8)
    a = np.arange(256, dtype=np.uint8)
    cc, aa = np.meshgrid(c, a)
    ref = np.trunc(np.minimum(
        cc.astype(np.float64) * (aa.astype(np.float64) / 255.0),
        255.0)).astype(np.int64)
    color = np.repeat(cc[..., None], 3, axis=-1)
    out = post.composite(color, aa, np)
    diff = out[..., 0].astype(np.int64) - ref
    assert np.abs(diff).max() <= 1
    assert np.count_nonzero(diff) <= 12   # the divisible-product pairs

    import jax.numpy as jnp
    out_dev = np.asarray(post.composite(jnp.asarray(color),
                                        jnp.asarray(aa), jnp))
    np.testing.assert_array_equal(out, out_dev)
