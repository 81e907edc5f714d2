"""TGA codec tests: round-trips (raw + RLE, both flips), native parity,
legacy scale/blur utilities."""

import numpy as np
import pytest

from tinyrenderder_tpu.utils import native, tga


def random_image(rng, w, h, bpp):
    # mix runs and noise so RLE has both packet kinds
    data = rng.randint(0, 256, size=(h, w, bpp)).astype(np.uint8)
    data[: h // 2, : w // 2] = 17          # big run region
    data[h // 2:, : w // 3] = rng.randint(0, 3)
    return data


@pytest.mark.parametrize("bpp", [1, 3, 4])
@pytest.mark.parametrize("rle", [True, False])
@pytest.mark.parametrize("vflip", [True, False])
def test_roundtrip(tmp_path, bpp, rle, vflip):
    """Reference quirk (tgaimage.cpp:176): write(vflip=True) declares a
    bottom-left origin *without* flipping the data, so a read-back (which
    normalizes to top-first rows) returns the vertically flipped image;
    vflip=False round-trips identically."""
    rng = np.random.RandomState(42)
    img = tga.TGAImage(data=random_image(rng, 37, 23, bpp))
    path = tmp_path / f"t{bpp}{rle}{vflip}.tga"
    tga.write(img, path, vflip=vflip, rle=rle)
    back = tga.read(path)
    expected = img.data[::-1] if vflip else img.data
    assert np.array_equal(back.data, expected)


def test_written_header_matches_reference_defaults(tmp_path):
    img = tga.TGAImage(4, 4, tga.RGB)
    path = tmp_path / "h.tga"
    tga.write(img, path)  # defaults vflip=True, rle=True
    raw = path.read_bytes()
    assert raw[2] == 10                     # RLE true-color
    assert raw[16] == 24                    # bitsperpixel
    assert raw[17] == 0x00                  # vflip -> bottom-left origin
    img1 = tga.TGAImage(4, 4, tga.GRAYSCALE)
    tga.write(img1, path, rle=False, vflip=False)
    raw = path.read_bytes()
    assert raw[2] == 3 and raw[17] == 0x20


def test_rle_run_splitting():
    """Runs longer than 128 split into max-128 chunks like the reference."""
    flat = np.full((300, 3), 9, dtype=np.uint8)
    encoded = tga._encode_rle(flat, 3)
    # 128 + 128 + 44 -> three RLE packets of 4 bytes each
    assert len(encoded) == 12
    assert encoded[0] == 127 + 128 and encoded[4] == 127 + 128 and encoded[8] == 43 + 128
    decoded = tga._decode_rle(encoded, 300, 1, 3)
    assert np.array_equal(decoded, flat)


def test_native_codec_matches_python():
    if not native.available():
        pytest.skip("native library not built")
    rng = np.random.RandomState(7)
    for bpp in (1, 3, 4):
        flat = random_image(rng, 61, 31, bpp).reshape(-1, bpp)
        enc_native = native.rle_encode(flat, bpp)
        # force the pure-python encoder by calling its internals
        import tinyrenderder_tpu.utils.tga as tgamod
        orig = native.available
        try:
            native.available = lambda: False
            enc_py = tgamod._encode_rle(flat, bpp)
            dec_py = tgamod._decode_rle(enc_native, flat.shape[0], 1, bpp)
        finally:
            native.available = orig
        assert enc_native == enc_py
        assert np.array_equal(dec_py, flat)
        assert np.array_equal(native.rle_decode(enc_py, flat.shape[0], 1, bpp), flat)


def test_get_set_oob_tolerant():
    img = tga.TGAImage(4, 4, tga.RGB)
    img.set(-1, 0, (1, 2, 3))
    img.set(0, 99, (1, 2, 3))
    assert np.array_equal(img.get(-5, 2), np.zeros(4, dtype=np.uint8))
    img.set(1, 2, (10, 20, 30))
    assert np.array_equal(img.get(1, 2)[:3], [10, 20, 30])


def test_scale_nearest():
    img = tga.TGAImage(data=np.arange(16, dtype=np.uint8).reshape(4, 4, 1))
    assert img.scale(2, 2)
    # src index = dst * old // new
    assert img.data[:, :, 0].tolist() == [[0, 2], [8, 10]]


def test_gaussian_blur_preserves_constant():
    img = tga.TGAImage(data=np.full((8, 8, 3), 100, dtype=np.uint8))
    img.gaussian_blur(2)
    # kernel sums to 1 -> constant image stays within rounding
    assert np.all(np.abs(img.data.astype(int) - 100) <= 1)


def test_rgb_conversion():
    bgr = np.zeros((2, 2, 3), dtype=np.uint8)
    bgr[..., 0] = 10  # B
    bgr[..., 2] = 30  # R
    img = tga.TGAImage(data=bgr)
    rgb = img.to_rgb()
    assert rgb[0, 0].tolist() == [30, 0, 10]
    back = tga.TGAImage.from_rgb(rgb)
    assert np.array_equal(back.data, bgr)


def test_rle_byte_exact_reference_vectors():
    """Hand-traced byte streams of the reference greedy encoder
    (tgaimage.cpp:193-242): raw chunks extend while the candidate
    differs from its PREDECESSOR, so the first pixel of an equal pair
    still joins the raw chunk.  Pins byte-identity beyond round-trips."""
    from tinyrenderder_tpu.utils.tga import _encode_rle
    # A,B,B  -> raw(2)[A,B] + raw(1)[B]
    flat = np.array([[0x41], [0x42], [0x42]], np.uint8)
    assert _encode_rle(flat, 1) == bytes([0x01, 0x41, 0x42, 0x00, 0x42])
    # A,B,B,B -> raw(2)[A,B] + rle(2)[B]
    flat = np.array([[0x41], [0x42], [0x42], [0x42]], np.uint8)
    assert _encode_rle(flat, 1) == bytes([0x01, 0x41, 0x42, 0x81, 0x42])
    # A,A,B -> rle(2)[A] + raw(1)[B]
    flat = np.array([[0x41], [0x41], [0x42]], np.uint8)
    assert _encode_rle(flat, 1) == bytes([0x81, 0x41, 0x00, 0x42])


def test_gaussian_blur_matches_take_formulation():
    """The blocked sliding-window blur is bitwise-identical to the
    direct np.take formulation (same f32 window*kernel sum order)."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (21, 35, 3), np.uint8)
    radius = 4
    i = np.arange(-radius, radius + 1, dtype=np.float32)
    sigma = np.float32(radius) / np.float32(2.0)
    kernel = np.exp(-(i * i) / (2 * sigma * sigma)).astype(np.float32)
    kernel /= kernel.sum()

    def take_pass(data, axis):
        n = data.shape[axis]
        idx = np.clip(np.arange(n)[:, None]
                      + np.arange(-radius, radius + 1)[None, :], 0, n - 1)
        taken = np.moveaxis(np.take(data, idx, axis=axis),
                            axis + 1, -1).astype(np.float32)
        return (taken * kernel).sum(axis=-1).astype(np.uint8)

    ref = take_pass(take_pass(img, 1), 0)
    t = tga.TGAImage(data=img.copy())
    t.gaussian_blur(radius)
    np.testing.assert_array_equal(t.data, ref)
