"""Direct parity against the REFERENCE renderer's own compiled hot loop.

Every other parity test in this suite validates the engine against the
repo's float64 NumPy oracle — an independent re-implementation of
our_gl.cpp:89-201.  This file closes the remaining trust gap: it
compiles the reference's actual rasterizer (`/root/reference/our_gl.cpp`
+ tgaimage.cpp, read-only, via tests/ref_harness/driver.cpp — nothing is
copied into the repo) and compares it BITWISE against the oracle on the
same clip-space triangle stream:

  * z-buffer doubles bit-identical  (coverage + depth + z-order),
  * winner maps identical           (strict-less first-drawn-wins),
  * the reference's own DEBUG stats line vs RenderStats
    (triangles, overdraw-inclusive fragments_drawn, touched bbox,
    z-range — our_gl.cpp:204-210).

Covers a real vertex-stage mesh scene AND an adversarial clip-space set
(w≈0 boundaries, all-z-outside, NaN, backface, degenerate, sliver,
z-tie duplicates, off-screen, screen-filling clamp).  Skipped when the
reference tree or g++ is unavailable.
"""

import os
import re
import shutil
import struct
import subprocess

import numpy as np
import pytest

from tinyrenderder_tpu import math3d
from tinyrenderder_tpu.camera import Camera
from tinyrenderder_tpu.models import procedural
from tinyrenderder_tpu.oracle import OraclePass, render_passes
from tinyrenderder_tpu.shaders import Shader

REF = "/root/reference"
HERE = os.path.dirname(os.path.abspath(__file__))

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "our_gl.cpp"))
    or shutil.which("g++") is None,
    reason="reference sources or g++ unavailable")


def _build_driver(tmpdir) -> str:
    exe = os.path.join(tmpdir, "refdriver")
    subprocess.run(
        ["g++", "-O2", "-std=c++17", f"-I{REF}",
         os.path.join(HERE, "ref_harness", "driver.cpp"),
         os.path.join(REF, "our_gl.cpp"),
         os.path.join(REF, "tgaimage.cpp"),
         "-o", exe],
        check=True, capture_output=True, text=True)
    return exe


def _run_driver(exe, clip: np.ndarray, width: int, height: int, tmpdir,
                tga_out: str | None = None):
    """Feed (F, 3, 4) float64 clip triangles to the reference rasterizer;
    return (zbuffer (H, W) f64, winner (H, W) i32 1-based, stats dict)."""
    inp = os.path.join(tmpdir, "tris.bin")
    zout = os.path.join(tmpdir, "z.bin")
    wout = os.path.join(tmpdir, "win.bin")
    clip = np.ascontiguousarray(clip, dtype=np.float64)
    with open(inp, "wb") as f:
        f.write(struct.pack("<iii", width, height, clip.shape[0]))
        f.write(clip.tobytes())
    cmd = [exe, inp, zout, wout] + ([tga_out] if tga_out else [])
    proc = subprocess.run(cmd, check=True, capture_output=True, text=True)
    z = np.fromfile(zout, dtype=np.float64).reshape(height, width)
    win = np.fromfile(wout, dtype=np.int32).reshape(height, width)
    m = re.search(
        r"DEBUG: triangles=(\d+) fragments_drawn=(\d+)"
        r" bbox=\[(-?\d+),(-?\d+)\] - \[(-?\d+),(-?\d+)\]"
        r" z-range=\[([^,]+),([^\]]+)\]", proc.stderr)
    assert m, f"no stats line in driver stderr: {proc.stderr!r}"
    stats = {"triangles": int(m.group(1)), "fragments": int(m.group(2)),
             "bbox": tuple(int(m.group(i)) for i in (3, 4, 5, 6)),
             "z": (m.group(7), m.group(8))}
    return z, win, stats


class IdShader(Shader):
    """Encodes the 1-based face id into the color channels, mirroring
    the driver's IdShader: winner maps become directly comparable.  The
    id rides a constant-per-face varying; interpolating a constant is
    exact to ~id*2^-52 in f64, far below the +0.5 rounding margin."""

    name = "faceid"
    varying_spec = {"fid": 1}

    def vertex(self, u, attrs, xp):
        clip, _ = super().vertex(u, attrs, xp)
        f = attrs["position"].shape[0]
        fid = xp.broadcast_to(
            xp.arange(1, f + 1, dtype=attrs["position"].dtype)[:, None, None],
            (f, 3, 1))
        return clip, {"fid": fid}

    def fragment(self, u, vary, xp):
        i = xp.floor(vary["fid"][..., 0] + 0.5)
        r = i - xp.floor(i / 256.0) * 256.0
        g = xp.floor(i / 256.0) - xp.floor(i / 65536.0) * 256.0
        b = xp.floor(i / 65536.0)
        return xp.stack([r, g, b], axis=-1)


class ClipShader(IdShader):
    """Pass-through vertex stage: attrs["position"] IS the (F, 3, 4)
    clip-space triangle — lets the adversarial set hit the reference's
    reject chain with exact hand-built values."""

    def vertex(self, u, attrs, xp):
        f = attrs["position"].shape[0]
        fid = xp.broadcast_to(
            xp.arange(1, f + 1, dtype=xp.float64)[:, None, None], (f, 3, 1))
        return attrs["position"], {"fid": fid}


def _decode_winner(color: np.ndarray) -> np.ndarray:
    c = color.astype(np.int32)
    return c[..., 0] + (c[..., 1] << 8) + (c[..., 2] << 16)


def _compare(exe, clip, oracle_passes, width, height, tmpdir,
             check_tga: bool = False):
    tga_out = os.path.join(tmpdir, "ref_fb.tga") if check_tga else None
    ref_z, ref_win, ref_stats = _run_driver(exe, clip, width, height,
                                            tmpdir, tga_out)
    frame = render_passes(oracle_passes, width, height, dtype=np.float64)

    if check_tga:
        # codec byte-parity: our encoder writing the oracle frame must
        # reproduce the reference encoder's file exactly (vflip + RLE
        # defaults, tgaimage.cpp:161-242)
        from tinyrenderder_tpu.utils import tga
        ours = os.path.join(tmpdir, "our_fb.tga")
        tga.write(tga.TGAImage.from_rgb(frame.color), ours)
        with open(tga_out, "rb") as a, open(ours, "rb") as b:
            assert a.read() == b.read()

    # z-buffer: bitwise (covers coverage, depth values, z-order)
    assert np.array_equal(ref_z.view(np.uint64),
                          frame.zbuffer.astype(np.float64).view(np.uint64))
    # winner map: strict-less first-drawn-wins
    assert np.array_equal(ref_win, _decode_winner(frame.color))
    # stats counters (our_gl.cpp:18-22)
    st = frame.stats
    assert ref_stats["triangles"] == st.triangles_rasterized
    assert ref_stats["fragments"] == st.fragments_drawn
    if ref_stats["fragments"]:
        assert ref_stats["bbox"] == (st.min_x, st.min_y, st.max_x, st.max_y)
        # std::to_string prints 6 fixed decimals
        assert abs(float(ref_stats["z"][0]) - st.min_z) <= 5e-7
        assert abs(float(ref_stats["z"][1]) - st.max_z) <= 5e-7
    return ref_z


def test_reference_rasterizer_bitwise_on_mesh_scene(tmp_path):
    """A real mesh through the real vertex stage: every pixel the
    compiled reference draws, at the exact double it draws it."""
    width, height = 200, 160
    mesh = procedural.bumpy_head(18, 26)
    cam = Camera()
    cam.set_eye((0.3, 0.6, 2.8))
    cam.set_target((0, 0, 0))
    cam.set_fov(55.0)
    cam.set_aspect(width / height)
    cam.set_clipping(0.1, 40.0)

    shader = IdShader()
    model = np.asarray(math3d.rotation_y(0.4), dtype=np.float64)
    modelview = cam.view_matrix @ model
    uniforms = shader.build_uniforms(modelview, cam.projection_matrix,
                                     None, np.float64)
    attrs = {k: np.asarray(v, np.float64)
             for k, v in mesh.face_attributes(np.float64).items()}
    clip, _ = shader.vertex(uniforms, attrs, np)

    ref_z = _compare(_build_driver(tmp_path), np.asarray(clip),
                     [OraclePass(attrs=attrs, shader=shader,
                                 uniforms=uniforms)],
                     width, height, tmp_path, check_tga=True)
    assert np.isfinite(ref_z).sum() > 500  # the scene really drew


def test_reference_rasterizer_bitwise_on_adversarial_clip(tmp_path):
    """Hand-built clip-space triangles hitting every reject branch of
    our_gl.cpp:94-135 plus the z-tie and on-edge coverage rules."""
    width, height = 64, 48

    def tri(v0, v1, v2):
        return np.array([v0, v1, v2], dtype=np.float64)

    tris = [
        # plain front-facing triangle (CCW in screen space)
        tri([-0.5, -0.5, 0.0, 1.0], [0.5, -0.5, 0.0, 1.0],
            [0.0, 0.5, 0.0, 1.0]),
        # exact duplicate: z-tie — strict less must keep the FIRST
        tri([-0.5, -0.5, 0.0, 1.0], [0.5, -0.5, 0.0, 1.0],
            [0.0, 0.5, 0.0, 1.0]),
        # backfacing (reversed winding) -> cross<=0 reject
        tri([-0.5, -0.5, 0.0, 1.0], [0.0, 0.5, 0.0, 1.0],
            [0.5, -0.5, 0.0, 1.0]),
        # w at the reject boundary (<= 1e-12) -> whole-triangle reject
        tri([-0.5, -0.5, 0.0, 1e-12], [0.5, -0.5, 0.0, 1.0],
            [0.0, 0.5, 0.0, 1.0]),
        # w just above the boundary: near-plane crosser, |ndc| huge,
        # all z outside [-1,1] -> reject
        tri([-0.5, -0.5, 3.0, 2e-12], [0.5, -0.5, 3.0, 2e-12],
            [0.0, 0.5, 3.0, 2e-12]),
        # one vertex z outside only -> NOT rejected (all-3 rule)
        tri([-0.4, -0.4, 1.5, 1.0], [0.4, -0.4, 0.0, 1.0],
            [0.0, 0.4, 0.0, 1.0]),
        # NaN vertex -> reject
        tri([np.nan, -0.5, 0.0, 1.0], [0.5, -0.5, 0.0, 1.0],
            [0.0, 0.5, 0.0, 1.0]),
        # degenerate: zero area -> per-pixel (-1,1,1) reject
        tri([-0.5, 0.0, 0.0, 1.0], [0.0, 0.0, 0.0, 1.0],
            [0.5, 0.0, 0.0, 1.0]),
        # sub-pixel sliver crossing pixel centers
        tri([-0.9, -0.901, 0.2, 1.0], [0.9, -0.9, 0.2, 1.0],
            [-0.9, -0.9, 0.2, 1.0]),
        # screen-filling triangle -> bbox clamped to the frame
        tri([-4.0, -4.0, 0.9, 1.0], [4.0, -4.0, 0.9, 1.0],
            [0.0, 6.0, 0.9, 1.0]),
        # fully off-screen -> empty clamped bbox reject
        tri([2.5, 2.5, 0.0, 1.0], [3.5, 2.5, 0.0, 1.0],
            [3.0, 3.5, 0.0, 1.0]),
        # vertex exactly on a pixel center (b == 0 edge: covered,
        # the chain tests b < 0 only)
        tri([2.5 / 32 - 1.0, 2.5 / 24 - 1.0, -0.5, 1.0],
            [0.6, 0.1, -0.5, 1.0], [0.1, 0.6, -0.5, 1.0]),
        # nearer triangle drawn later: must overwrite (strict less)
        tri([-0.5, -0.5, -0.4, 1.0], [0.5, -0.5, -0.4, 1.0],
            [0.0, 0.5, -0.4, 1.0]),
        # perspective: distinct w per vertex (perspective-correct bary
        # path, incl. the denom guard staying un-hit)
        tri([-0.8, -0.2, 0.1, 0.8], [0.8, -0.2, 0.3, 1.6],
            [0.0, 0.7, 0.2, 1.2]),
    ]
    clip = np.stack(tris)

    shader = ClipShader()
    uniforms = shader.build_uniforms(np.eye(4), np.eye(4), None, np.float64)
    attrs = {"position": clip}

    ref_z = _compare(_build_driver(tmp_path), clip,
                     [OraclePass(attrs=attrs, shader=shader,
                                 uniforms=uniforms)],
                     width, height, tmp_path)
    assert np.isfinite(ref_z).sum() > 100


def test_reference_rasterizer_bitwise_on_random_fuzz(tmp_path):
    """Seeded random clip-space triangles across every regime the
    reject chain and per-pixel rules discriminate: random winding,
    w spanning 1e-14..10 (the 1e-12 boundary inside the range), z
    inside/outside [-1,1], occasional NaN/Inf, duplicates (z-ties),
    slivers, and screen-filling spans — all bitwise vs the compiled
    reference."""
    width, height = 96, 80
    rng = np.random.default_rng(20260819)
    n = 400

    xy = rng.uniform(-2.0, 2.0, size=(n, 3, 2))
    z = rng.uniform(-1.6, 1.6, size=(n, 3, 1))
    w = 10.0 ** rng.uniform(-14.0, 1.0, size=(n, 3, 1))
    clip = np.concatenate([xy * w, z * w, w], axis=2)

    # regime injections (seeded, deterministic)
    idx = rng.permutation(n)
    clip[idx[0:20]] = clip[idx[20:40]]              # duplicates: z-ties
    clip[idx[40:50], :, 2] = 5.0                    # all z outside
    clip[idx[50:60], 0, 0] = np.nan                 # NaN vertex
    sl = idx[60:80]                                 # slivers
    clip[sl, 2, :2] = (clip[sl, 0, :2]
                       + (clip[sl, 1, :2] - clip[sl, 0, :2]) * 1.0001
                       + 1e-7)
    big = idx[80:90]                                # screen-filling
    clip[big, :, :2] *= 50.0

    shader = ClipShader()
    uniforms = shader.build_uniforms(np.eye(4), np.eye(4), None, np.float64)

    ref_z = _compare(_build_driver(tmp_path), clip,
                     [OraclePass(attrs={"position": clip}, shader=shader,
                                 uniforms=uniforms)],
                     width, height, tmp_path, check_tga=True)
    assert np.isfinite(ref_z).sum() > 200
