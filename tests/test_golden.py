"""Golden-image integration tests (SURVEY §4 item 3).

The fixtures in tests/golden/ are oracle renders checked into the repo;
the device engine must reproduce them within 1 LSB per channel.  Unlike
the live oracle-parity tests, these catch regressions where the oracle
and the engine drift *together*.  Regenerate (only after an intentional
semantics change) with scripts/gen_goldens.py.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from gen_goldens import H, W, golden_configs  # noqa: E402
from helpers import render_engine  # noqa: E402
from tinyrenderder_tpu.utils import tga  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


@pytest.fixture(scope="module")
def configs():
    return golden_configs()


@pytest.mark.parametrize("name", ["flat_head", "gouraud_head",
                                  "textured_head", "phong_nm_head",
                                  "eye_sphere", "multi_pass"])
@pytest.mark.parametrize("backend", ["xla", "tiled"])
def test_golden(configs, name, backend):
    path = os.path.join(GOLDEN_DIR, f"{name}.tga")
    # write_tga_file defaults to vflip=true (tgaimage.cpp:161-191), so a
    # read round trip returns rows bottom-first
    golden = tga.read(path).to_rgb()[::-1][..., :3]
    fb = render_engine(configs[name], W, H, backend=backend)
    got = np.asarray(fb.color)
    delta = np.abs(got.astype(int) - golden.astype(int))
    assert delta.max() <= 1, (
        f"{name}/{backend}: max delta {delta.max()} at "
        f"{np.argwhere((delta > 1).any(-1))[:3]}")


def test_golden_postprocess():
    """z-viz + SSAO + composite over the multi-pass scene vs the
    checked-in fixtures.  Tolerance 2 LSB on <=2 pixels: the SSAO and
    z-viz thresholds sit on raw depth values, and a 1-ulp depth change
    (compilation-context-dependent fusion) flips one 64-tap count
    (255*0.35/64 ~ 1.4 LSB)."""
    from gen_goldens import postprocess_golden

    zao, final = postprocess_golden()
    for name, img in (("post_zbuffer", np.repeat(zao[..., 0:1], 3, -1)),
                      ("post_ao", np.repeat(zao[..., 1:2], 3, -1)),
                      ("post_final", final)):
        path = os.path.join(GOLDEN_DIR, f"{name}.tga")
        golden = tga.read(path).to_rgb()[::-1][..., :3]
        d = np.abs(img.astype(int) - golden.astype(int))
        assert d.max() <= 2, f"{name}: max delta {d.max()}"
        assert (d > 0).any(-1).sum() <= 2, f"{name}: too many diffs"

    # fused device dispatch agrees closely (f32 vs f64 SSAO math)
    from helpers import render_engine
    from tinyrenderder_tpu.ops import post
    cfg = golden_configs()["multi_pass"]
    fb = render_engine(cfg, W, H, backend="xla")
    _, ao_d, final_d = post.postprocess_device(
        np.asarray(fb.color), np.asarray(fb.depth, dtype=np.float32))
    delta = np.abs(np.asarray(final_d).astype(int) - final.astype(int))
    assert delta.max() <= 2
