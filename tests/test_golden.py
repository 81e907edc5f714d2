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
