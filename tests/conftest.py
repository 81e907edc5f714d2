"""Test configuration: force the CPU backend with 8 virtual devices.

Multi-device sharding tests run on fake CPU devices (the renderer's
analogue of multi-node tests without a cluster — SURVEY.md §4.4); parity
tests are bit-exact on the CPU backend.  Must run before jax imports.
"""

import os
import sys

# TPU_TESTS=1 runs the real-hardware gate (tests marked @pytest.mark.tpu,
# see tests/test_tpu_gate.py): keep the real platform and the persistent
# Mosaic compile cache instead of forcing the CPU backend.
TPU_MODE = os.environ.get("TPU_TESTS") == "1"

if not TPU_MODE:
    # JAX_PLATFORMS alone is overridden by the axon TPU plugin in this
    # image; JAX_PLATFORM_NAME + the explicit config update below are
    # honored.
    os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    if "xla_allow_excess_precision" not in flags:
        # forbid FMA contraction so identical formulas round identically
        # across differently-fused programs (z-tie winner parity)
        flags = (flags + " --xla_allow_excess_precision=false").strip()
    os.environ["XLA_FLAGS"] = flags

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if TPU_MODE:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
else:
    jax.config.update("jax_platforms", "cpu")
    # The suite is XLA:CPU *compile*-dominated (multi-pass shard_map
    # fused-frame programs rebuilt every run): a persistent compile
    # cache cut the full suite from ~16 min to ~6 min on reruns
    # (directive-10, round 3).  Keyed by HLO, so code edits that change
    # a program miss the cache and recompile — always safe.  Kept
    # separate from the TPU cache (different compile options).
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_TEST_CACHE_DIR",
                                     "/root/.jax_cache_cpu_tests"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: real-TPU golden/parity gate (run with TPU_TESTS=1 "
        "python -m pytest tests/ -m tpu)")


def pytest_collection_modifyitems(config, items):
    import pytest
    if TPU_MODE:
        return
    skip = pytest.mark.skip(reason="TPU gate: set TPU_TESTS=1 on a TPU host")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)
