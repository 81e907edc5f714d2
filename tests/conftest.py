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
    if "xla_cpu_max_isa" not in flags:
        # cap XLA:CPU codegen at AVX2: on 2026-08-18 the sandbox VM
        # migrated to a host whose AVX512 feature set disagrees with
        # LLVM's target model, and XLA:CPU kernels compiled with
        # +prefer-no-gather/avx512* SIGILL'd or segfaulted mid-suite
        # (cpu_aot_loader feature-mismatch warnings, then a crash in
        # backend_compile_and_load).  AVX2 codegen is uniformly
        # supported and only slows the CPU test suite marginally.
        flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
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
    # A persistent XLA:CPU compile cache used to cut the full suite
    # from ~16 min to ~6 min on reruns (directive-10, round 3) — but it
    # is DISABLED by default since 2026-08-18: after a sandbox VM
    # migration, (a) AOT executables cached on the previous host LOADED
    # despite a CPU-feature mismatch and SIGILL'd ("cpu_aot_loader:
    # +prefer-no-gather is not supported on the host machine"), and
    # (b) with a fresh cache dir, *serializing* executables for the
    # cache segfaulted outright (jax 0.9.0, crash inside
    # compilation_cache.put_executable_and_time).  Re-enable explicitly
    # with JAX_TEST_CACHE_DIR=/path when the host is stable and the
    # serializer is trusted.
    cache_dir = os.environ.get("JAX_TEST_CACHE_DIR")
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.5)

    # every XLA:CPU compiled executable maps exec pages and the full
    # suite compiles >1000 programs in one process: at the default
    # vm.max_map_count (65530) the process hits the kernel mmap limit
    # around test ~210 and SEGFAULTS inside backend_compile_and_load
    # (measured: /proc/<pid>/maps grew 35k -> 61k -> crash).  Raise the
    # limit best-effort; ignore failures (non-root / non-Linux).
    try:
        with open("/proc/sys/vm/max_map_count") as f:
            if int(f.read()) < 262144:
                with open("/proc/sys/vm/max_map_count", "w") as g:
                    g.write("1048576")
    except OSError:
        pass


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
