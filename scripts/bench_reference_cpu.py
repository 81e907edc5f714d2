"""Measure the REFERENCE renderer's hot-loop throughput on this host.

Builds tests/ref_harness/driver.cpp against the read-only reference
sources and times `rasterize` (our_gl.cpp:89-201) on the SAME triangle
stream the TPU bench's headline config renders (the 27k-face head at
2048², bench.py `_scene(...,meshes=1)`), giving BASELINE.md a measured
reference number where none was published.

The driver's IdShader is strictly CHEAPER than the reference's real
PhongShader (no texture fetches, no lighting), and the binary has no
Assimp/IO overhead — so the printed number flatters the reference and
any TPU-vs-reference speedup derived from it is conservative.

Usage: JAX_PLATFORM_NAME=cpu PYTHONPATH=/root/repo:/root/.axon_site \
           python scripts/bench_reference_cpu.py [width height reps]
"""

import os
import re
import struct
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    # the exact headline geometry/camera (bench.build_pass: 27360-face
    # head, eye (0, 0.4, 2.6)), in float64 like the reference
    from tinyrenderder_tpu.shaders import PhongShader
    head = bench._head(96, 144)
    cam = bench._camera(width, height)
    key, fill, rim = bench._lights()
    shader = PhongShader(key, fill, rim, normal_map_strength=0.5)
    attrs = {k: np.asarray(v, np.float64)
             for k, v in head.face_attributes(np.float64).items()}
    uniforms = shader.build_uniforms(
        cam.view_matrix, cam.projection_matrix, None, np.float64)
    clip, _ = shader.vertex(uniforms, attrs, np)
    clip = np.ascontiguousarray(clip, dtype=np.float64)
    print(f"scene: {clip.shape[0]} faces at {width}x{height}",
          file=sys.stderr)

    exe = "/tmp/refharness_bench/refdriver"
    os.makedirs(os.path.dirname(exe), exist_ok=True)
    subprocess.run(
        ["g++", "-O2", "-std=c++17", f"-I{REF}",
         os.path.join(REPO, "tests", "ref_harness", "driver.cpp"),
         os.path.join(REF, "our_gl.cpp"), os.path.join(REF, "tgaimage.cpp"),
         "-o", exe], check=True)

    inp = "/tmp/refharness_bench/tris.bin"
    with open(inp, "wb") as f:
        f.write(struct.pack("<iii", width, height, clip.shape[0]))
        f.write(clip.tobytes())

    secs, frags = [], None
    for _ in range(reps):
        proc = subprocess.run(
            [exe, inp, "/tmp/refharness_bench/z.bin",
             "/tmp/refharness_bench/win.bin"],
            check=True, capture_output=True, text=True)
        secs.append(float(re.search(
            r"rasterize_seconds=([0-9.]+)", proc.stderr).group(1)))
        frags = int(re.search(
            r"fragments_drawn=(\d+)", proc.stderr).group(1))
    best = min(secs)
    mpix = width * height / best / 1e6
    print(f"reference hot loop ({reps} reps, best): {best * 1e3:.1f} ms/frame"
          f" = {mpix:.2f} Mpix/s frame-rate-equivalent,"
          f" {frags / best / 1e6:.2f} M z-pass-fragments/s"
          f" (IdShader — cheaper than the reference's real Phong;"
          f" numbers flatter the reference)")


if __name__ == "__main__":
    main()
