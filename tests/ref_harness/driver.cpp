// Parity-harness driver: runs the REFERENCE renderer's hot loop
// (rasterize, /root/reference/our_gl.cpp:89-201) on a stream of
// clip-space triangles and dumps its raw z-buffer, winner map, and
// stats for bitwise comparison against this repo's float64 oracle
// (tests/test_reference_harness.py).
//
// This file is original harness code; it is compiled AGAINST the
// read-only reference sources (-I plus our_gl.cpp/tgaimage.cpp on the
// g++ command line) at test time — no reference code is copied into
// the repository.
//
// Input  (argv[1], binary): int32 w, h, n; then n * 3 verts * 4 f64
//                           (clip-space xyzw, triangle submission order)
// Output (argv[2]): w*h f64   — zbuffer, index x + y*w (our_gl.cpp:162)
//        (argv[3]): w*h int32 — winner map, 1-based triangle id,
//                               0 = background
//        (argv[4], optional): framebuffer through the REFERENCE TGA
//                             encoder (write_tga_file defaults:
//                             vflip + RLE) for codec byte-parity
// stderr: HARNESS timing line + the reference's own DEBUG stats line
//         (print_render_stats, our_gl.cpp:204-210)

#include "our_gl.h"
#include "tgaimage.h"

#include <cstdint>
#include <cstdio>
#include <ctime>
#include <vector>

namespace {

// Encodes its (1-based) triangle id into the framebuffer color; the
// reference overwrites color on every z-pass, so the final pixel holds
// the id of the winning triangle under the strict-less first-drawn-wins
// rule — exactly the engine's winner map.
struct IdShader : IShader {
    std::uint32_t id = 0;
    std::pair<bool, TGAColor> fragment(const vec3) const override {
        return {false, TGAColor(std::uint8_t(id & 255u),
                                std::uint8_t((id >> 8) & 255u),
                                std::uint8_t((id >> 16) & 255u))};
    }
};

double now_s() {
    timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return double(ts.tv_sec) + 1e-9 * double(ts.tv_nsec);
}

}  // namespace

int main(int argc, char** argv) {
    if (argc != 4 && argc != 5) {
        std::fprintf(stderr,
                     "usage: driver <in.bin> <z.out> <win.out> [fb.tga]\n");
        return 2;
    }
    std::FILE* in = std::fopen(argv[1], "rb");
    if (!in) { std::perror("input"); return 2; }
    std::int32_t w = 0, h = 0, n = 0;
    if (std::fread(&w, 4, 1, in) != 1 || std::fread(&h, 4, 1, in) != 1 ||
        std::fread(&n, 4, 1, in) != 1 || w <= 0 || h <= 0 || n < 0) {
        std::fprintf(stderr, "bad header\n");
        return 2;
    }
    std::vector<double> verts(std::size_t(n) * 12);
    if (n && std::fread(verts.data(), 8, verts.size(), in) != verts.size()) {
        std::fprintf(stderr, "short read\n");
        return 2;
    }
    std::fclose(in);

    init_viewport(0, 0, w, h);
    init_zbuffer(w, h);
    TGAImage framebuffer(w, h, TGAImage::RGB);
    IdShader shader;

    const double t0 = now_s();
    for (std::int32_t i = 0; i < n; ++i) {
        const double* v = &verts[std::size_t(i) * 12];
        Triangle tri;
        for (int k = 0; k < 3; ++k)
            for (int c = 0; c < 4; ++c) tri[k][c] = v[4 * k + c];
        shader.id = std::uint32_t(i) + 1u;  // 0 = background
        rasterize(tri, shader, framebuffer);
    }
    const double t1 = now_s();

    std::FILE* zf = std::fopen(argv[2], "wb");
    if (!zf) { std::perror("zout"); return 2; }
    std::fwrite(zbuffer.data(), 8, zbuffer.size(), zf);
    std::fclose(zf);

    std::vector<std::int32_t> win(std::size_t(w) * h, 0);
    for (int y = 0; y < h; ++y)
        for (int x = 0; x < w; ++x) {
            const TGAColor c = framebuffer.get(x, y);
            // TGAColor stores BGRA: [2]=R carries id&255 (ctor above)
            win[std::size_t(x) + std::size_t(y) * w] =
                std::int32_t(c[2]) | (std::int32_t(c[1]) << 8) |
                (std::int32_t(c[0]) << 16);
        }
    std::FILE* wf = std::fopen(argv[3], "wb");
    if (!wf) { std::perror("winout"); return 2; }
    std::fwrite(win.data(), 4, win.size(), wf);
    std::fclose(wf);

    if (argc == 5) framebuffer.write_tga_file(argv[4]);

    std::fprintf(stderr, "HARNESS: triangles=%d rasterize_seconds=%.6f\n",
                 n, t1 - t0);
    print_render_stats();
    return 0;
}
