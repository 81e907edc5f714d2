// Native OBJ tokenizer — the host-side loading hot loop.
//
// The reference loads models through the Assimp C++ library
// (model.cpp:91-101); this framework's loader lives in
// tinyrenderder_tpu/models/obj.py with this C++ fast path for the
// tokenizing/dedup inner loop (Sponza-scale OBJs are ~1M lines).  The
// semantics mirror the Python implementation exactly — same vertex
// dedup order, fan triangulation, V flip, submesh open/close rules — so
// the two paths produce identical arrays (tests/test_models.py).
//
// C ABI: parse -> opaque handle -> size queries -> bulk copy -> free.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Key {
    int32_t v, t, n;
    bool operator==(const Key& o) const { return v == o.v && t == o.t && n == o.n; }
};
struct KeyHash {
    size_t operator()(const Key& k) const {
        uint64_t h = (uint64_t)(uint32_t)k.v * 0x9E3779B97F4A7C15ull;
        h ^= (uint64_t)(uint32_t)k.t * 0xC2B2AE3D27D4EB4Full;
        h ^= (uint64_t)(uint32_t)k.n * 0x165667B19E3779F9ull;
        return (size_t)(h ^ (h >> 29));
    }
};

struct SubMesh {
    std::string name;
    int64_t start_index = 0;
    int64_t index_count = 0;
    int64_t material = 0;
};

struct ObjData {
    std::vector<double> out_pos, out_uv, out_norm;   // SoA, deduped
    std::vector<int32_t> faces;                      // flat corner ids
    std::vector<SubMesh> submeshes;
    std::vector<std::string> material_names;
    std::vector<std::string> mtllibs;
    bool any_uv = false, any_norm = false;
    // set when a numeric token fails to parse fully: the Python
    // fallback raises ValueError there, so the wrapper must too —
    // which loader a user gets must not change load semantics
    bool parse_error = false;
};


// strict numeric token: parses like Python float(token) — the token
// must begin a number and the number must run to whitespace / line end
static inline double num3(const char* s, const char* line_end, char** e,
                          ObjData* d) {
    double r = strtod(s, e);
    if (*e == s) { d->parse_error = true; return r; }
    if (*e < line_end && **e != ' ' && **e != '\t' && **e != '\r'
        && **e != '\n')
        d->parse_error = true;
    return r;
}

inline const char* skip_ws(const char* p, const char* end) {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
    return p;
}

inline const char* next_token(const char* p, const char* end,
                              const char** tok, size_t* len) {
    p = skip_ws(p, end);
    const char* s = p;
    while (p < end && *p != ' ' && *p != '\t' && *p != '\r' && *p != '\n') ++p;
    *tok = s;
    *len = (size_t)(p - s);
    return p;
}

// OBJ indices are 1-based; negatives are relative to the current count
inline int64_t resolve(int64_t idx, int64_t count) {
    return idx > 0 ? idx - 1 : count + idx;
}

}  // namespace

extern "C" {

void* trd_obj_parse(const char* path, const char* default_group) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return nullptr;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    if (size < 0) {
        std::fclose(f);
        return nullptr;
    }
    std::fseek(f, 0, SEEK_SET);
    std::string buf((size_t)size, '\0');
    if (size > 0 && std::fread(&buf[0], 1, (size_t)size, f) != (size_t)size) {
        std::fclose(f);
        return nullptr;
    }
    std::fclose(f);

    auto* d = new ObjData();
    std::vector<double> positions, texcoords, normals;  // raw directives
    std::unordered_map<Key, int32_t, KeyHash> dedup;
    std::unordered_map<std::string, int64_t> material_ids;
    std::string cur_group = default_group ? default_group : "mesh";
    int64_t cur_material = 0;

    auto close_submesh = [&]() {
        if (!d->submeshes.empty() && d->submeshes.back().index_count == 0)
            d->submeshes.pop_back();
    };
    auto open_submesh = [&]() {
        close_submesh();
        SubMesh sm;
        sm.name = cur_group;
        sm.start_index = (int64_t)d->faces.size();
        sm.material = cur_material;
        d->submeshes.push_back(std::move(sm));
    };
    auto vertex_id = [&](int64_t vi, int64_t ti, int64_t ni) -> int32_t {
        Key k{(int32_t)vi, (int32_t)ti, (int32_t)ni};
        auto it = dedup.find(k);
        if (it != dedup.end()) return it->second;
        int32_t vid = (int32_t)(d->out_pos.size() / 3);
        dedup.emplace(k, vid);
        d->out_pos.insert(d->out_pos.end(), {positions[vi * 3],
                                             positions[vi * 3 + 1],
                                             positions[vi * 3 + 2]});
        if (ti >= 0)
            d->out_uv.insert(d->out_uv.end(), {texcoords[ti * 2],
                                               texcoords[ti * 2 + 1]});
        else
            d->out_uv.insert(d->out_uv.end(), {0.0, 0.0});
        if (ni >= 0)
            d->out_norm.insert(d->out_norm.end(), {normals[ni * 3],
                                                   normals[ni * 3 + 1],
                                                   normals[ni * 3 + 2]});
        else
            d->out_norm.insert(d->out_norm.end(), {0.0, 0.0, 0.0});
        return vid;
    };

    open_submesh();
    const char* p = buf.data();
    const char* end = p + buf.size();
    std::vector<int32_t> corner_ids;
    while (p < end) {
        const char* line_end = (const char*)memchr(p, '\n', (size_t)(end - p));
        if (!line_end) line_end = end;
        const char* tok;
        size_t len;
        const char* q = next_token(p, line_end, &tok, &len);
        if (len == 0 || tok[0] == '#') { p = line_end + 1; continue; }

        if (len == 1 && tok[0] == 'v') {
            char* e;
            double x = num3(q, line_end, &e, d);
            double y = num3(e, line_end, &e, d);
            double z = num3(e, line_end, &e, d);
            positions.insert(positions.end(), {x, y, z});
        } else if (len == 2 && tok[0] == 'v' && tok[1] == 't') {
            char* e;
            double u = num3(q, line_end, &e, d);
            const char* after = skip_ws(e, line_end);
            double v = (after < line_end && *after != '\n')
                ? num3(e, line_end, &e, d) : 0.0;
            // aiProcess_FlipUVs (model.cpp:93)
            texcoords.insert(texcoords.end(), {u, 1.0 - v});
        } else if (len == 2 && tok[0] == 'v' && tok[1] == 'n') {
            char* e;
            double x = num3(q, line_end, &e, d);
            double y = num3(e, line_end, &e, d);
            double z = num3(e, line_end, &e, d);
            normals.insert(normals.end(), {x, y, z});
        } else if (len == 1 && tok[0] == 'f') {
            corner_ids.clear();
            const char* c = q;
            while (true) {
                const char* ct;
                size_t cl;
                c = next_token(c, line_end, &ct, &cl);
                if (cl == 0) break;
                char* e;
                int64_t vi = resolve(strtoll(ct, &e, 10),
                                     (int64_t)(positions.size() / 3));
                int64_t ti = -1, ni = -1;
                if (e < ct + cl && *e == '/') {
                    ++e;
                    if (*e != '/' && e < ct + cl) {
                        ti = resolve(strtoll(e, &e, 10),
                                     (int64_t)(texcoords.size() / 2));
                        d->any_uv = true;
                    }
                    if (e < ct + cl && *e == '/') {
                        ++e;
                        if (e < ct + cl && *e != ' ') {
                            ni = resolve(strtoll(e, &e, 10),
                                         (int64_t)(normals.size() / 3));
                            d->any_norm = true;
                        }
                    }
                }
                // invalid indices: skip the corner for vi, treat ti/ni
                // as missing — same rules as the Python loader, and a
                // malformed file ("f 1/999999", "f 1/0") must never
                // read past the raw-directive buffers
                if (e != ct + cl) d->parse_error = true;  // "1x/2/3"
                if (vi < 0 || vi >= (int64_t)(positions.size() / 3)) continue;
                if (ti < 0 || ti >= (int64_t)(texcoords.size() / 2)) ti = -1;
                if (ni < 0 || ni >= (int64_t)(normals.size() / 3)) ni = -1;
                corner_ids.push_back(vertex_id(vi, ti, ni));
            }
            // fan triangulation (aiProcess_Triangulate)
            for (size_t k = 1; k + 1 < corner_ids.size(); ++k) {
                d->faces.insert(d->faces.end(), {corner_ids[0], corner_ids[k],
                                                 corner_ids[k + 1]});
                d->submeshes.back().index_count += 3;
            }
        } else if (len == 6 && !memcmp(tok, "usemtl", 6)) {
            const char* nt;
            size_t nl;
            next_token(q, line_end, &nt, &nl);
            if (nl) {
                std::string name(nt, nl);
                auto it = material_ids.find(name);
                if (it == material_ids.end()) {
                    cur_material = (int64_t)d->material_names.size();
                    material_ids.emplace(name, cur_material);
                    d->material_names.push_back(name);
                } else {
                    cur_material = it->second;
                }
                open_submesh();
            }
        } else if (len == 6 && !memcmp(tok, "mtllib", 6)) {
            // store the trimmed rest-of-line VERBATIM: the Python side
            // (_mtllib_paths) decides between one spaced filename and
            // multiple libraries — keeping that rule in one place
            const char* b = skip_ws(q, line_end);
            const char* e2 = line_end;
            while (e2 > b && (e2[-1] == ' ' || e2[-1] == '\t'
                              || e2[-1] == '\r' || e2[-1] == '\n'))
                --e2;
            if (e2 > b) d->mtllibs.emplace_back(b, (size_t)(e2 - b));
        } else if (len == 1 && (tok[0] == 'g' || tok[0] == 'o')) {
            const char* nt;
            size_t nl;
            next_token(q, line_end, &nt, &nl);
            if (nl) {
                cur_group.assign(nt, nl);
                open_submesh();
            }
        }
        p = line_end + 1;
    }
    close_submesh();
    if (d->submeshes.empty()) {
        SubMesh sm;
        sm.name = cur_group;
        sm.index_count = (int64_t)d->faces.size();
        d->submeshes.push_back(std::move(sm));
    }
    return d;
}

long long trd_obj_nverts(void* h) {
    return (long long)(((ObjData*)h)->out_pos.size() / 3);
}
long long trd_obj_nindices(void* h) {
    return (long long)((ObjData*)h)->faces.size();
}
long long trd_obj_nsubmeshes(void* h) {
    return (long long)((ObjData*)h)->submeshes.size();
}
long long trd_obj_nmaterials(void* h) {
    return (long long)((ObjData*)h)->material_names.size();
}
int trd_obj_flags(void* h) {
    auto* d = (ObjData*)h;
    return (d->any_uv ? 1 : 0) | (d->any_norm ? 2 : 0)
        | (d->parse_error ? 4 : 0);
}

void trd_obj_copy(void* h, double* pos, double* uv, double* nrm,
                  int32_t* faces, long long* sub_table) {
    auto* d = (ObjData*)h;
    memcpy(pos, d->out_pos.data(), d->out_pos.size() * sizeof(double));
    memcpy(uv, d->out_uv.data(), d->out_uv.size() * sizeof(double));
    memcpy(nrm, d->out_norm.data(), d->out_norm.size() * sizeof(double));
    memcpy(faces, d->faces.data(), d->faces.size() * sizeof(int32_t));
    for (size_t i = 0; i < d->submeshes.size(); ++i) {
        sub_table[i * 3] = d->submeshes[i].start_index;
        sub_table[i * 3 + 1] = d->submeshes[i].index_count;
        sub_table[i * 3 + 2] = d->submeshes[i].material;
    }
}

// which: 0 = material names, 1 = submesh group names, 2 = mtllib paths
static std::string join_names(ObjData* d, int which) {
    std::string out;
    auto add = [&](const std::string& s) {
        if (!out.empty()) out.push_back('\n');
        out += s;
    };
    if (which == 0)
        for (auto& s : d->material_names) add(s);
    else if (which == 1)
        for (auto& sm : d->submeshes) add(sm.name);
    else
        for (auto& s : d->mtllibs) add(s);
    return out;
}

long long trd_obj_names_len(void* h, int which) {
    return (long long)join_names((ObjData*)h, which).size();
}
void trd_obj_names(void* h, int which, char* out) {
    std::string s = join_names((ObjData*)h, which);
    memcpy(out, s.data(), s.size());
}
void trd_obj_free(void* h) { delete (ObjData*)h; }

}  // extern "C"
