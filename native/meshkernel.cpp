// meshkernel: native host-side kernels for geobignn_tpu preprocessing.
//
// The reference offloads its host hot loops to third-party C++ (OpenMesh
// parsing, torch_cluster graclus matching) while keeping BFS patch growth
// as slow Python scalar loops (code/data_util.py:55-84).  This library is
// the in-tree native runtime for those paths:
//
//   gbn_greedy_matching  - seeded greedy heavy-edge matching (the Graclus-
//                          equivalent used to precompute pooling
//                          hierarchies; same policy as pool/hierarchy.py's
//                          numpy implementation, bit-identical results)
//   gbn_grow_patch       - BFS ring growth of a face patch
//   gbn_obj_counts/read  - fast Wavefront .obj triangle parsing
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Seeded RNG: must match numpy's Generator? No — the *contract* is cluster
// quality, not identity; but the numpy path uses np.random.default_rng
// (PCG64) whose permutation we cannot cheaply replicate.  Instead BOTH the
// numpy and native paths use this splitmix64-based Fisher-Yates when asked
// for "native parity" — the python wrapper passes the same seed and uses
// the native permutation, so results are bit-identical across paths.
// ---------------------------------------------------------------------------

static inline uint64_t splitmix64(uint64_t& s) {
    uint64_t z = (s += 0x9E3779B97F4A7C15ULL);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
    return z ^ (z >> 31);
}

// Fisher-Yates permutation of [0, n) with splitmix64.
void gbn_permutation(int64_t n, uint64_t seed, int64_t* out) {
    for (int64_t i = 0; i < n; ++i) out[i] = i;
    uint64_t s = seed;
    for (int64_t i = n - 1; i > 0; --i) {
        int64_t j = (int64_t)(splitmix64(s) % (uint64_t)(i + 1));
        int64_t t = out[i]; out[i] = out[j]; out[j] = t;
    }
}

// Greedy heavy-edge matching over a CSR graph.
//   row_ptr: (n+1,), cols: (e,), w: (e,) or null, order: (n,) visit order.
//   out_match: (n,) cluster representative = min(i, j) or i for singletons.
void gbn_greedy_matching(
    int64_t n, const int64_t* row_ptr, const int64_t* cols,
    const float* w, const int64_t* order, int64_t* out_match, uint64_t seed) {
    for (int64_t i = 0; i < n; ++i) out_match[i] = -1;
    uint64_t s = seed ^ 0xD1B54A32D192ED03ULL;
    for (int64_t k = 0; k < n; ++k) {
        int64_t i = order[k];
        if (out_match[i] >= 0) continue;
        int64_t best = -1;
        float best_w = -1.0f;
        int64_t n_free = 0;
        for (int64_t p = row_ptr[i]; p < row_ptr[i + 1]; ++p) {
            int64_t j = cols[p];
            if (j == i || out_match[j] >= 0) continue;
            ++n_free;
            if (w != nullptr) {
                if (w[p] > best_w) { best_w = w[p]; best = j; }
            } else {
                // reservoir-sample a uniform free neighbour
                if ((int64_t)(splitmix64(s) % (uint64_t)n_free) == 0) best = j;
            }
        }
        if (best < 0) { out_match[i] = i; continue; }
        int64_t rep = i < best ? i : best;
        out_match[i] = rep;
        out_match[best] = rep;
    }
}

// BFS ring growth over the faces-sharing-a-vertex adjacency.
//   fv: (F,3) int32, vf: (V, vf_cols) int32 padded with -1.
//   Returns count; face ids in visit order in out (capacity max_faces
//   or n_faces).
int64_t gbn_grow_patch(
    int64_t n_faces, const int32_t* fv,
    int64_t vf_cols, const int32_t* vf,
    int64_t seed_face, int64_t max_faces, int64_t max_rings,
    int64_t* out, uint8_t* visited /* scratch (n_faces), zeroed */) {
    int64_t cap = max_faces < n_faces ? max_faces : n_faces;
    if (cap <= 0) return 0;
    out[0] = seed_face;
    visited[seed_face] = 1;
    int64_t count = 1;
    int64_t ring_start = 0, ring_end = 1, ring = 0;
    while (count < cap && ring_start < ring_end && ring < max_rings) {
        for (int64_t q = ring_start; q < ring_end && count < cap; ++q) {
            const int32_t* corners = fv + 3 * out[q];
            for (int c = 0; c < 3 && count < cap; ++c) {
                const int32_t* row = vf + (int64_t)corners[c] * vf_cols;
                for (int64_t p = 0; p < vf_cols && count < cap; ++p) {
                    int32_t f = row[p];
                    if (f < 0) break;  // -1 padding terminates the row
                    if (!visited[f]) { visited[f] = 1; out[count++] = f; }
                }
            }
        }
        ring_start = ring_end;
        ring_end = count;
        ++ring;
    }
    return count;
}

// ---------------------------------------------------------------------------
// Wavefront .obj triangle parsing (v / f records, slash attrs, negative
// indices, quad fan-triangulation) — two-pass: counts then fill.
// ---------------------------------------------------------------------------

static int64_t count_face_tris(const char* p) {
    // number of triangles a face line fans into = n_corners - 2
    int64_t corners = 0;
    bool in_tok = false;
    for (; *p && *p != '\n'; ++p) {
        if (*p == ' ' || *p == '\t' || *p == '\r') { in_tok = false; continue; }
        if (!in_tok) { ++corners; in_tok = true; }
    }
    return corners > 2 ? corners - 2 : 0;
}

int gbn_obj_counts(const char* path, int64_t* n_verts, int64_t* n_tris) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    *n_verts = 0; *n_tris = 0;
    char line[1 << 16];
    while (fgets(line, sizeof line, f)) {
        if (line[0] == 'v' && (line[1] == ' ' || line[1] == '\t')) ++*n_verts;
        else if (line[0] == 'f' && (line[1] == ' ' || line[1] == '\t'))
            *n_tris += count_face_tris(line + 2);
    }
    fclose(f);
    return 0;
}

int gbn_obj_read(const char* path, float* verts, int32_t* tris) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    char line[1 << 16];
    int64_t nv = 0, nt = 0;
    while (fgets(line, sizeof line, f)) {
        if (line[0] == 'v' && (line[1] == ' ' || line[1] == '\t')) {
            char* p = line + 2;
            for (int k = 0; k < 3; ++k) verts[3 * nv + k] = strtof(p, &p);
            ++nv;
        } else if (line[0] == 'f' && (line[1] == ' ' || line[1] == '\t')) {
            int64_t idx[64];
            int64_t n_c = 0;
            char* p = line + 1;
            while (*p && *p != '\n' && n_c < 64) {
                while (*p == ' ' || *p == '\t' || *p == '\r') ++p;
                if (!*p || *p == '\n') break;
                long v = strtol(p, &p, 10);
                idx[n_c++] = v > 0 ? v - 1 : nv + v;
                while (*p && *p != ' ' && *p != '\t' && *p != '\n') ++p;  // skip /vt/vn
            }
            for (int64_t k = 1; k + 1 < n_c; ++k) {
                tris[3 * nt + 0] = (int32_t)idx[0];
                tris[3 * nt + 1] = (int32_t)idx[k];
                tris[3 * nt + 2] = (int32_t)idx[k + 1];
                ++nt;
            }
        }
    }
    fclose(f);
    return 0;
}

}  // extern "C"
