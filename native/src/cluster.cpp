// Grid-hash Euclidean clustering (host-side union-find).
//
// Native replacement for the radius-graph connected components of
// PCL EuclideanClusterExtraction as used by the reference
// (/root/reference/src/pca/EllipsoidExtractor.cpp:646-737).  The TPU
// pipeline voxel-downsamples the cloud on device; the labels are computed
// here on the host between the two extraction phases (the O(N^2) on-device
// min-label propagation was the frame loop's dominant device cost, and the
// remote TPU toolchain compiles the gather-based on-device grid variant
// pathologically -- see BENCH_DETAILS.md "grid clustering").
//
// Semantics match ops/cluster.py exactly: two unmasked points are
// connected iff the float32 squared distance (dx*dx + dy*dy) + dz*dz is
// <= tol*tol; the component label is the minimum point index in the
// component; masked points get label n.
//
// Complexity: points are bucketed into cells of side tol, so all radius
// neighbors live in the 27 surrounding cells; after a 1 cm voxel
// downsample each cell holds O((tol/leaf)^3) points -> O(N) unions.

#include <cstdint>
#include <cmath>
#include <unordered_map>
#include <vector>

namespace {

struct UF {
    std::vector<int32_t> parent;
    explicit UF(int n) : parent(n) {
        for (int i = 0; i < n; ++i) parent[i] = i;
    }
    int32_t find(int32_t x) {
        while (parent[x] != x) {
            parent[x] = parent[parent[x]];  // path halving
            x = parent[x];
        }
        return x;
    }
    void unite(int32_t a, int32_t b) {
        a = find(a);
        b = find(b);
        if (a == b) return;
        if (a < b) parent[b] = a; else parent[a] = b;  // min-index root
    }
};

inline int64_t cell_key(int32_t cx, int32_t cy, int32_t cz) {
    // 21 bits per axis, offset to non-negative
    return ((int64_t)(cx + (1 << 20)) << 42) |
           ((int64_t)(cy + (1 << 20)) << 21) |
           (int64_t)(cz + (1 << 20));
}

}  // namespace

extern "C" int oslam_cluster_labels(const float* pts,    // [n, 3]
                                    const uint8_t* mask, // [n]
                                    int n, float tol,
                                    int32_t* labels_out  // [n]
) {
    const float tol2 = tol * tol;
    const float inv = 1.0f / tol;

    std::unordered_map<int64_t, std::vector<int32_t>> cells;
    cells.reserve((size_t)n * 2);
    std::vector<int32_t> cx(n), cy(n), cz(n);
    for (int i = 0; i < n; ++i) {
        if (!mask[i]) continue;
        cx[i] = (int32_t)std::floor(pts[3 * i + 0] * inv);
        cy[i] = (int32_t)std::floor(pts[3 * i + 1] * inv);
        cz[i] = (int32_t)std::floor(pts[3 * i + 2] * inv);
        cells[cell_key(cx[i], cy[i], cz[i])].push_back(i);
    }

    UF uf(n);
    for (int i = 0; i < n; ++i) {
        if (!mask[i]) continue;
        const float xi = pts[3 * i + 0];
        const float yi = pts[3 * i + 1];
        const float zi = pts[3 * i + 2];
        // scan the 27-cell stencil; visiting only "forward" pairs (j > i)
        // halves the distance tests without changing the components
        for (int dx = -1; dx <= 1; ++dx)
            for (int dy = -1; dy <= 1; ++dy)
                for (int dz = -1; dz <= 1; ++dz) {
                    auto it = cells.find(
                        cell_key(cx[i] + dx, cy[i] + dy, cz[i] + dz));
                    if (it == cells.end()) continue;
                    for (int32_t j : it->second) {
                        if (j <= i) continue;
                        const float ddx = xi - pts[3 * j + 0];
                        const float ddy = yi - pts[3 * j + 1];
                        const float ddz = zi - pts[3 * j + 2];
                        const float d2 = (ddx * ddx + ddy * ddy) + ddz * ddz;
                        if (d2 <= tol2) uf.unite(i, j);
                    }
                }
    }

    for (int i = 0; i < n; ++i)
        labels_out[i] = mask[i] ? uf.find(i) : n;
    return 0;
}
