// Native host-side point-cloud kernels (libspurfies_io).
//
// The reference's native layer is CUDA (torch_knnquery) — on TPU the device
// side is XLA/Pallas, but the HOST-side preprocessing loops (greedy spacing
// subsample of ~1M-point DUSt3R clouds, radius dedup of mesh samples in the
// DTU Chamfer protocol, dust3r_inference.py:69-105 / evals/eval_dtu.py:124-140)
// are serial and Python-hostile.  This library provides them as O(N)
// grid-hash kernels, loaded via ctypes (spurfies_tpu/native.py).
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <unordered_map>
#include <vector>

namespace {

struct CellKey {
    int64_t v;
    bool operator==(const CellKey &o) const { return v == o.v; }
};

struct CellHash {
    size_t operator()(const CellKey &k) const {
        return std::hash<int64_t>()(k.v);
    }
};

inline int64_t cell_of(const float *p, const float *lo, float inv_cell,
                       int64_t dy, int64_t dz) {
    int64_t ix = (int64_t)std::floor((p[0] - lo[0]) * inv_cell);
    int64_t iy = (int64_t)std::floor((p[1] - lo[1]) * inv_cell);
    int64_t iz = (int64_t)std::floor((p[2] - lo[2]) * inv_cell);
    return (ix * dy + iy) * dz + iz;
}

// Greedy accept-if-no-neighbor-within-radius, grid-hash accelerated.
void greedy_radius(const float *pts, int64_t n, float radius,
                   uint8_t *keep) {
    float lo[3] = {1e30f, 1e30f, 1e30f};
    float hi[3] = {-1e30f, -1e30f, -1e30f};
    for (int64_t i = 0; i < n; ++i) {
        for (int d = 0; d < 3; ++d) {
            float v = pts[3 * i + d];
            if (v < lo[d]) lo[d] = v;
            if (v > hi[d]) hi[d] = v;
        }
    }
    for (int d = 0; d < 3; ++d) lo[d] -= radius;
    float inv_cell = 1.0f / radius;
    int64_t dy = (int64_t)((hi[1] - lo[1]) * inv_cell) + 3;
    int64_t dz = (int64_t)((hi[2] - lo[2]) * inv_cell) + 3;
    float r2 = radius * radius;

    std::unordered_map<CellKey, std::vector<int64_t>, CellHash> grid;
    grid.reserve((size_t)(n / 4 + 16));

    for (int64_t i = 0; i < n; ++i) {
        const float *p = pts + 3 * i;
        int64_t c = cell_of(p, lo, inv_cell, dy, dz);
        bool ok = true;
        for (int64_t ox = -1; ox <= 1 && ok; ++ox)
            for (int64_t oy = -1; oy <= 1 && ok; ++oy)
                for (int64_t oz = -1; oz <= 1 && ok; ++oz) {
                    auto it = grid.find({c + (ox * dy + oy) * dz + oz});
                    if (it == grid.end()) continue;
                    for (int64_t j : it->second) {
                        const float *q = pts + 3 * j;
                        float dx = p[0] - q[0], dyv = p[1] - q[1],
                              dzv = p[2] - q[2];
                        if (dx * dx + dyv * dyv + dzv * dzv < r2) {
                            ok = false;
                            break;
                        }
                    }
                }
        keep[i] = ok ? 1 : 0;
        if (ok) grid[{c}].push_back(i);
    }
}

}  // namespace

extern "C" {

// keep[i]=1 if point i survives greedy spacing subsample (first-come order,
// matching dust3r_inference.py greedy semantics).
void spurfies_spacing_subsample(const float *pts, int64_t n, float spacing,
                                uint8_t *keep) {
    greedy_radius(pts, n, spacing, keep);
}

// DTU-protocol radius dedup: identical kernel, exposed under the protocol
// name for clarity (eval_dtu.py downsamples with a 0.2mm radius).
void spurfies_radius_dedup(const float *pts, int64_t n, float radius,
                           uint8_t *keep) {
    greedy_radius(pts, n, radius, keep);
}

// Brute-force nearest-neighbor distances from each query to a target cloud,
// grid-hash bounded (used by Chamfer when scipy/sklearn are unavailable).
void spurfies_nn_dist(const float *queries, int64_t nq, const float *pts,
                      int64_t n, float cell, float max_dist, float *out) {
    float lo[3] = {1e30f, 1e30f, 1e30f};
    float hi[3] = {-1e30f, -1e30f, -1e30f};
    for (int64_t i = 0; i < n; ++i)
        for (int d = 0; d < 3; ++d) {
            float v = pts[3 * i + d];
            if (v < lo[d]) lo[d] = v;
            if (v > hi[d]) hi[d] = v;
        }
    for (int d = 0; d < 3; ++d) lo[d] -= cell;
    float inv_cell = 1.0f / cell;
    int64_t dy = (int64_t)((hi[1] - lo[1]) * inv_cell) + 3;
    int64_t dz = (int64_t)((hi[2] - lo[2]) * inv_cell) + 3;

    std::unordered_map<CellKey, std::vector<int64_t>, CellHash> grid;
    grid.reserve((size_t)(n / 2 + 16));
    for (int64_t i = 0; i < n; ++i)
        grid[{cell_of(pts + 3 * i, lo, inv_cell, dy, dz)}].push_back(i);

    int64_t max_ring = (int64_t)std::ceil(max_dist / cell) + 1;
    for (int64_t qi = 0; qi < nq; ++qi) {
        const float *p = queries + 3 * qi;
        int64_t c = cell_of(p, lo, inv_cell, dy, dz);
        float best = max_dist * max_dist;
        bool found = false;
        for (int64_t ring = 0; ring <= max_ring; ++ring) {
            // once found, one extra ring guarantees correctness
            for (int64_t ox = -ring; ox <= ring; ++ox)
                for (int64_t oy = -ring; oy <= ring; ++oy)
                    for (int64_t oz = -ring; oz <= ring; ++oz) {
                        if (std::max(std::llabs(ox), std::max(
                                std::llabs(oy), std::llabs(oz))) != ring)
                            continue;
                        auto it = grid.find(
                            {c + (ox * dy + oy) * dz + oz});
                        if (it == grid.end()) continue;
                        for (int64_t j : it->second) {
                            const float *q = pts + 3 * j;
                            float dx = p[0] - q[0], dyv = p[1] - q[1],
                                  dzv = p[2] - q[2];
                            float d2 = dx * dx + dyv * dyv + dzv * dzv;
                            if (d2 < best) {
                                best = d2;
                                found = true;
                            }
                        }
                    }
            if (found && (float)(ring) * cell > std::sqrt(best)) break;
        }
        out[qi] = std::sqrt(best);
    }
}

}  // extern "C"
