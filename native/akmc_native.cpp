// Native runtime components for akmc_tpu (C ABI, loaded via ctypes).
//
// The reference builds its neighbor/cutoff index lists with O(N^2) GPU scans
// (neighbor_lists_gpu.cu:55-136) and parses xyz files with iostreams
// (utils.cpp:72-98). Here:
//   * cell-list neighbor construction: O(N * occupancy) with OpenMP —
//     initialization of crossbar-scale structures (the reference's ~20 min
//     bottleneck, README.md:11) runs in seconds on host CPU and doesn't
//     occupy the TPU;
//   * bandwidth-minimizing lexicographic reordering helper;
//   * fast xyz parsing (single pass, no iostream overhead).
//
// All functions return 0 on success, negative on error.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// Cell-list neighbor list.
//   pos:      (n,3) row-major doubles [Angstrom]
//   out_idx:  (n, max_nn) int32, filled with ascending neighbor indices,
//             -1 padded
//   pbc:      0 = open; 1 = periodic in y/z (reference utils.cpp:100-174)
// Returns max neighbor count found (>= 0), or -1 if it exceeds max_nn
// (out rows are then truncated, matching the reference's silent cap).
// ---------------------------------------------------------------------------
int neighbor_list_cell(
    const double* pos, int64_t n, double cutoff, int max_nn,
    const double* lattice, int pbc, int strict, int32_t* out_idx)
{
    if (n <= 0) return 0;
    double lo[3] = {1e300, 1e300, 1e300}, hi[3] = {-1e300, -1e300, -1e300};
    for (int64_t i = 0; i < n; ++i)
        for (int d = 0; d < 3; ++d) {
            double v = pos[3 * i + d];
            lo[d] = std::min(lo[d], v);
            hi[d] = std::max(hi[d], v);
        }
    // cell grid with cell size >= cutoff
    int nc[3];
    double inv_cs[3];
    for (int d = 0; d < 3; ++d) {
        double span = std::max(hi[d] - lo[d], 1e-9);
        nc[d] = std::max(1, (int)std::floor(span / cutoff));
        inv_cs[d] = nc[d] / (span * (1.0 + 1e-12));
    }
    const int64_t ncells = (int64_t)nc[0] * nc[1] * nc[2];

    std::vector<int64_t> cell_of(n), count(ncells + 1, 0);
    for (int64_t i = 0; i < n; ++i) {
        int c[3];
        for (int d = 0; d < 3; ++d) {
            int ci = (int)((pos[3 * i + d] - lo[d]) * inv_cs[d]);
            c[d] = std::min(std::max(ci, 0), nc[d] - 1);
        }
        int64_t cid = ((int64_t)c[0] * nc[1] + c[1]) * nc[2] + c[2];
        cell_of[i] = cid;
        count[cid + 1]++;
    }
    for (int64_t c = 0; c < ncells; ++c) count[c + 1] += count[c];
    std::vector<int64_t> order(n);
    {
        std::vector<int64_t> cur(count.begin(), count.end() - 1);
        for (int64_t i = 0; i < n; ++i) order[cur[cell_of[i]]++] = i;
    }

    const double cut2 = cutoff * cutoff;
    const double ly = lattice ? lattice[1] : 0.0;
    const double lz = lattice ? lattice[2] : 0.0;
    int overflow = 0;
    int global_max = 0;

#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic, 256) reduction(max : global_max) \
    reduction(| : overflow)
#endif
    for (int64_t i = 0; i < n; ++i) {
        int32_t* row = out_idx + (int64_t)i * max_nn;
        for (int k = 0; k < max_nn; ++k) row[k] = -1;

        int ci[3];
        for (int d = 0; d < 3; ++d) {
            int cc = (int)((pos[3 * i + d] - lo[d]) * inv_cs[d]);
            ci[d] = std::min(std::max(cc, 0), nc[d] - 1);
        }
        // gather candidates from the 27-neighborhood (wrapping y/z if pbc)
        std::vector<int64_t> cand;
        cand.reserve(256);
        for (int dx = -1; dx <= 1; ++dx) {
            int cx = ci[0] + dx;
            if (cx < 0 || cx >= nc[0]) continue;
            for (int dy = -1; dy <= 1; ++dy) {
                int cy = ci[1] + dy;
                if (pbc) cy = (cy + nc[1]) % nc[1];
                if (cy < 0 || cy >= nc[1]) continue;
                for (int dz = -1; dz <= 1; ++dz) {
                    int cz = ci[2] + dz;
                    if (pbc) cz = (cz + nc[2]) % nc[2];
                    if (cz < 0 || cz >= nc[2]) continue;
                    int64_t cid = ((int64_t)cx * nc[1] + cy) * nc[2] + cz;
                    for (int64_t s = count[cid]; s < count[cid + 1]; ++s)
                        cand.push_back(order[s]);
                }
            }
        }
        std::sort(cand.begin(), cand.end());
        cand.erase(std::unique(cand.begin(), cand.end()), cand.end());

        int cnt = 0;
        for (int64_t j : cand) {
            if (j == i) continue;
            double dxv = pos[3 * i] - pos[3 * j];
            double dyv = pos[3 * i + 1] - pos[3 * j + 1];
            double dzv = pos[3 * i + 2] - pos[3 * j + 2];
            if (pbc) {
                dyv -= ly * std::round(dyv / ly);
                dzv -= lz * std::round(dzv / lz);
            }
            double d2 = dxv * dxv + dyv * dyv + dzv * dzv;
            if (d2 < cut2) {
                if (cnt < max_nn) row[cnt] = (int32_t)j;
                ++cnt;
            }
        }
        global_max = std::max(global_max, cnt);
        if (cnt > max_nn) overflow = 1;
    }
    if (overflow && strict) return -1;
    return global_max;
}

// ---------------------------------------------------------------------------
// Fast xyz parsing. Two-call protocol:
//   xyz_count(path) -> N (or -1)
//   xyz_read(path, n, elem_codes[n], pos[3n]) using the element name table
//   (utils.cpp:7-29 coding: d, Od, V, O, Hf, Ni, Ti, Pt, N -> 0..8)
// ---------------------------------------------------------------------------
static int element_code(const char* s, int len)
{
    if (len == 1) {
        switch (s[0]) {
        case 'd': return 0;
        case 'V': return 2;
        case 'O': return 3;
        case 'N': return 8;
        }
    } else if (len == 2) {
        if (s[0] == 'O' && s[1] == 'd') return 1;
        if (s[0] == 'H' && s[1] == 'f') return 4;
        if (s[0] == 'N' && s[1] == 'i') return 5;
        if (s[0] == 'T' && s[1] == 'i') return 6;
        if (s[0] == 'P' && s[1] == 't') return 7;
    }
    return -1;
}

int64_t xyz_count(const char* path)
{
    FILE* f = std::fopen(path, "r");
    if (!f) return -1;
    long long n = -1;
    if (std::fscanf(f, "%lld", &n) != 1) n = -1;
    std::fclose(f);
    return (int64_t)n;
}

int xyz_read(const char* path, int64_t n, int32_t* elem, double* pos)
{
    FILE* f = std::fopen(path, "r");
    if (!f) return -1;
    char line[512];
    if (!std::fgets(line, sizeof line, f)) { std::fclose(f); return -2; }
    if (!std::fgets(line, sizeof line, f)) { std::fclose(f); return -2; }
    for (int64_t i = 0; i < n; ++i) {
        char name[16];
        double x, y, z;
        if (std::fscanf(f, "%15s %lf %lf %lf", name, &x, &y, &z) != 4) {
            std::fclose(f);
            return -3;
        }
        // swallow any extra per-line columns (snapshots carry potential/power)
        int ch;
        while ((ch = std::fgetc(f)) != '\n' && ch != EOF) {}
        int code = element_code(name, (int)std::strlen(name));
        if (code < 0) { std::fclose(f); return -4; }
        elem[i] = code;
        pos[3 * i] = x;
        pos[3 * i + 1] = y;
        pos[3 * i + 2] = z;
    }
    std::fclose(f);
    return 0;
}

int omp_thread_count(void)
{
#if defined(_OPENMP)
    int t = 0;
#pragma omp parallel
    {
#pragma omp single
        t = omp_get_num_threads();
    }
    return t;
#else
    return 1;
#endif
}

}  // extern "C"
