// Native host ops for skoots-tpu.
//
// Plays the role of the reference's host-side native dependencies:
//   * scipy.ndimage.label        -> cc3d_label (two-pass union-find, 6/26-conn)
//   * numba _in_place_replace    -> remap_i64 (sorted-LUT remap)
//     (/root/reference/skoots/lib/flood_fill.py:177-234)
//   * fastremap.renumber         -> renumber_i64
//
// Exposed as a plain C ABI for ctypes; built by native/build.sh (g++ -O3).

#include <array>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>
#include <algorithm>
#include <unordered_map>

extern "C" {

// ---------------------------------------------------------------- union-find
struct UF {
    std::vector<int64_t> parent;
    explicit UF(size_t n) : parent(n) {
        for (size_t i = 0; i < n; ++i) parent[i] = (int64_t)i;
    }
    int64_t find(int64_t x) {
        while (parent[x] != x) {
            parent[x] = parent[parent[x]];
            x = parent[x];
        }
        return x;
    }
    void unite(int64_t a, int64_t b) {
        a = find(a); b = find(b);
        if (a == b) return;
        if (a < b) parent[b] = a; else parent[a] = b;
    }
};

// Two-pass connected components over a 3D uint8 foreground mask.
// labels_out must hold x*y*z int32. connectivity: 6 or 26.
// Returns the number of components.
int64_t cc3d_label(const uint8_t* fg, int64_t x, int64_t y, int64_t z,
                   int32_t connectivity, int32_t* labels_out) {
    const int64_t n = x * y * z;
    std::vector<int32_t> lab(n, 0);
    // provisional labels, merging with already-visited neighbors
    // neighbor offsets with strictly smaller linear index
    std::vector<std::array<int64_t, 3>> offs;
    for (int64_t dx = -1; dx <= 0; ++dx)
        for (int64_t dy = -1; dy <= 1; ++dy)
            for (int64_t dz = -1; dz <= 1; ++dz) {
                if (dx == 0 && (dy > 0 || (dy == 0 && dz >= 0))) continue;
                if (connectivity == 6 &&
                    (std::abs(dx) + std::abs(dy) + std::abs(dz)) != 1) continue;
                offs.push_back({dx, dy, dz});
            }

    UF uf(1);
    int32_t next = 1;
    uf.parent.reserve(1 << 16);
    for (int64_t i = 0; i < x; ++i)
        for (int64_t j = 0; j < y; ++j)
            for (int64_t k = 0; k < z; ++k) {
                const int64_t idx = (i * y + j) * z + k;
                if (!fg[idx]) continue;
                int32_t current = 0;
                for (auto& o : offs) {
                    const int64_t ni = i + o[0], nj = j + o[1], nk = k + o[2];
                    if (ni < 0 || nj < 0 || nk < 0 || ni >= x || nj >= y || nk >= z)
                        continue;
                    const int32_t nl = lab[(ni * y + nj) * z + nk];
                    if (!nl) continue;
                    if (!current) current = nl;
                    else uf.unite(current, nl);
                }
                if (!current) {
                    current = next++;
                    uf.parent.push_back(current);
                }
                lab[idx] = current;
            }

    // second pass: resolve + compact ids
    std::vector<int32_t> compact(next, 0);
    int32_t n_comp = 0;
    for (int64_t idx = 0; idx < n; ++idx) {
        if (!lab[idx]) { labels_out[idx] = 0; continue; }
        const int64_t root = uf.find(lab[idx]);
        if (!compact[root]) compact[root] = ++n_comp;
        labels_out[idx] = compact[root];
    }
    return n_comp;
}

// Sorted-LUT value remap: replaces values of `keys` with `vals` in x (in place).
void remap_i64(int64_t* x, int64_t n, const int64_t* keys, const int64_t* vals,
               int64_t n_keys) {
    std::vector<std::pair<int64_t, int64_t>> kv(n_keys);
    for (int64_t i = 0; i < n_keys; ++i) kv[i] = {keys[i], vals[i]};
    std::sort(kv.begin(), kv.end());
    for (int64_t i = 0; i < n; ++i) {
        auto it = std::lower_bound(
            kv.begin(), kv.end(), std::make_pair(x[i], INT64_MIN));
        if (it != kv.end() && it->first == x[i]) x[i] = it->second;
    }
}

// Compact nonzero ids to 1..N in place; returns N.
int64_t renumber_i64(int64_t* x, int64_t n) {
    std::unordered_map<int64_t, int64_t> m;
    m.reserve(1024);
    int64_t next = 1;
    for (int64_t i = 0; i < n; ++i) {
        if (!x[i]) continue;
        auto it = m.find(x[i]);
        if (it == m.end()) { m.emplace(x[i], next); x[i] = next; ++next; }
        else x[i] = it->second;
    }
    return next - 1;
}

}  // extern "C"
