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

// ----------------------------------------------------------- Lee thinning
// 3D medial-axis thinning: the Lee-Kashyap-Chu (1994) framework the
// reference gets from skimage.morphology.skeletonize_3d
// (/root/reference/skoots/train/generate_skeletons.py:138) — iterative
// 6-subiteration border peeling, endpoint preservation, and
// topology-preserving deletion with sequential re-checking. The per-voxel
// deletability test uses the (26,6) simple-point characterization
// (Bertrand & Malandain: exactly one 26-connected object component in
// N26*(p), and the background 6-neighbors of p all lie in one 6-connected
// background component of N18(p)) — equivalent to the paper's Euler-LUT +
// octree-recursion pair, without transcribing its tables.

static inline int nb_index(int di, int dj, int dk) {
    return (di + 1) * 9 + (dj + 1) * 3 + (dk + 1);
}

// gather the 3x3x3 neighborhood of (i,j,k); out-of-volume = background
static void lee_gather(const uint8_t* v, int64_t i, int64_t j, int64_t k,
                       int64_t x, int64_t y, int64_t z, uint8_t nb[27]) {
    int t = 0;
    for (int di = -1; di <= 1; ++di)
        for (int dj = -1; dj <= 1; ++dj)
            for (int dk = -1; dk <= 1; ++dk, ++t) {
                const int64_t ni = i + di, nj = j + dj, nk = k + dk;
                nb[t] = (ni >= 0 && nj >= 0 && nk >= 0 && ni < x && nj < y &&
                         nk < z && v[(ni * y + nj) * z + nk])
                            ? 1 : 0;
            }
}

// object voxels of N26*(p) form exactly one 26-connected component
static bool lee_one_object_comp(const uint8_t nb[27]) {
    int total = 0, start = -1;
    for (int t = 0; t < 27; ++t)
        if (t != 13 && nb[t]) { ++total; if (start < 0) start = t; }
    if (total == 0) return false;
    bool seen[27] = {false};
    int stack[26], sp = 0, cnt = 0;
    stack[sp++] = start;
    seen[start] = true;
    while (sp) {
        const int t = stack[--sp];
        ++cnt;
        const int ti = t / 9 - 1, tj = (t / 3) % 3 - 1, tk = t % 3 - 1;
        for (int di = -1; di <= 1; ++di)
            for (int dj = -1; dj <= 1; ++dj)
                for (int dk = -1; dk <= 1; ++dk) {
                    const int ni = ti + di, nj = tj + dj, nk = tk + dk;
                    if (ni < -1 || ni > 1 || nj < -1 || nj > 1 || nk < -1 ||
                        nk > 1)
                        continue;
                    const int u = nb_index(ni, nj, nk);
                    if (u == 13 || seen[u] || !nb[u]) continue;
                    seen[u] = true;
                    stack[sp++] = u;
                }
    }
    return cnt == total;
}

// all background 6-neighbors of p lie in ONE 6-connected background
// component of N18(p) (corners and center excluded from the walk)
static bool lee_one_bg_comp(const uint8_t nb[27]) {
    static const int faces[6] = {nb_index(1, 0, 0),  nb_index(-1, 0, 0),
                                 nb_index(0, 1, 0),  nb_index(0, -1, 0),
                                 nb_index(0, 0, 1),  nb_index(0, 0, -1)};
    int seed = -1, n_bg_faces = 0;
    for (int f = 0; f < 6; ++f)
        if (!nb[faces[f]]) { ++n_bg_faces; if (seed < 0) seed = faces[f]; }
    if (n_bg_faces == 0) return false;
    bool seen[27] = {false};
    int stack[18], sp = 0;
    stack[sp++] = seed;
    seen[seed] = true;
    while (sp) {
        const int t = stack[--sp];
        const int ti = t / 9 - 1, tj = (t / 3) % 3 - 1, tk = t % 3 - 1;
        static const int d6[6][3] = {{1, 0, 0},  {-1, 0, 0}, {0, 1, 0},
                                     {0, -1, 0}, {0, 0, 1},  {0, 0, -1}};
        for (auto& o : d6) {
            const int ni = ti + o[0], nj = tj + o[1], nk = tk + o[2];
            if (ni < -1 || ni > 1 || nj < -1 || nj > 1 || nk < -1 || nk > 1)
                continue;
            const int manh = (ni < 0 ? -ni : ni) + (nj < 0 ? -nj : nj) +
                             (nk < 0 ? -nk : nk);
            if (manh == 0 || manh == 3) continue;  // center / corner: not N18
            const int u = nb_index(ni, nj, nk);
            if (seen[u] || nb[u]) continue;
            seen[u] = true;
            stack[sp++] = u;
        }
    }
    for (int f = 0; f < 6; ++f)
        if (!nb[faces[f]] && !seen[faces[f]]) return false;
    return true;
}

static bool lee_deletable(const uint8_t* v, int64_t i, int64_t j, int64_t k,
                          int64_t x, int64_t y, int64_t z) {
    uint8_t nb[27];
    lee_gather(v, i, j, k, x, y, z, nb);
    int nc = 0;
    for (int t = 0; t < 27; ++t)
        if (t != 13 && nb[t]) ++nc;
    if (nc < 2) return false;  // endpoint (or isolated): preserve
    return lee_one_object_comp(nb) && lee_one_bg_comp(nb);
}

// In-place 3D medial-axis thinning of a uint8 mask (nonzero = object).
// Returns the number of voxels deleted.
int64_t lee_thin_3d(uint8_t* vol, int64_t x, int64_t y, int64_t z) {
    static const int dirs[6][3] = {{0, 0, 1}, {0, 0, -1}, {0, -1, 0},
                                   {0, 1, 0}, {1, 0, 0},  {-1, 0, 0}};
    std::vector<int64_t> cand;
    int64_t deleted = 0;
    bool changed = true;
    while (changed) {
        changed = false;
        for (auto& dir : dirs) {
            cand.clear();
            for (int64_t i = 0; i < x; ++i)
                for (int64_t j = 0; j < y; ++j)
                    for (int64_t k = 0; k < z; ++k) {
                        const int64_t idx = (i * y + j) * z + k;
                        if (!vol[idx]) continue;
                        const int64_t ni = i + dir[0], nj = j + dir[1],
                                      nk = k + dir[2];
                        const bool bg_nb =
                            !(ni >= 0 && nj >= 0 && nk >= 0 && ni < x &&
                              nj < y && nk < z &&
                              vol[(ni * y + nj) * z + nk]);
                        if (!bg_nb) continue;  // not a border point this pass
                        // require object support on the OPPOSITE side: a
                        // direction-d peel may take at most one layer off a
                        // d-facing surface. Without this, the sequential
                        // recheck can zipper a 1-voxel-thick ribbon end to
                        // end through cascading simple-point deletions
                        // (measured: even-diameter cylinders collapse from
                        // a full centerline to 2 voxels).
                        const int64_t oi = i - dir[0], oj = j - dir[1],
                                      ok_ = k - dir[2];
                        const bool obj_opp =
                            oi >= 0 && oj >= 0 && ok_ >= 0 && oi < x &&
                            oj < y && ok_ < z &&
                            vol[(oi * y + oj) * z + ok_];
                        if (!obj_opp) continue;
                        if (lee_deletable(vol, i, j, k, x, y, z))
                            cand.push_back(idx);
                    }
            // sequential re-check: simultaneous deletion of two adjacent
            // simple points can break connectivity (Lee 1994 sec. 4)
            for (const int64_t idx : cand) {
                const int64_t k2 = idx % z, j2 = (idx / z) % y,
                              i2 = idx / (z * y);
                if (lee_deletable(vol, i2, j2, k2, x, y, z)) {
                    vol[idx] = 0;
                    ++deleted;
                    changed = true;
                }
            }
        }
    }
    return deleted;
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
