// Native mesh-topology builder for ngsxfem_tpu.
//
// The runtime role NGSolve's C++ MeshAccess plays for the reference
// (element/facet/edge tables that every layer above consumes) is filled here
// by a small C++ library: hash-based facet deduplication and adjacency
// construction over structure-of-arrays element tensors.  Exposed through a
// plain C ABI and loaded via ctypes (no pybind11 dependency).
//
// Build: g++ -O3 -march=native -shared -fPIC topology.cpp -o libngsxtopo.so

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct KeyHash {
    size_t operator()(const std::vector<int32_t>& k) const {
        size_t h = 1469598103934665603ull;
        for (int32_t v : k) {
            h ^= static_cast<uint64_t>(v) + 0x9e3779b97f4a7c15ull;
            h *= 1099511628211ull;
        }
        return h;
    }
};

}  // namespace

extern "C" {

// Deduplicate facets and build adjacency.
//
// elements:   (ne * nvel) int32, element->vertex
// facet_loc:  (nfel * nvf) int32, local facet -> local vertices
// outputs (caller-allocated):
//   el2facet:  (ne * nfel) int32
//   facets:    (ne * nfel * nvf) int32  (only the first nf rows are valid)
//   facet2el:  (ne * nfel * 2) int32    (-1 where absent; first nf rows)
//   facet2elloc: same shape as facet2el
// returns nf (number of unique facets), or -1 on error.
int64_t build_facets(const int32_t* elements, int64_t ne, int32_t nvel,
                     const int32_t* facet_loc, int32_t nfel, int32_t nvf,
                     int32_t* el2facet, int32_t* facets, int32_t* facet2el,
                     int32_t* facet2elloc) {
    std::unordered_map<std::vector<int32_t>, int32_t, KeyHash> table;
    table.reserve(static_cast<size_t>(ne) * nfel);
    std::vector<int32_t> key(nvf);
    int32_t nf = 0;
    for (int64_t e = 0; e < ne; ++e) {
        const int32_t* ev = elements + e * nvel;
        for (int32_t lf = 0; lf < nfel; ++lf) {
            for (int32_t j = 0; j < nvf; ++j)
                key[j] = ev[facet_loc[lf * nvf + j]];
            // insertion-sort the (tiny) key
            for (int32_t a = 1; a < nvf; ++a) {
                int32_t val = key[a];
                int32_t b = a - 1;
                while (b >= 0 && key[b] > val) { key[b + 1] = key[b]; --b; }
                key[b + 1] = val;
            }
            auto it = table.find(key);
            int32_t f;
            if (it == table.end()) {
                f = nf++;
                table.emplace(key, f);
                for (int32_t j = 0; j < nvf; ++j)
                    facets[static_cast<int64_t>(f) * nvf + j] =
                        ev[facet_loc[lf * nvf + j]];
                facet2el[2 * static_cast<int64_t>(f)] = static_cast<int32_t>(e);
                facet2el[2 * static_cast<int64_t>(f) + 1] = -1;
                facet2elloc[2 * static_cast<int64_t>(f)] = lf;
                facet2elloc[2 * static_cast<int64_t>(f) + 1] = -1;
            } else {
                f = it->second;
                facet2el[2 * static_cast<int64_t>(f) + 1] = static_cast<int32_t>(e);
                facet2elloc[2 * static_cast<int64_t>(f) + 1] = lf;
            }
            el2facet[e * nfel + lf] = f;
        }
    }
    return nf;
}

// Deduplicate Lagrange-node fingerprints -> global dof numbering.
//
// keys: (n * klen) int64 rows.  out_inv: (n,) int32 row -> dof id.
// out_first: (n,) int64 (only the first ndof entries valid): first row of
// each dof.  Returns ndof.
int64_t dedup_rows(const int64_t* keys, int64_t n, int32_t klen,
                   int32_t* out_inv, int64_t* out_first) {
    struct RowHash {
        const int64_t* base;
        int32_t klen;
        size_t operator()(int64_t i) const {
            size_t h = 1469598103934665603ull;
            const int64_t* r = base + i * klen;
            for (int32_t j = 0; j < klen; ++j) {
                h ^= static_cast<uint64_t>(r[j]) + 0x9e3779b97f4a7c15ull;
                h *= 1099511628211ull;
            }
            return h;
        }
    };
    struct RowEq {
        const int64_t* base;
        int32_t klen;
        bool operator()(int64_t a, int64_t b) const {
            return std::memcmp(base + a * klen, base + b * klen,
                               sizeof(int64_t) * klen) == 0;
        }
    };
    RowHash rh{keys, klen};
    RowEq re{keys, klen};
    std::unordered_map<int64_t, int32_t, RowHash, RowEq> table(16, rh, re);
    table.reserve(static_cast<size_t>(n));
    int64_t ndof = 0;
    for (int64_t i = 0; i < n; ++i) {
        auto it = table.find(i);
        if (it == table.end()) {
            table.emplace(i, static_cast<int32_t>(ndof));
            out_first[ndof] = i;
            out_inv[i] = static_cast<int32_t>(ndof);
            ++ndof;
        } else {
            out_inv[i] = it->second;
        }
    }
    return ndof;
}

// Deduplicate single int64 keys (e.g. linearized (row, col) sparse-matrix
// coordinates for the ELL structure build) with an open-addressing table --
// much faster than the generic unordered_map path for klen == 1.
int64_t dedup_i64(const int64_t* keys, int64_t n, int32_t* out_inv,
                  int64_t* out_first) {
    uint64_t cap = 16;
    while (cap < static_cast<uint64_t>(n) * 2) cap <<= 1;
    const uint64_t mask = cap - 1;
    std::vector<int64_t> slot(cap, -1);  // -> unique id
    std::vector<int64_t> skey(cap);
    int64_t nu = 0;
    for (int64_t i = 0; i < n; ++i) {
        const int64_t k = keys[i];
        // splitmix64 finalizer
        uint64_t h = static_cast<uint64_t>(k) + 0x9e3779b97f4a7c15ull;
        h = (h ^ (h >> 30)) * 0xbf58476d1ce4e5b9ull;
        h = (h ^ (h >> 27)) * 0x94d049bb133111ebull;
        h ^= h >> 31;
        uint64_t p = h & mask;
        while (true) {
            const int64_t s = slot[p];
            if (s < 0) {
                slot[p] = nu;
                skey[p] = k;
                out_first[nu] = i;
                out_inv[i] = static_cast<int32_t>(nu);
                ++nu;
                break;
            }
            if (skey[p] == k) {
                out_inv[i] = static_cast<int32_t>(s);
                break;
            }
            p = (p + 1) & mask;
        }
    }
    return nu;
}

}  // extern "C"
