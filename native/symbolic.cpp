// Native symbolic-analysis library for clarabel_tpu.
//
// Host-side graph algorithmics on the hot setup path: fill-reducing
// ordering and symbolic Cholesky factorization of sparsity patterns.
// This is the TPU-native framework's counterpart of the native code the
// reference delegates to (QDLDL's AMD + symbolic stage; reference:
// src/kktsolvers/direct-ldl/directldl_qdldl.jl) — the numeric
// factorization itself runs on-chip, but pattern analysis is inherently
// serial pointer-chasing and belongs in optimized native host code.
//
// Exposed via a plain C ABI for ctypes binding (no pybind11 dependency).
//
// Build:  g++ -O2 -shared -fPIC -o libclarabel_symbolic.so symbolic.cpp

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

extern "C" {

// Greedy minimum-degree ordering with fill tracking.
//
// Graph given as adjacency in compressed form: neighbors of vertex v are
// adj[ptr[v]..ptr[v+1]).  Writes perm[k] = vertex eliminated at step k.
// Returns 0 on success.
int cl_min_degree_order(int64_t n, const int64_t* ptr, const int64_t* idx,
                        int64_t* perm) {
    std::vector<std::vector<int64_t>> adj(n);
    for (int64_t v = 0; v < n; ++v) {
        adj[v].assign(idx + ptr[v], idx + ptr[v + 1]);
        std::sort(adj[v].begin(), adj[v].end());
    }
    std::vector<char> alive(n, 1);
    std::vector<int64_t> degree(n);
    for (int64_t v = 0; v < n; ++v) degree[v] = (int64_t)adj[v].size();

    // simple binary-heap-free selection: O(n^2) scan but with tiny
    // constant; patterns here are cone-sized (n <= a few thousand)
    for (int64_t k = 0; k < n; ++k) {
        int64_t best = -1, best_deg = INT64_MAX;
        for (int64_t v = 0; v < n; ++v) {
            if (alive[v] && degree[v] < best_deg) {
                best = v;
                best_deg = degree[v];
            }
        }
        perm[k] = best;
        alive[best] = 0;

        // collect live neighbors
        std::vector<int64_t> nbrs;
        nbrs.reserve(adj[best].size());
        for (int64_t u : adj[best])
            if (alive[u]) nbrs.push_back(u);

        // clique the neighbors (add fill), update degrees
        for (size_t i = 0; i < nbrs.size(); ++i) {
            int64_t u = nbrs[i];
            auto& au = adj[u];
            // remove 'best'
            au.erase(std::remove(au.begin(), au.end(), best), au.end());
            for (size_t j = 0; j < nbrs.size(); ++j) {
                if (i == j) continue;
                int64_t w = nbrs[j];
                if (!std::binary_search(au.begin(), au.end(), w)) {
                    au.insert(std::lower_bound(au.begin(), au.end(), w), w);
                }
            }
            // recompute live degree
            int64_t d = 0;
            for (int64_t x : au)
                if (alive[x]) ++d;
            degree[u] = d;
        }
        adj[best].clear();
    }
    return 0;
}

// Symbolic Cholesky of the permuted pattern.
//
// Inputs: graph (ptr, idx) as above, permutation perm (perm[k] = original
// vertex at elimination position k).  Outputs the below-diagonal pattern
// of L in permuted coordinates as CSC-ish (lp, li): column j's rows are
// li[lp[j]..lp[j+1]).  `li_cap` caps the output; returns required nnz,
// or -1 on overflow (caller re-allocs and retries).
int64_t cl_symbolic_cholesky(int64_t n, const int64_t* ptr,
                             const int64_t* idx, const int64_t* perm,
                             int64_t* lp, int64_t* li, int64_t li_cap) {
    std::vector<int64_t> iperm(n);
    for (int64_t k = 0; k < n; ++k) iperm[perm[k]] = k;

    // permuted below-diagonal adjacency
    std::vector<std::vector<int64_t>> acol(n);
    for (int64_t v = 0; v < n; ++v) {
        int64_t jv = iperm[v];
        for (int64_t t = ptr[v]; t < ptr[v + 1]; ++t) {
            int64_t ju = iperm[idx[t]];
            if (ju > jv) acol[jv].push_back(ju);
        }
    }

    // column-merge recurrence via first-child union
    std::vector<std::vector<int64_t>> lcol(n);
    std::vector<std::vector<int64_t>> children(n);
    std::vector<char> mark(n, 0);

    int64_t nnz = 0;
    for (int64_t j = 0; j < n; ++j) {
        std::vector<int64_t> patt;
        for (int64_t r : acol[j]) {
            if (!mark[r]) { mark[r] = 1; patt.push_back(r); }
        }
        for (int64_t c : children[j]) {
            for (int64_t r : lcol[c]) {
                if (r != j && !mark[r]) { mark[r] = 1; patt.push_back(r); }
            }
        }
        for (int64_t r : patt) mark[r] = 0;
        std::sort(patt.begin(), patt.end());
        lcol[j] = std::move(patt);
        if (!lcol[j].empty()) children[lcol[j][0]].push_back(j);
        nnz += (int64_t)lcol[j].size();
    }

    if (nnz > li_cap) return -1;
    int64_t pos = 0;
    for (int64_t j = 0; j < n; ++j) {
        lp[j] = pos;
        for (int64_t r : lcol[j]) li[pos++] = r;
    }
    lp[n] = pos;
    return nnz;
}

// Elimination tree of the permuted pattern: parent[j] = first
// below-diagonal row of column j of L, or -1.
int cl_etree(int64_t n, const int64_t* lp, const int64_t* li,
             int64_t* parent) {
    for (int64_t j = 0; j < n; ++j)
        parent[j] = (lp[j + 1] > lp[j]) ? li[lp[j]] : -1;
    return 0;
}

}  // extern "C"
