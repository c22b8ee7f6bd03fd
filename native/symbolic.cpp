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

// ---------------------------------------------------------------------------
// Multilevel graph bisection (METIS-style): heavy-edge-matching coarsening,
// greedy BFS initial partition, Fiduccia–Mattheyses edge-cut refinement at
// every level, and a final greedy weighted vertex cover converting the edge
// cut into a vertex separator.  Used by the nested-dissection symbolic
// analysis (structure_nd.py) to partition the KKT quotient graph; raced in
// Python against the Fiedler and BFS orderings — smallest separator wins.
// ---------------------------------------------------------------------------

namespace {

struct Graph {
    int64_t n = 0;
    std::vector<int64_t> ptr, idx, ew;  // CSR adjacency + edge weights
    std::vector<int64_t> nw;            // node weights
    int64_t total_nw = 0;
};

struct Lcg {
    uint64_t s;
    explicit Lcg(uint64_t seed) : s(seed * 6364136223846793005ULL + 1) {}
    uint64_t next() {
        s = s * 6364136223846793005ULL + 1442695040888963407ULL;
        return s >> 33;
    }
};

// Heavy-edge matching: match[v] = partner (or v itself).  Returns the
// number of coarse nodes and fills cmap[v] = coarse id.
int64_t heavy_edge_match(const Graph& g, Lcg& rng,
                         std::vector<int64_t>& cmap) {
    std::vector<int64_t> order(g.n);
    for (int64_t i = 0; i < g.n; ++i) order[i] = i;
    for (int64_t i = g.n - 1; i > 0; --i)
        std::swap(order[i], order[rng.next() % (uint64_t)(i + 1)]);

    std::vector<int64_t> match(g.n, -1);
    for (int64_t oi = 0; oi < g.n; ++oi) {
        int64_t v = order[oi];
        if (match[v] >= 0) continue;
        int64_t best = -1, best_w = -1;
        for (int64_t t = g.ptr[v]; t < g.ptr[v + 1]; ++t) {
            int64_t u = g.idx[t];
            if (u == v || match[u] >= 0) continue;
            int64_t w = g.ew[t];
            if (w > best_w ||
                (w == best_w && best >= 0 && g.nw[u] < g.nw[best])) {
                best = u;
                best_w = w;
            }
        }
        if (best >= 0) { match[v] = best; match[best] = v; }
        else match[v] = v;
    }
    int64_t nc = 0;
    cmap.assign(g.n, -1);
    for (int64_t v = 0; v < g.n; ++v) {
        if (cmap[v] >= 0) continue;
        cmap[v] = nc;
        cmap[match[v]] = nc;  // match[v] == v for unmatched
        ++nc;
    }
    return nc;
}

Graph coarsen(const Graph& g, const std::vector<int64_t>& cmap, int64_t nc) {
    Graph c;
    c.n = nc;
    c.nw.assign(nc, 0);
    for (int64_t v = 0; v < g.n; ++v) c.nw[cmap[v]] += g.nw[v];
    c.total_nw = g.total_nw;

    // aggregate edges: process each coarse vertex's (<=2) fine
    // constituents consecutively so a last-seen stamp dedupes neighbors
    std::vector<std::vector<int64_t>> fines(nc);
    for (int64_t v = 0; v < g.n; ++v) fines[cmap[v]].push_back(v);
    std::vector<int64_t> last(nc, -1), pos(nc, -1);
    std::vector<std::vector<int64_t>> nb(nc), nbw(nc);
    for (int64_t cv = 0; cv < nc; ++cv) {
        for (int64_t v : fines[cv]) {
            for (int64_t t = g.ptr[v]; t < g.ptr[v + 1]; ++t) {
                int64_t cu = cmap[g.idx[t]];
                if (cu == cv) continue;
                if (last[cu] != cv) {
                    last[cu] = cv;
                    pos[cu] = (int64_t)nb[cv].size();
                    nb[cv].push_back(cu);
                    nbw[cv].push_back(0);
                }
                nbw[cv][pos[cu]] += g.ew[t];
            }
        }
    }
    c.ptr.assign(nc + 1, 0);
    for (int64_t cv = 0; cv < nc; ++cv)
        c.ptr[cv + 1] = c.ptr[cv] + (int64_t)nb[cv].size();
    c.idx.resize(c.ptr[nc]);
    c.ew.resize(c.ptr[nc]);
    for (int64_t cv = 0; cv < nc; ++cv) {
        int64_t base = c.ptr[cv];
        for (size_t i = 0; i < nb[cv].size(); ++i) {
            c.idx[base + (int64_t)i] = nb[cv][i];
            c.ew[base + (int64_t)i] = nbw[cv][i];
        }
    }
    return c;
}

// Greedy BFS initial bipartition: grow side 0 from a pseudo-peripheral
// seed until it holds ~half the node weight.
void initial_partition(const Graph& g, Lcg& rng, std::vector<int8_t>& side) {
    side.assign(g.n, 1);
    if (g.n == 0) return;
    // pseudo-peripheral: BFS from random node, take the last visited
    int64_t seed = (int64_t)(rng.next() % (uint64_t)g.n);
    std::vector<int64_t> q{seed};
    std::vector<char> seen(g.n, 0);
    seen[seed] = 1;
    int64_t lastv = seed;
    for (size_t h = 0; h < q.size(); ++h) {
        int64_t v = q[h];
        lastv = v;
        for (int64_t t = g.ptr[v]; t < g.ptr[v + 1]; ++t) {
            int64_t u = g.idx[t];
            if (!seen[u]) { seen[u] = 1; q.push_back(u); }
        }
    }
    // grow from lastv
    std::fill(seen.begin(), seen.end(), 0);
    q.assign(1, lastv);
    seen[lastv] = 1;
    int64_t grown = 0, half = g.total_nw / 2;
    for (size_t h = 0; h < q.size() && grown < half; ++h) {
        int64_t v = q[h];
        side[v] = 0;
        grown += g.nw[v];
        for (int64_t t = g.ptr[v]; t < g.ptr[v + 1]; ++t) {
            int64_t u = g.idx[t];
            if (!seen[u]) { seen[u] = 1; q.push_back(u); }
        }
    }
    // disconnected remainder: assign unreached nodes to the lighter side
    for (int64_t v = 0; v < g.n; ++v) {
        if (!seen[v] && grown < half) { side[v] = 0; grown += g.nw[v]; }
    }
}

int64_t cut_weight(const Graph& g, const std::vector<int8_t>& side) {
    int64_t cut = 0;
    for (int64_t v = 0; v < g.n; ++v)
        for (int64_t t = g.ptr[v]; t < g.ptr[v + 1]; ++t)
            if (side[v] != side[g.idx[t]]) cut += g.ew[t];
    return cut / 2;
}

// One FM pass: tentatively move every vertex once in gain order (greedy,
// balance-constrained), remember the best prefix, roll back the rest.
bool fm_pass(const Graph& g, std::vector<int8_t>& side, double max_frac) {
    const int64_t max_side = (int64_t)(max_frac * (double)g.total_nw);
    std::vector<int64_t> gain(g.n, 0), wside(2, 0);
    for (int64_t v = 0; v < g.n; ++v) {
        wside[side[v]] += g.nw[v];
        for (int64_t t = g.ptr[v]; t < g.ptr[v + 1]; ++t)
            gain[v] += (side[g.idx[t]] != side[v]) ? g.ew[t] : -g.ew[t];
    }
    std::vector<char> moved(g.n, 0);
    std::vector<int64_t> seq;
    seq.reserve(g.n);
    int64_t cur = 0, best = 0;
    size_t best_k = 0;
    for (int64_t step = 0; step < g.n; ++step) {
        int64_t bv = -1, bg = INT64_MIN;
        for (int64_t v = 0; v < g.n; ++v) {
            if (moved[v]) continue;
            int8_t to = 1 - side[v];
            if (wside[to] + g.nw[v] > max_side) continue;
            if (gain[v] > bg) { bg = gain[v]; bv = v; }
        }
        if (bv < 0) break;
        // move bv
        int8_t from = side[bv], to = 1 - from;
        side[bv] = to;
        wside[from] -= g.nw[bv];
        wside[to] += g.nw[bv];
        moved[bv] = 1;
        seq.push_back(bv);
        cur += bg;
        for (int64_t t = g.ptr[bv]; t < g.ptr[bv + 1]; ++t) {
            int64_t u = g.idx[t];
            // u's gain changes by ±2*ew depending on relation to bv
            gain[u] += (side[u] == to) ? -2 * g.ew[t] : 2 * g.ew[t];
        }
        if (cur > best) { best = cur; best_k = seq.size(); }
        if ((int64_t)seq.size() - (int64_t)best_k > 64) break;  // lookahead
    }
    // roll back moves after the best prefix
    for (size_t i = seq.size(); i > best_k; --i) {
        int64_t v = seq[i - 1];
        side[v] = 1 - side[v];
    }
    return best > 0;
}

}  // namespace

extern "C" {

// Multilevel bisection with vertex separator.
// side[v]: 0 = left, 1 = right, 2 = separator.  Returns 0 on success.
int cl_multilevel_bisect(int64_t n, const int64_t* ptr, const int64_t* idx,
                         const int64_t* wt, int64_t* side_out,
                         uint64_t seed) {
    if (n <= 1) {
        for (int64_t v = 0; v < n; ++v) side_out[v] = 0;
        return 0;
    }
    Graph g;
    g.n = n;
    g.ptr.assign(ptr, ptr + n + 1);
    g.idx.assign(idx, idx + ptr[n]);
    g.ew.assign(ptr[n], 1);
    g.nw.assign(wt, wt + n);
    for (int64_t v = 0; v < n; ++v) g.total_nw += g.nw[v];

    Lcg rng(seed ? seed : 12345);

    // ---- coarsen ----
    std::vector<Graph> levels;
    std::vector<std::vector<int64_t>> cmaps;
    levels.push_back(std::move(g));
    while (levels.back().n > 48) {
        std::vector<int64_t> cmap;
        int64_t nc = heavy_edge_match(levels.back(), rng, cmap);
        if (nc >= levels.back().n * 9 / 10) break;  // stalled
        Graph c = coarsen(levels.back(), cmap, nc);
        cmaps.push_back(std::move(cmap));
        levels.push_back(std::move(c));
    }

    // ---- initial partition at coarsest (best of 4 seeds) ----
    const Graph& cg = levels.back();
    std::vector<int8_t> side, best_side;
    int64_t best_cut = INT64_MAX;
    for (int tries = 0; tries < 4; ++tries) {
        initial_partition(cg, rng, side);
        for (int p = 0; p < 4 && fm_pass(cg, side, 0.62); ++p) {}
        int64_t cut = cut_weight(cg, side);
        if (cut < best_cut) { best_cut = cut; best_side = side; }
    }
    side = best_side;

    // ---- uncoarsen + refine ----
    for (int64_t lv = (int64_t)levels.size() - 2; lv >= 0; --lv) {
        const std::vector<int64_t>& cmap = cmaps[lv];
        std::vector<int8_t> fine(levels[lv].n);
        for (int64_t v = 0; v < levels[lv].n; ++v) fine[v] = side[cmap[v]];
        side = std::move(fine);
        for (int p = 0; p < 6 && fm_pass(levels[lv], side, 0.60); ++p) {}
    }

    // ---- vertex separator: greedy weighted vertex cover of cut edges ----
    const Graph& fg = levels[0];
    std::vector<int64_t> cutdeg(n, 0);
    for (int64_t v = 0; v < n; ++v)
        for (int64_t t = fg.ptr[v]; t < fg.ptr[v + 1]; ++t)
            if (side[v] != side[fg.idx[t]]) ++cutdeg[v];
    std::vector<char> insep(n, 0);
    while (true) {
        int64_t bv = -1;
        double bscore = 0.0;
        for (int64_t v = 0; v < n; ++v) {
            if (insep[v] || cutdeg[v] == 0) continue;
            double score = (double)cutdeg[v] /
                           (double)(fg.nw[v] > 0 ? fg.nw[v] : 1);
            if (score > bscore) { bscore = score; bv = v; }
        }
        if (bv < 0) break;
        insep[bv] = 1;
        cutdeg[bv] = 0;
        for (int64_t t = fg.ptr[bv]; t < fg.ptr[bv + 1]; ++t) {
            int64_t u = fg.idx[t];
            if (!insep[u] && side[u] != side[bv] && cutdeg[u] > 0)
                --cutdeg[u];
        }
    }
    for (int64_t v = 0; v < n; ++v)
        side_out[v] = insep[v] ? 2 : (int64_t)side[v];
    return 0;
}

}  // extern "C"
