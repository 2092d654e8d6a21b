// hnsw_ref.cpp — fast in-memory CPU implementation of the pg_embedding
// flat-NSW algorithm (single layer, entry point node 0, Malkov diversity
// pruning, ef-bounded best-first search).
//
// Role in this project (see SURVEY.md §6): the CPU *baseline* the TPU engine
// is benchmarked against (bench.py measures its single-thread QPS and build
// rate on the same data), and a fast oracle for large-scale parity tests —
// the Python refimpl (core/refimpl.py) pins the same semantics but is too
// slow beyond a few thousand nodes.
//
// Algorithm semantics follow the reference implementation behavior
// (reference files: hnswalg.cpp:42-291, embedding.c:224 for maxM=2*M,
// distfunc.c:121-155 for the metric formulas). Written from scratch as an
// in-memory engine: flat arrays instead of Postgres pages, std::priority_queue
// for the two heaps, a per-search epoch-stamped visited array instead of a
// growable bitmap.
//
// Build: g++ -O3 -march=native -std=c++17 -shared -fPIC hnsw_ref.cpp -o libhnsw_ref.so

#include <cstdint>
#include <cstring>
#include <cmath>
#include <queue>
#include <vector>
#include <utility>
#include <algorithm>

namespace {

using std::size_t;
using idx_t = int32_t;
using label_t = uint64_t;

enum Metric { METRIC_L2 = 0, METRIC_COSINE = 1, METRIC_MANHATTAN = 2 };

// max-heap of (dist, idx) — mirrors std::priority_queue<std::pair<...>>
// ordering in the reference (ties: larger idx on top)
using Pair = std::pair<float, idx_t>;
using MaxHeap = std::priority_queue<Pair>;

struct Index {
    int dims;
    int m;
    int max_m;       // 2*m (embedding.c:224)
    int ef_construction;
    Metric metric;

    std::vector<float> vectors;          // [n, dims] flat
    std::vector<idx_t> links;            // [n, max_m] flat, -1 padded
    std::vector<int> link_counts;        // [n]
    std::vector<label_t> labels;         // [n]
    std::vector<uint8_t> deleted;        // [n] tombstones
    std::vector<uint32_t> visit_epoch;   // [n] search-visited stamps
    uint32_t epoch = 0;

    int n() const { return (int)link_counts.size(); }
    const float* vec(idx_t i) const { return vectors.data() + (size_t)i * dims; }
    idx_t* lnk(idx_t i) { return links.data() + (size_t)i * max_m; }

    float dist(const float* a, const float* b) const {
        switch (metric) {
        case METRIC_L2: {
            float s = 0.f;
            for (int i = 0; i < dims; ++i) { float d = a[i] - b[i]; s += d * d; }
            return std::sqrt(s);
        }
        case METRIC_COSINE: {
            float dot = 0.f, na = 0.f, nb = 0.f;
            for (int i = 0; i < dims; ++i) { dot += a[i] * b[i]; na += a[i] * a[i]; nb += b[i] * b[i]; }
            double denom = std::sqrt((double)na * (double)nb);
            return denom > 0 ? (float)(1.0 - dot / denom) : 1.f;
        }
        default: {
            float s = 0.f;
            for (int i = 0; i < dims; ++i) s += std::fabs(a[i] - b[i]);
            return s;
        }
        }
    }

    // searchBaseLayer semantics (hnswalg.cpp:42-114): best-first, ef-bounded
    MaxHeap search_base(const float* q, size_t ef) {
        MaxHeap top;
        if (n() == 0) return top;
        if (++epoch == 0) { std::fill(visit_epoch.begin(), visit_epoch.end(), 0); epoch = 1; }

        MaxHeap cand;  // stores (-dist, idx): max-heap pops nearest first
        float d0 = dist(q, vec(0));
        top.emplace(d0, 0);
        cand.emplace(-d0, 0);
        visit_epoch[0] = epoch;
        float lower_bound = d0;

        while (!cand.empty()) {
            Pair cur = cand.top();
            if (-cur.first > lower_bound) break;   // termination rule
            cand.pop();
            idx_t u = cur.second;
            const idx_t* nb = lnk(u);
            int cnt = link_counts[u];
            for (int j = 0; j < cnt; ++j) {
                idx_t v = nb[j];
                if (visit_epoch[v] == epoch) continue;
                visit_epoch[v] = epoch;
                float d = dist(q, vec(v));
                if (top.size() < ef || top.top().first > d) {   // gating rule
                    cand.emplace(-d, v);
                    top.emplace(d, v);
                    if (top.size() > ef) top.pop();
                    lower_bound = top.top().first;
                }
            }
        }
        return top;
    }

    // getNeighborsByHeuristic semantics (hnswalg.cpp:117-153):
    // scan nearest-first; keep c iff no kept r has dist(c, r) < dist(c, q).
    // pairs arrive as (dist_to_anchor, idx); result in selection order.
    void heuristic(std::vector<Pair>& pairs, size_t nn) {
        if (pairs.size() < nn) {
            // unpruned: reference leaves the max-heap untouched, so the
            // consumer pops farthest-first — reproduce by sorting descending
            std::sort(pairs.begin(), pairs.end(),
                      [](const Pair& a, const Pair& b) { return a > b; });
            return;
        }
        // nearest-first with larger-idx tie-break (max-heap of (-d, idx))
        std::sort(pairs.begin(), pairs.end(),
                  [](const Pair& a, const Pair& b) {
                      if (a.first != b.first) return a.first < b.first;
                      return a.second > b.second;
                  });
        std::vector<Pair> kept;
        kept.reserve(nn);
        for (const Pair& c : pairs) {
            if (kept.size() >= nn) break;
            bool good = true;
            for (const Pair& r : kept) {
                if (dist(vec(r.second), vec(c.second)) < c.first) { good = false; break; }
            }
            if (good) kept.push_back(c);
        }
        pairs.swap(kept);
    }

    // bindPoint + mutuallyConnectNewElement semantics (hnswalg.cpp:155-232)
    void connect(idx_t cur) {
        MaxHeap top = search_base(vec(cur), ef_construction);
        std::vector<Pair> cands;
        cands.reserve(top.size());
        while (!top.empty()) { cands.push_back(top.top()); top.pop(); }
        heuristic(cands, m);

        idx_t* row = lnk(cur);
        int k = (int)cands.size();
        for (int i = 0; i < k; ++i) row[i] = cands[i].second;
        link_counts[cur] = k;

        for (int i = 0; i < k; ++i) {
            idx_t r = cands[i].second;
            int rc = link_counts[r];
            idx_t* rrow = lnk(r);
            if (rc < max_m) {
                rrow[rc] = cur;                      // append
                link_counts[r] = rc + 1;
            } else {
                // overflow: re-select max_m best of {links(r) + cur} by
                // distance to r
                std::vector<Pair> rc_pairs;
                rc_pairs.reserve(rc + 1);
                rc_pairs.emplace_back(dist(vec(cur), vec(r)), cur);
                for (int j = 0; j < rc; ++j)
                    rc_pairs.emplace_back(dist(vec(rrow[j]), vec(r)), rrow[j]);
                heuristic(rc_pairs, max_m);
                int nk = (int)rc_pairs.size();
                for (int j = 0; j < nk; ++j) rrow[j] = rc_pairs[j].second;
                for (int j = nk; j < max_m; ++j) rrow[j] = -1;
                link_counts[r] = nk;
            }
        }
    }

    idx_t add(const float* pt, label_t label) {
        idx_t cur = n();
        vectors.insert(vectors.end(), pt, pt + dims);
        links.insert(links.end(), (size_t)max_m, -1);
        link_counts.push_back(0);
        labels.push_back(label);
        deleted.push_back(0);
        visit_epoch.push_back(0);
        if (cur != 0) connect(cur);   // node 0 binds with no links
        return cur;
    }

    // searchKnn semantics (hnswalg.cpp:234-252): truncate to ef, filter
    // tombstones, ascending output
    int search(const float* q, size_t ef, label_t* out_labels,
               float* out_dists) {
        MaxHeap top = search_base(q, ef);
        while (top.size() > ef) top.pop();
        std::vector<Pair> res;
        res.reserve(top.size());
        while (!top.empty()) {
            Pair p = top.top(); top.pop();
            if (!deleted[p.second]) res.push_back(p);
        }
        int cnt = (int)res.size();
        for (int i = 0; i < cnt; ++i) {           // reverse: ascending
            const Pair& p = res[cnt - 1 - i];
            out_labels[i] = labels[p.second];
            if (out_dists) out_dists[i] = p.first;
        }
        return cnt;
    }
};

}  // namespace

extern "C" {

void* hnsw_ref_create(int dims, int m, int ef_construction, int metric) {
    Index* h = new Index();
    h->dims = dims;
    h->m = m;
    h->max_m = 2 * m;
    h->ef_construction = ef_construction;
    h->metric = (Metric)metric;
    return h;
}

void hnsw_ref_free(void* h) { delete (Index*)h; }

int hnsw_ref_add(void* h, const float* pt, uint64_t label) {
    return ((Index*)h)->add(pt, label);
}

void hnsw_ref_build(void* h, const float* pts, const uint64_t* labels,
                    int count) {
    Index* idx = (Index*)h;
    idx->vectors.reserve((size_t)count * idx->dims);
    idx->links.reserve((size_t)count * idx->max_m);
    for (int i = 0; i < count; ++i)
        idx->add(pts + (size_t)i * idx->dims, labels ? labels[i] : (uint64_t)i);
}

int hnsw_ref_search(void* h, const float* q, int ef, uint64_t* out_labels,
                    float* out_dists) {
    return ((Index*)h)->search(q, (size_t)ef, out_labels, out_dists);
}

int hnsw_ref_n_nodes(void* h) { return ((Index*)h)->n(); }

int hnsw_ref_delete_label(void* h, uint64_t label) {
    Index* idx = (Index*)h;
    int cnt = 0;
    for (int i = 0; i < idx->n(); ++i)
        if (idx->labels[i] == label && !idx->deleted[i]) {
            idx->deleted[i] = 1;
            ++cnt;
        }
    return cnt;
}

// graph introspection (for parity tests): copies node's links into out
// (capacity >= max_m); returns link count
int hnsw_ref_get_links(void* h, int node, int32_t* out) {
    Index* idx = (Index*)h;
    if (node < 0 || node >= idx->n()) return -1;
    int cnt = idx->link_counts[node];
    std::memcpy(out, idx->lnk(node), sizeof(int32_t) * cnt);
    return cnt;
}

}  // extern "C"
