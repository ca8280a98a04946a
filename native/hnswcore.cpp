// hnswcore: native host-side HNSW graph engine.
//
// The reference implements its entire runtime natively (Rust on pgrx);
// here the TPU compute path is JAX/XLA, and this module is the native
// implementation of the *host* graph runtime: sequential build, insert,
// and scan over an in-memory arena — the counterpart of the reference's
// pure algorithm layer (graph/mod.rs: search_layer Alg. 2,
// select_neighbors Alg. 4, find_element_neighbors Alg. 1,
// update_neighbor_connections) plus build-path duplicate folding
// (build.rs:474-510) and entry promotion (build.rs:523-528).
//
// Semantics intentionally match pgvector_rx_tpu/graph/host.py item for
// item (including (distance, idx) tie-breaking) so the Python and native
// engines are interchangeable and cross-validated by tests.
//
// Exposed as a C ABI consumed via ctypes (pgvector_rx_tpu/native).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <random>
#include <vector>

namespace {

enum Metric { L2 = 0, IP = 1, COSINE = 2, L1 = 3 };

struct Cand {
    float d;
    int32_t idx;
};

// min-heap by (d, idx): nearest first, ties -> smaller idx (heapq parity)
struct NearerFirst {
    bool operator()(const Cand& a, const Cand& b) const {
        if (a.d != b.d) return a.d > b.d;
        return a.idx > b.idx;
    }
};
// max-heap by d, ties -> smaller idx on top (python (-d, idx) parity)
struct FartherFirst {
    bool operator()(const Cand& a, const Cand& b) const {
        if (a.d != b.d) return a.d < b.d;
        return a.idx > b.idx;
    }
};

struct Element {
    int32_t level = 0;
    bool deleted = false;
    // neighbors[layer] -> list of (d, idx), capacity lm
    std::vector<std::vector<Cand>> neighbors;
    std::vector<int64_t> tids;
};

struct Handle {
    int dim;
    int m;
    int efc;
    Metric metric;
    std::vector<float> values;  // row-major [n, dim]
    std::vector<Element> elements;
    int32_t entry = -1;
    // epoch-stamped visited set (no clearing between searches)
    std::vector<uint32_t> visit_mark;
    uint32_t visit_epoch = 0;

    const float* row(int32_t i) const { return values.data() + (size_t)i * dim; }

    float dist(const float* a, const float* b) const {
        float acc = 0.f;
        switch (metric) {
            case L2:
                for (int i = 0; i < dim; i++) {
                    float t = a[i] - b[i];
                    acc += t * t;
                }
                return acc;
            case IP:
                for (int i = 0; i < dim; i++) acc += a[i] * b[i];
                return -acc;
            case COSINE: {
                for (int i = 0; i < dim; i++) acc += a[i] * b[i];
                double s = acc;
                if (s > 1.0) s = 1.0;
                if (s < -1.0) s = -1.0;
                return (float)(1.0 - s);
            }
            case L1:
                for (int i = 0; i < dim; i++) acc += std::fabs(a[i] - b[i]);
                return acc;
        }
        return acc;
    }
};

inline int layer_m(int m, int layer) { return layer == 0 ? 2 * m : m; }

// HNSW Algorithm 2 (graph/mod.rs:161-255 / host.py search_layer)
std::vector<Cand> search_layer(Handle* h, const float* q,
                               const std::vector<Cand>& entry_points, int ef,
                               int layer) {
    if (++h->visit_epoch == 0) {  // epoch wrap: reset marks
        std::fill(h->visit_mark.begin(), h->visit_mark.end(), 0u);
        h->visit_epoch = 1;
    }
    h->visit_mark.resize(h->elements.size(), 0u);
    const uint32_t epoch = h->visit_epoch;

    std::priority_queue<Cand, std::vector<Cand>, NearerFirst> candidates;
    std::priority_queue<Cand, std::vector<Cand>, FartherFirst> results;
    size_t w_len = 0;

    for (const Cand& ep : entry_points) {
        h->visit_mark[ep.idx] = epoch;
        candidates.push(ep);
        results.push(ep);
        w_len++;
    }

    while (!candidates.empty()) {
        Cand c = candidates.top();
        candidates.pop();
        float f_dist = results.empty() ? INFINITY : results.top().d;
        if (c.d > f_dist) break;

        const Element& ce = h->elements[c.idx];
        if (ce.level < layer) continue;

        for (const Cand& nb : ce.neighbors[layer]) {
            int32_t ni = nb.idx;
            if (h->visit_mark[ni] == epoch) continue;
            h->visit_mark[ni] = epoch;
            const Element& ne = h->elements[ni];
            if (ne.deleted || ne.level < layer) continue;

            bool always_add = w_len < (size_t)ef;
            f_dist = results.empty() ? INFINITY : results.top().d;
            float ed = h->dist(q, h->row(ni));
            if (ed < f_dist || always_add) {
                Cand e{ed, ni};
                candidates.push(e);
                results.push(e);
                w_len++;
                if (w_len > (size_t)ef) {
                    results.pop();
                    w_len--;
                }
            }
        }
    }

    std::vector<Cand> out;
    out.reserve(w_len);
    while (!results.empty()) {
        out.push_back(results.top());
        results.pop();
    }
    // nearest first; ties by smaller idx (python sorted((d, idx)) parity
    // — heap pop order alone reverses tie order)
    std::sort(out.begin(), out.end(), [](const Cand& a, const Cand& b) {
        if (a.d != b.d) return a.d < b.d;
        return a.idx < b.idx;
    });
    return out;
}

// HNSW Algorithm 4 heuristic (graph/mod.rs:269-308)
std::vector<Cand> select_neighbors(Handle* h, const std::vector<Cand>& cands,
                                   int max_neighbors) {
    if ((int)cands.size() <= max_neighbors) return cands;
    std::vector<Cand> result, discarded;
    result.reserve(max_neighbors);
    for (const Cand& e : cands) {
        if ((int)result.size() >= max_neighbors) break;
        bool closer = true;
        const float* ev = h->row(e.idx);
        for (const Cand& r : result) {
            if (h->dist(ev, h->row(r.idx)) <= e.d) {
                closer = false;
                break;
            }
        }
        if (closer)
            result.push_back(e);
        else
            discarded.push_back(e);
    }
    for (const Cand& d : discarded) {
        if ((int)result.size() >= max_neighbors) break;
        result.push_back(d);
    }
    return result;
}

// HNSW Algorithm 1 (graph/mod.rs:355-427)
void find_element_neighbors(Handle* h, int32_t new_idx, int32_t entry_idx) {
    const float* q = h->row(new_idx);
    int new_level = h->elements[new_idx].level;
    int entry_level = h->elements[entry_idx].level;

    std::vector<Cand> ep{{h->dist(q, h->row(entry_idx)), entry_idx}};

    for (int lc = entry_level; lc > new_level; lc--) {
        auto w = search_layer(h, q, ep, 1, lc);
        if (!w.empty()) ep = {w[0]};
    }

    int start = std::min(new_level, entry_level);
    for (int lc = start; lc >= 0; lc--) {
        int lm = layer_m(h->m, lc);
        auto w = search_layer(h, q, ep, h->efc, lc);
        h->elements[new_idx].neighbors[lc] = select_neighbors(h, w, lm);
        ep = w;
    }
}

// Back-connections with pruning (graph/mod.rs:442-489)
void update_neighbor_connections(Handle* h, int32_t new_idx) {
    int new_level = h->elements[new_idx].level;
    for (int lc = new_level; lc >= 0; lc--) {
        int lm = layer_m(h->m, lc);
        auto snapshot = h->elements[new_idx].neighbors[lc];
        for (const Cand& hc : snapshot) {
            auto& nbrs = h->elements[hc.idx].neighbors[lc];
            Cand back{hc.d, new_idx};
            if ((int)nbrs.size() < lm) {
                nbrs.push_back(back);
            } else {
                std::vector<Cand> all = nbrs;
                all.push_back(back);
                std::sort(all.begin(), all.end(), [](const Cand& a, const Cand& b) {
                    if (a.d != b.d) return a.d < b.d;
                    return a.idx < b.idx;
                });
                nbrs = select_neighbors(h, all, lm);
            }
        }
    }
}

}  // namespace

extern "C" {

void* hnsw_create(int dim, int m, int ef_construction, int metric) {
    Handle* h = new Handle();
    h->dim = dim;
    h->m = m;
    h->efc = ef_construction;
    h->metric = (Metric)metric;
    return h;
}

void hnsw_destroy(void* hp) { delete (Handle*)hp; }

// Insert one prepared row; returns the element idx, or -(dup_idx+2) when
// the tid was absorbed into an existing duplicate element
// (build.rs:474-510: byte-equal zero-distance layer-0 neighbor with room).
int32_t hnsw_insert(void* hp, const float* vec, int level, int64_t tid) {
    Handle* h = (Handle*)hp;
    int32_t idx = (int32_t)h->elements.size();
    h->values.insert(h->values.end(), vec, vec + h->dim);
    Element e;
    e.level = level;
    e.neighbors.resize(level + 1);
    h->elements.push_back(std::move(e));

    if (h->entry < 0) {
        h->elements[idx].tids.push_back(tid);
        h->entry = idx;
        return idx;
    }

    find_element_neighbors(h, idx, h->entry);

    // duplicate folding: byte-equal zero-distance layer-0 neighbors
    for (const Cand& nb : h->elements[idx].neighbors[0]) {
        if (nb.d != 0.0f) break;
        Element& dup = h->elements[nb.idx];
        if (!dup.deleted && !dup.tids.empty() && dup.tids.size() < 10 &&
            std::memcmp(h->row(idx), h->row(nb.idx),
                        sizeof(float) * h->dim) == 0) {
            dup.tids.push_back(tid);
            // roll back the provisional element
            h->elements.pop_back();
            h->values.resize((size_t)idx * h->dim);
            return -(nb.idx + 2);
        }
    }

    update_neighbor_connections(h, idx);
    h->elements[idx].tids.push_back(tid);
    if (h->elements[idx].level > h->elements[h->entry].level) h->entry = idx;
    return idx;
}

int32_t hnsw_bulk_insert(void* hp, const float* vecs, const int* levels,
                         const int64_t* tids, int n) {
    Handle* h = (Handle*)hp;
    for (int i = 0; i < n; i++) {
        hnsw_insert(hp, vecs + (size_t)i * h->dim, levels[i], tids[i]);
    }
    return (int32_t)h->elements.size();
}

int32_t hnsw_n_elements(void* hp) {
    return (int32_t)((Handle*)hp)->elements.size();
}

int32_t hnsw_entry(void* hp) { return ((Handle*)hp)->entry; }

int32_t hnsw_element_level(void* hp, int32_t idx) {
    return ((Handle*)hp)->elements[idx].level;
}

int32_t hnsw_element_tids(void* hp, int32_t idx, int64_t* out, int cap) {
    Handle* h = (Handle*)hp;
    const auto& t = h->elements[idx].tids;
    int n = std::min((int)t.size(), cap);
    std::copy(t.begin(), t.begin() + n, out);
    return (int32_t)t.size();
}

int32_t hnsw_element_neighbors(void* hp, int32_t idx, int layer,
                               int32_t* out_ids, float* out_dists, int cap) {
    Handle* h = (Handle*)hp;
    const Element& e = h->elements[idx];
    if (layer > e.level) return 0;
    const auto& nb = e.neighbors[layer];
    int n = std::min((int)nb.size(), cap);
    for (int i = 0; i < n; i++) {
        out_ids[i] = nb[i].idx;
        out_dists[i] = nb[i].d;
    }
    return (int32_t)nb.size();
}

// Algorithm 5 scan: greedy descent + ef ground search; fills up to ef
// (element_id, order_distance) pairs, returns count.
int32_t hnsw_search(void* hp, const float* q, int ef, int32_t* out_ids,
                    float* out_dists) {
    Handle* h = (Handle*)hp;
    if (h->entry < 0) return 0;
    const Element& ee = h->elements[h->entry];
    if (ee.deleted) return 0;

    std::vector<Cand> ep{{h->dist(q, h->row(h->entry)), h->entry}};
    for (int lc = ee.level; lc >= 1; lc--) {
        auto w = search_layer(h, q, ep, 1, lc);
        if (w.empty()) return 0;
        ep = {w[0]};
    }
    auto w = search_layer(h, q, ep, ef, 0);
    int n = std::min((int)w.size(), ef);
    for (int i = 0; i < n; i++) {
        out_ids[i] = w[i].idx;
        out_dists[i] = w[i].d;
    }
    return n;
}

// Batch search convenience (OpenMP-free; callers thread if needed)
void hnsw_search_batch(void* hp, const float* queries, int bq, int ef,
                       int32_t* out_ids, float* out_dists) {
    Handle* h = (Handle*)hp;
    for (int b = 0; b < bq; b++) {
        int32_t* ids = out_ids + (size_t)b * ef;
        float* ds = out_dists + (size_t)b * ef;
        int n = hnsw_search(hp, queries + (size_t)b * h->dim, ef, ids, ds);
        for (int i = n; i < ef; i++) {
            ids[i] = -1;
            ds[i] = INFINITY;
        }
    }
}

}  // extern "C"
