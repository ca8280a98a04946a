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
// Supports all four value kinds of the reference: dense f32 rows
// (vector/halfvec storage is f32 here; halfvec converts at the type
// layer), packed-bit rows as u32 words (bit: hamming/jaccard,
// bitvec.rs:97-132), and padded-CSR sparse rows (sparsevec merge-join
// distances, sparsevec.rs:875-1090).
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

enum Metric { L2 = 0, IP = 1, COSINE = 2, L1 = 3, HAMMING = 4, JACCARD = 5 };
enum Kind { DENSE = 0, BIT = 1, SPARSE = 2 };

constexpr int32_t SP_PAD = INT32_MAX;  // sparse index padding (sorts last)

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

// A reference to one value row of whatever kind the handle stores.
struct RowRef {
    const float* f = nullptr;     // dense
    const uint32_t* w = nullptr;  // bit words
    const int32_t* si = nullptr;  // sparse indices
    const float* sv = nullptr;    // sparse values
};

float sparse_dist(Metric metric, const int32_t* ai, const float* av,
                  const int32_t* bi, const float* bv, int P) {
    // two-pointer merge join over sorted index rows (SP_PAD sorts last);
    // parity: sparsevec.rs:875-1090 / graph/device.py _sparse_dist
    double dot = 0.0, a2 = 0.0, b2 = 0.0;
    float acc = 0.f;  // l2 / l1 accumulator (f32, matching reference)
    int i = 0, j = 0;
    while (i < P || j < P) {
        int32_t aidx = i < P ? ai[i] : SP_PAD;
        int32_t bidx = j < P ? bi[j] : SP_PAD;
        if (aidx == SP_PAD && bidx == SP_PAD) break;
        if (aidx == bidx) {
            float x = av[i], y = bv[j];
            dot += (double)x * y;
            a2 += (double)x * x;
            b2 += (double)y * y;
            if (metric == L2) {
                float t = x - y;
                acc += t * t;
            } else if (metric == L1) {
                acc += std::fabs(x - y);
            }
            i++;
            j++;
        } else if (aidx < bidx) {
            float x = av[i];
            a2 += (double)x * x;
            if (metric == L2) acc += x * x;
            else if (metric == L1) acc += std::fabs(x);
            i++;
        } else {
            float y = bv[j];
            b2 += (double)y * y;
            if (metric == L2) acc += y * y;
            else if (metric == L1) acc += std::fabs(y);
            j++;
        }
    }
    switch (metric) {
        case L2:
        case L1:
            return acc;
        case IP:
            return (float)-dot;
        case COSINE: {
            double denom = std::sqrt(a2 * b2);
            double sim = denom > 0.0 ? dot / denom : 0.0;
            if (sim > 1.0) sim = 1.0;
            if (sim < -1.0) sim = -1.0;
            return (float)(1.0 - sim);
        }
        default:
            return 0.f;
    }
}

struct Handle {
    Kind kind = DENSE;
    int dim;    // dense: floats/row; bit: u32 words/row; sparse: pairs/row
    int m;
    int efc;
    Metric metric;
    std::vector<float> values;    // dense rows [n, dim]
    std::vector<uint32_t> words;  // bit rows [n, dim]
    std::vector<int32_t> sp_idx;  // sparse index rows [n, dim]
    std::vector<float> sp_val;    // sparse value rows [n, dim]
    std::vector<Element> elements;
    int32_t entry = -1;
    // epoch-stamped visited set (no clearing between searches)
    std::vector<uint32_t> visit_mark;
    uint32_t visit_epoch = 0;

    RowRef row(int32_t i) const {
        RowRef r;
        size_t off = (size_t)i * dim;
        switch (kind) {
            case DENSE:
                r.f = values.data() + off;
                break;
            case BIT:
                r.w = words.data() + off;
                break;
            case SPARSE:
                r.si = sp_idx.data() + off;
                r.sv = sp_val.data() + off;
                break;
        }
        return r;
    }

    size_t row_bytes() const {
        switch (kind) {
            case DENSE:
                return sizeof(float) * dim;
            case BIT:
                return sizeof(uint32_t) * dim;
            case SPARSE:
                return 0;  // handled specially (two arrays)
        }
        return 0;
    }

    bool rows_equal(int32_t a, int32_t b) const {
        size_t off_a = (size_t)a * dim, off_b = (size_t)b * dim;
        switch (kind) {
            case DENSE:
                return std::memcmp(values.data() + off_a, values.data() + off_b,
                                   row_bytes()) == 0;
            case BIT:
                return std::memcmp(words.data() + off_a, words.data() + off_b,
                                   row_bytes()) == 0;
            case SPARSE:
                return std::memcmp(sp_idx.data() + off_a, sp_idx.data() + off_b,
                                   sizeof(int32_t) * dim) == 0 &&
                       std::memcmp(sp_val.data() + off_a, sp_val.data() + off_b,
                                   sizeof(float) * dim) == 0;
        }
        return false;
    }

    float dist(const RowRef& a, const RowRef& b) const {
        switch (kind) {
            case DENSE: {
                float acc = 0.f;
                switch (metric) {
                    case L2:
                        for (int i = 0; i < dim; i++) {
                            float t = a.f[i] - b.f[i];
                            acc += t * t;
                        }
                        return acc;
                    case IP:
                        for (int i = 0; i < dim; i++) acc += a.f[i] * b.f[i];
                        return -acc;
                    case COSINE: {
                        for (int i = 0; i < dim; i++) acc += a.f[i] * b.f[i];
                        double s = acc;
                        if (s > 1.0) s = 1.0;
                        if (s < -1.0) s = -1.0;
                        return (float)(1.0 - s);
                    }
                    case L1:
                        for (int i = 0; i < dim; i++)
                            acc += std::fabs(a.f[i] - b.f[i]);
                        return acc;
                    default:
                        return acc;
                }
            }
            case BIT: {
                // bitvec.rs:97-132: hamming = popcount(xor); jaccard =
                // 1 - |A&B| / |A|B|, with 0/0 -> 1.0
                uint64_t x = 0, ab = 0, un = 0;
                for (int i = 0; i < dim; i++) {
                    x += (uint64_t)__builtin_popcount(a.w[i] ^ b.w[i]);
                    if (metric == JACCARD) {
                        ab += (uint64_t)__builtin_popcount(a.w[i] & b.w[i]);
                        un += (uint64_t)__builtin_popcount(a.w[i] | b.w[i]);
                    }
                }
                if (metric == HAMMING) return (float)x;
                if (ab == 0) return 1.0f;
                return (float)(1.0 - (double)ab / (double)un);
            }
            case SPARSE:
                return sparse_dist(metric, a.si, a.sv, b.si, b.sv, dim);
        }
        return 0.f;
    }
};

inline int layer_m(int m, int layer) { return layer == 0 ? 2 * m : m; }

// HNSW Algorithm 2 (graph/mod.rs:161-255 / host.py search_layer)
std::vector<Cand> search_layer(Handle* h, const RowRef& q,
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
        RowRef ev = h->row(e.idx);
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
    RowRef q = h->row(new_idx);
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

// Common insert body once the row is in the arena (kind-agnostic).
int32_t insert_common(Handle* h, int32_t idx, int level, int64_t tid) {
    Element e;
    e.level = level;
    e.neighbors.resize(level + 1);
    h->elements.push_back(std::move(e));

    auto rollback = [h, idx]() {
        h->elements.pop_back();
        switch (h->kind) {
            case DENSE:
                h->values.resize((size_t)idx * h->dim);
                break;
            case BIT:
                h->words.resize((size_t)idx * h->dim);
                break;
            case SPARSE:
                h->sp_idx.resize((size_t)idx * h->dim);
                h->sp_val.resize((size_t)idx * h->dim);
                break;
        }
    };

    if (h->entry < 0) {
        h->elements[idx].tids.push_back(tid);
        h->entry = idx;
        return idx;
    }

    find_element_neighbors(h, idx, h->entry);

    // duplicate folding: byte-equal zero-distance layer-0 neighbors
    // (build.rs:474-510)
    for (const Cand& nb : h->elements[idx].neighbors[0]) {
        if (nb.d != 0.0f) break;
        Element& dup = h->elements[nb.idx];
        if (!dup.deleted && !dup.tids.empty() && dup.tids.size() < 10 &&
            h->rows_equal(idx, nb.idx)) {
            dup.tids.push_back(tid);
            rollback();
            return -(nb.idx + 2);
        }
    }

    update_neighbor_connections(h, idx);
    h->elements[idx].tids.push_back(tid);
    if (h->elements[idx].level > h->elements[h->entry].level) h->entry = idx;
    return idx;
}

}  // namespace

extern "C" {

void* hnsw_create(int dim, int m, int ef_construction, int metric) {
    Handle* h = new Handle();
    h->kind = DENSE;
    h->dim = dim;
    h->m = m;
    h->efc = ef_construction;
    h->metric = (Metric)metric;
    return h;
}

// Bit rows: `words` u32 words per row (hamming/jaccard).
void* hnsw_create_bit(int words, int m, int ef_construction, int metric) {
    Handle* h = new Handle();
    h->kind = BIT;
    h->dim = words;
    h->m = m;
    h->efc = ef_construction;
    h->metric = (Metric)metric;
    return h;
}

// Sparse rows: `budget` (index, value) pairs per row, indices sorted
// ascending and padded with INT32_MAX.
void* hnsw_create_sparse(int budget, int m, int ef_construction, int metric) {
    Handle* h = new Handle();
    h->kind = SPARSE;
    h->dim = budget;
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
    return insert_common(h, idx, level, tid);
}

int32_t hnsw_insert_bit(void* hp, const uint32_t* row, int level, int64_t tid) {
    Handle* h = (Handle*)hp;
    int32_t idx = (int32_t)h->elements.size();
    h->words.insert(h->words.end(), row, row + h->dim);
    return insert_common(h, idx, level, tid);
}

int32_t hnsw_insert_sparse(void* hp, const int32_t* idx_row, const float* val_row,
                           int level, int64_t tid) {
    Handle* h = (Handle*)hp;
    int32_t idx = (int32_t)h->elements.size();
    h->sp_idx.insert(h->sp_idx.end(), idx_row, idx_row + h->dim);
    h->sp_val.insert(h->sp_val.end(), val_row, val_row + h->dim);
    return insert_common(h, idx, level, tid);
}

int32_t hnsw_bulk_insert(void* hp, const float* vecs, const int* levels,
                         const int64_t* tids, int n) {
    Handle* h = (Handle*)hp;
    for (int i = 0; i < n; i++) {
        hnsw_insert(hp, vecs + (size_t)i * h->dim, levels[i], tids[i]);
    }
    return (int32_t)h->elements.size();
}

int32_t hnsw_bulk_insert_bit(void* hp, const uint32_t* rows, const int* levels,
                             const int64_t* tids, int n) {
    Handle* h = (Handle*)hp;
    for (int i = 0; i < n; i++) {
        hnsw_insert_bit(hp, rows + (size_t)i * h->dim, levels[i], tids[i]);
    }
    return (int32_t)h->elements.size();
}

int32_t hnsw_bulk_insert_sparse(void* hp, const int32_t* idx_rows,
                                const float* val_rows, const int* levels,
                                const int64_t* tids, int n) {
    Handle* h = (Handle*)hp;
    for (int i = 0; i < n; i++) {
        hnsw_insert_sparse(hp, idx_rows + (size_t)i * h->dim,
                           val_rows + (size_t)i * h->dim, levels[i], tids[i]);
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

namespace {
// Algorithm 5 scan with a kind-generic query row.
int32_t search_impl(Handle* h, const RowRef& q, int ef, int32_t* out_ids,
                    float* out_dists) {
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
}  // namespace

// Algorithm 5 scan: greedy descent + ef ground search; fills up to ef
// (element_id, order_distance) pairs, returns count.
int32_t hnsw_search(void* hp, const float* q, int ef, int32_t* out_ids,
                    float* out_dists) {
    Handle* h = (Handle*)hp;
    RowRef r;
    r.f = q;
    return search_impl(h, r, ef, out_ids, out_dists);
}

int32_t hnsw_search_bit(void* hp, const uint32_t* q, int ef, int32_t* out_ids,
                        float* out_dists) {
    Handle* h = (Handle*)hp;
    RowRef r;
    r.w = q;
    return search_impl(h, r, ef, out_ids, out_dists);
}

int32_t hnsw_search_sparse(void* hp, const int32_t* qi, const float* qv, int ef,
                           int32_t* out_ids, float* out_dists) {
    Handle* h = (Handle*)hp;
    RowRef r;
    r.si = qi;
    r.sv = qv;
    return search_impl(h, r, ef, out_ids, out_dists);
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
