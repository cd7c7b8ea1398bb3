// Native graph builder for relgat_projector_tpu.
//
// The reference's "runtime" data path is Python loops (pickle dicts, per-edge
// Python negative sampling, dataset shuffling — see SURVEY.md §2). Here the
// heavy host-side graph preprocessing — stable sort by destination, per-block
// edge bucketing, and construction of the block-padded layout consumed by the
// Pallas kernels (data/blocked.py) — is C++, exposed through a C ABI for
// ctypes (no pybind11 in this image).
//
// Build: see native/Makefile (produces libgraphbuild.so).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// Stable argsort of int64 keys; out_order must hold n indices.
void argsort_i64(const int64_t* keys, int64_t n, int64_t* out_order) {
  std::iota(out_order, out_order + n, int64_t{0});
  std::stable_sort(out_order, out_order + n,
                   [keys](int64_t a, int64_t b) { return keys[a] < keys[b]; });
}

// Phase 1 of blocked-layout construction: given the partition key (dst or
// src), compute the sorted order, per-block padded slot counts, and the total
// number of slots. Returns slots_total (so the caller can allocate outputs).
//
//   keys        [e]           partition key per edge
//   order       [e]   (out)   stable sort order
//   counts      [nb]  (out)   edges per block
//   padded      [nb]  (out)   ceil(counts/te)*te
int64_t blocked_phase1(const int64_t* keys, int64_t e, int64_t num_nodes,
                       int64_t td, int64_t te, int64_t* order,
                       int64_t* counts, int64_t* padded) {
  const int64_t nb = (num_nodes + td - 1) / td;
  argsort_i64(keys, e, order);
  std::memset(counts, 0, sizeof(int64_t) * nb);
  for (int64_t i = 0; i < e; ++i) counts[keys[i] / td]++;
  int64_t total = 0;
  for (int64_t b = 0; b < nb; ++b) {
    padded[b] = (counts[b] + te - 1) / te * te;
    total += padded[b];
  }
  return total;
}

// Phase 2: fill the block-padded arrays. All outputs sized by phase 1.
//
//   slot arrays [slots_total]; slot_of_edge [e]; chunk_block [slots_total/te]
//   chunk_meta  [num_chunks * 8 * te] int32 (row0 etype, row1 local, row2 mask)
//   block_nonempty [nb] float32
void blocked_phase2(const int64_t* keys, const int32_t* src,
                    const int32_t* dst, const int32_t* etype, int64_t e,
                    int64_t num_nodes, int64_t td, int64_t te,
                    const int64_t* order, const int64_t* counts,
                    const int64_t* padded, int32_t* src_b, int32_t* dst_b,
                    int32_t* et_b, float* mask_b, int32_t* local_b,
                    int32_t* chunk_block, int32_t* slot_of_edge,
                    float* block_nonempty, int32_t* chunk_meta,
                    int32_t* edge_of_slot) {
  const int64_t nb = (num_nodes + td - 1) / td;
  std::vector<int64_t> out_start(nb + 1, 0), in_start(nb + 1, 0);
  for (int64_t b = 0; b < nb; ++b) {
    out_start[b + 1] = out_start[b] + padded[b];
    in_start[b + 1] = in_start[b] + counts[b];
  }
  const int64_t slots_total = out_start[nb];
  const int64_t num_chunks = slots_total / te;

  std::memset(src_b, 0, sizeof(int32_t) * slots_total);
  std::memset(dst_b, 0, sizeof(int32_t) * slots_total);
  std::memset(et_b, 0, sizeof(int32_t) * slots_total);
  std::memset(mask_b, 0, sizeof(float) * slots_total);
  std::memset(local_b, 0, sizeof(int32_t) * slots_total);
  std::memset(edge_of_slot, 0, sizeof(int32_t) * slots_total);

  std::vector<int64_t> seg_b(slots_total, 0);
  for (int64_t b = 0; b < nb; ++b) {
    block_nonempty[b] = counts[b] > 0 ? 1.0f : 0.0f;
    const int64_t i0 = in_start[b], i1 = in_start[b + 1];
    const int64_t o0 = out_start[b];
    const int64_t n = i1 - i0;
    for (int64_t j = 0; j < n; ++j) {
      const int64_t eidx = order[i0 + j];
      const int64_t slot = o0 + j;
      src_b[slot] = src[eidx];
      dst_b[slot] = dst[eidx];
      et_b[slot] = etype[eidx];
      mask_b[slot] = 1.0f;
      seg_b[slot] = keys[eidx];
      slot_of_edge[eidx] = static_cast<int32_t>(slot);
      edge_of_slot[slot] = static_cast<int32_t>(eidx);
    }
    // Padding slots: repeat the block's last edge, masked out.
    if (n > 0) {
      const int64_t last = order[i1 - 1];
      for (int64_t slot = o0 + n; slot < out_start[b + 1]; ++slot) {
        src_b[slot] = src[last];
        dst_b[slot] = dst[last];
        seg_b[slot] = keys[last];
        edge_of_slot[slot] = static_cast<int32_t>(last);
      }
    }
    for (int64_t slot = o0; slot < out_start[b + 1]; ++slot) {
      local_b[slot] = static_cast<int32_t>(seg_b[slot] - (seg_b[slot] / td) * td);
    }
    for (int64_t c = o0 / te; c < out_start[b + 1] / te; ++c) {
      chunk_block[c] = static_cast<int32_t>(b);
    }
  }

  // chunk_meta [C, 8, TE]; row 3 = canonical edge id (dropout-mask hash key)
  std::memset(chunk_meta, 0, sizeof(int32_t) * num_chunks * 8 * te);
  for (int64_t c = 0; c < num_chunks; ++c) {
    int32_t* m = chunk_meta + c * 8 * te;
    for (int64_t j = 0; j < te; ++j) {
      const int64_t slot = c * te + j;
      m[0 * te + j] = et_b[slot];
      m[1 * te + j] = local_b[slot];
      m[2 * te + j] = mask_b[slot] > 0 ? 1 : 0;
      m[3 * te + j] = edge_of_slot[slot];
    }
  }
}

// Filter triplets to those whose endpoints both exist in a sorted id set,
// remapping ids to compact indices. Returns the number kept.
//   sorted_ids [n_ids] ascending; (src,dst) [e] raw ids; rel [e]
//   out_* [e] compact triplets
int64_t compact_and_filter(const int64_t* sorted_ids, int64_t n_ids,
                           const int64_t* src, const int64_t* dst,
                           const int64_t* rel, int64_t e, int64_t* out_src,
                           int64_t* out_dst, int64_t* out_rel) {
  auto lookup = [&](int64_t v) -> int64_t {
    const int64_t* it =
        std::lower_bound(sorted_ids, sorted_ids + n_ids, v);
    if (it == sorted_ids + n_ids || *it != v) return -1;
    return it - sorted_ids;
  };
  int64_t kept = 0;
  for (int64_t i = 0; i < e; ++i) {
    const int64_t s = lookup(src[i]);
    if (s < 0) continue;
    const int64_t d = lookup(dst[i]);
    if (d < 0) continue;
    out_src[kept] = s;
    out_dst[kept] = d;
    out_rel[kept] = rel[i];
    ++kept;
  }
  return kept;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Graph partitioner (data/partition.py hot path).
//
// The numpy size-constrained label propagation is SYNCHRONOUS (whole-graph
// bincount per pass) and spends ~90% of partition time in per-pass
// [n, g]-count builds (measured 43 of 50 s at 4M edges). The native path is
// the textbook ASYNC variant: nodes update in a fixed sequential order
// against current labels, so each accepted move strictly reduces the edge
// cut (no oscillation, no snapshot bookkeeping) and the neighbor-label count
// is a per-node touched-list, not an [n, g] matrix. Deterministic: fixed
// iteration order, ties broken toward the smaller label.
// ---------------------------------------------------------------------------

namespace {

// Undirected CSR over the edge list with self-loops dropped.
struct Csr {
  std::vector<int64_t> indptr;
  std::vector<int32_t> indices;
};

Csr build_undirected_csr(const int64_t* src, const int64_t* dst, int64_t e,
                         int64_t n) {
  Csr csr;
  csr.indptr.assign(n + 1, 0);
  for (int64_t i = 0; i < e; ++i) {
    if (src[i] == dst[i]) continue;
    csr.indptr[src[i] + 1]++;
    csr.indptr[dst[i] + 1]++;
  }
  for (int64_t v = 0; v < n; ++v) csr.indptr[v + 1] += csr.indptr[v];
  csr.indices.resize(csr.indptr[n]);
  std::vector<int64_t> cursor(csr.indptr.begin(), csr.indptr.end() - 1);
  for (int64_t i = 0; i < e; ++i) {
    if (src[i] == dst[i]) continue;
    csr.indices[cursor[src[i]]++] = static_cast<int32_t>(dst[i]);
    csr.indices[cursor[dst[i]]++] = static_cast<int32_t>(src[i]);
  }
  return csr;
}

}  // namespace

extern "C" {

// Async size-constrained label propagation + exact-caps repair.
//   labels_io [n] in: initial labels (0..g-1); out: refined labels with
//   bincount(labels) == caps EXACTLY.  caps/soft_caps [g], sum(caps) == n.
// Returns the number of passes run (negative on bad input).
int64_t lpa_refine(const int64_t* src, const int64_t* dst, int64_t e,
                   int64_t n, int64_t g, const int64_t* caps,
                   const int64_t* soft_caps, int64_t max_passes,
                   int64_t* labels_io) {
  int64_t cap_sum = 0;
  for (int64_t k = 0; k < g; ++k) cap_sum += caps[k];
  if (cap_sum != n || g < 1) return -1;
  if (g == 1) {
    std::fill(labels_io, labels_io + n, int64_t{0});
    return 0;
  }
  const Csr csr = build_undirected_csr(src, dst, e, n);

  std::vector<int64_t> sizes(g, 0);
  for (int64_t v = 0; v < n; ++v) sizes[labels_io[v]]++;

  std::vector<int64_t> cnt(g, 0);
  std::vector<int64_t> touched;
  touched.reserve(64);

  auto count_neighbors = [&](int64_t v) {
    touched.clear();
    for (int64_t j = csr.indptr[v]; j < csr.indptr[v + 1]; ++j) {
      const int64_t l = labels_io[csr.indices[j]];
      if (cnt[l]++ == 0) touched.push_back(l);
    }
  };
  auto reset_counts = [&]() {
    for (int64_t l : touched) cnt[l] = 0;
  };

  int64_t pass = 0;
  for (; pass < max_passes; ++pass) {
    int64_t moves = 0;
    for (int64_t v = 0; v < n; ++v) {
      count_neighbors(v);
      const int64_t cur = labels_io[v];
      // Best admissible label: strictly more neighbor votes than the
      // current attachment (zero-gain moves could cycle) and soft-cap
      // room; equal-vote ties between CANDIDATES break toward the smaller
      // label (touched order varies run to run otherwise).
      int64_t best = -1, best_cnt = cnt[cur];
      for (int64_t l : touched) {
        if (l == cur || sizes[l] >= soft_caps[l]) continue;
        if (cnt[l] > best_cnt ||
            (cnt[l] == best_cnt && best >= 0 && l < best)) {
          best = l;
          best_cnt = cnt[l];
        }
      }
      reset_counts();
      if (best >= 0) {
        sizes[cur]--;
        sizes[best]++;
        labels_io[v] = best;
        ++moves;
      }
    }
    if (moves == 0) break;
  }

  // ---- repair to exact caps -------------------------------------------
  // Evict the weakest-attached members of overfull parts; each evictee goes
  // to its best-connected part that still has deficit room, leftovers fill
  // remaining deficits in part order. Deterministic throughout.
  std::vector<int64_t> attach(n, 0);
  for (int64_t v = 0; v < n; ++v) {
    int64_t a = 0;
    const int64_t lv = labels_io[v];
    for (int64_t j = csr.indptr[v]; j < csr.indptr[v + 1]; ++j) {
      if (labels_io[csr.indices[j]] == lv) ++a;
    }
    attach[v] = a;
  }
  for (int64_t k = 0; k < g; ++k) sizes[k] = 0;
  for (int64_t v = 0; v < n; ++v) sizes[labels_io[v]]++;

  std::vector<int64_t> evictees;
  for (int64_t k = 0; k < g; ++k) {
    const int64_t surplus = sizes[k] - caps[k];
    if (surplus <= 0) continue;
    std::vector<int64_t> members;
    for (int64_t v = 0; v < n; ++v) {
      if (labels_io[v] == k) members.push_back(v);
    }
    std::stable_sort(members.begin(), members.end(),
                     [&](int64_t a, int64_t b) { return attach[a] < attach[b]; });
    evictees.insert(evictees.end(), members.begin(), members.begin() + surplus);
  }
  // Strongest-connected evictees place first so they get their best target
  // while room lasts.
  std::stable_sort(evictees.begin(), evictees.end(),
                   [&](int64_t a, int64_t b) { return attach[a] > attach[b]; });
  std::vector<int64_t> deficit(g, 0);
  for (int64_t k = 0; k < g; ++k) {
    deficit[k] = caps[k] > sizes[k] ? caps[k] - sizes[k] : 0;
  }
  std::vector<int64_t> leftover;
  for (int64_t v : evictees) {
    count_neighbors(v);
    int64_t best = -1, best_cnt = -1;
    for (int64_t l : touched) {
      if (deficit[l] <= 0) continue;
      if (cnt[l] > best_cnt || (cnt[l] == best_cnt && l < best)) {
        best = l;
        best_cnt = cnt[l];
      }
    }
    reset_counts();
    if (best >= 0) {
      labels_io[v] = best;
      deficit[best]--;
    } else {
      leftover.push_back(v);
    }
  }
  int64_t fill_part = 0;
  for (int64_t v : leftover) {
    while (fill_part < g && deficit[fill_part] == 0) ++fill_part;
    labels_io[v] = fill_part < g ? fill_part : g - 1;
    if (fill_part < g) deficit[fill_part]--;
  }
  return pass;
}

// Greedy graph-growing seeding (BFS waves from max-degree seeds), the
// native twin of data/partition.py bfs_grow_partition. labels_out [n].
void bfs_grow(const int64_t* src, const int64_t* dst, int64_t e, int64_t n,
              int64_t g, const int64_t* caps, int64_t* labels_out) {
  const Csr csr = build_undirected_csr(src, dst, e, n);
  std::fill(labels_out, labels_out + n, int64_t{-1});

  std::vector<int64_t> seed_order(n);
  std::iota(seed_order.begin(), seed_order.end(), int64_t{0});
  std::stable_sort(seed_order.begin(), seed_order.end(),
                   [&](int64_t a, int64_t b) {
                     return (csr.indptr[a + 1] - csr.indptr[a]) >
                            (csr.indptr[b + 1] - csr.indptr[b]);
                   });
  int64_t seed_ptr = 0;

  std::vector<int64_t> frontier, next;
  for (int64_t k = 0; k < g; ++k) {
    int64_t room = caps[k];
    frontier.clear();
    while (room > 0) {
      if (frontier.empty()) {
        while (seed_ptr < n && labels_out[seed_order[seed_ptr]] != -1) {
          ++seed_ptr;
        }
        if (seed_ptr >= n) break;
        frontier.push_back(seed_order[seed_ptr]);
      }
      // Take one whole wave (capacity permitting), then expand it —
      // mirrors the numpy wave semantics (sorted-unique next frontier).
      const int64_t take = std::min<int64_t>(room, frontier.size());
      next.clear();
      for (int64_t i = 0; i < take; ++i) {
        labels_out[frontier[i]] = k;
      }
      room -= take;
      if (room == 0) break;
      for (int64_t i = 0; i < take; ++i) {
        const int64_t v = frontier[i];
        for (int64_t j = csr.indptr[v]; j < csr.indptr[v + 1]; ++j) {
          const int64_t u = csr.indices[j];
          if (labels_out[u] == -1) next.push_back(u);
        }
      }
      std::sort(next.begin(), next.end());
      next.erase(std::unique(next.begin(), next.end()), next.end());
      // Drop anything labeled meanwhile (same-wave duplicates handled by
      // unique; labels_out check keeps it safe).
      frontier.clear();
      for (int64_t u : next) {
        if (labels_out[u] == -1) frontier.push_back(u);
      }
    }
  }
  // Unassigned stragglers (caps filled by waves that skipped them): fill
  // remaining deficit in part order.
  std::vector<int64_t> sizes(g, 0);
  for (int64_t v = 0; v < n; ++v) {
    if (labels_out[v] >= 0) sizes[labels_out[v]]++;
  }
  int64_t fill_part = 0;
  for (int64_t v = 0; v < n; ++v) {
    if (labels_out[v] != -1) continue;
    while (fill_part < g && sizes[fill_part] >= caps[fill_part]) ++fill_part;
    labels_out[v] = fill_part < g ? fill_part : g - 1;
    if (fill_part < g) sizes[fill_part]++;
  }
}

}  // extern "C"
