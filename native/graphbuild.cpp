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
