// CPU flat MIPS baseline — first-party stand-in for FAISS IndexFlatIP
// (the reference's search backend, sotasum/mips.py:333-340,382-400; FAISS
// itself is not present in this image). Used by bench.py as the
// "CPU queries/sec" denominator and by tests as an independent oracle.
//
// Design: cache-blocked scan over the corpus; per-query bounded min-heap
// of size k. Single-threaded (the host has one core); -O3 -march=native
// auto-vectorizes the dot products.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct HeapEntry {
  float val;
  int32_t idx;
};

inline bool heap_less(const HeapEntry& a, const HeapEntry& b) {
  return a.val > b.val;  // min-heap on val
}

}  // namespace

extern "C" {

// corpus: [n, d] row-major f32; queries: [b, d]; out_vals: [b, k];
// out_idx: [b, k]. Returns top-k by inner product, descending.
void mips_search_f32(const float* corpus, int64_t n, int32_t d,
                     const float* queries, int32_t b, int32_t k,
                     float* out_vals, int32_t* out_idx) {
  const int64_t block = 4096;  // rows per corpus block (L2-friendly)
  std::vector<std::vector<HeapEntry>> heaps(b);
  for (auto& h : heaps) h.reserve(k + 1);

  for (int64_t r0 = 0; r0 < n; r0 += block) {
    const int64_t r1 = std::min(n, r0 + block);
    for (int32_t q = 0; q < b; ++q) {
      const float* qv = queries + (int64_t)q * d;
      auto& heap = heaps[q];
      for (int64_t r = r0; r < r1; ++r) {
        const float* ev = corpus + r * d;
        float acc = 0.f;
        for (int32_t j = 0; j < d; ++j) acc += qv[j] * ev[j];
        if ((int32_t)heap.size() < k) {
          heap.push_back({acc, (int32_t)r});
          std::push_heap(heap.begin(), heap.end(), heap_less);
        } else if (acc > heap.front().val) {
          std::pop_heap(heap.begin(), heap.end(), heap_less);
          heap.back() = {acc, (int32_t)r};
          std::push_heap(heap.begin(), heap.end(), heap_less);
        }
      }
    }
  }

  for (int32_t q = 0; q < b; ++q) {
    auto& heap = heaps[q];
    std::sort_heap(heap.begin(), heap.end(), heap_less);  // descending by val
    const int32_t got = (int32_t)heap.size();
    for (int32_t j = 0; j < k; ++j) {
      const int32_t src = j < got ? j : -1;
      if (src >= 0) {
        out_vals[(int64_t)q * k + j] = heap[src].val;
        out_idx[(int64_t)q * k + j] = heap[src].idx;
      } else {
        out_vals[(int64_t)q * k + j] = -3.0e38f;
        out_idx[(int64_t)q * k + j] = -1;
      }
    }
  }
}

// L2 variant: top-k smallest squared distances.
void l2_search_f32(const float* corpus, int64_t n, int32_t d,
                   const float* queries, int32_t b, int32_t k,
                   float* out_vals, int32_t* out_idx) {
  std::vector<float> neg_half_norm(n);
  for (int64_t r = 0; r < n; ++r) {
    const float* ev = corpus + r * d;
    float s = 0.f;
    for (int32_t j = 0; j < d; ++j) s += ev[j] * ev[j];
    neg_half_norm[r] = -0.5f * s;
  }
  // score = q·e − ‖e‖²/2 ranks identically to −‖q−e‖² (see
  // ops/mips_topk.py); reuse the IP machinery on biased scores.
  const int64_t block = 4096;
  std::vector<std::vector<HeapEntry>> heaps(b);
  for (auto& h : heaps) h.reserve(k + 1);
  for (int64_t r0 = 0; r0 < n; r0 += block) {
    const int64_t r1 = std::min(n, r0 + block);
    for (int32_t q = 0; q < b; ++q) {
      const float* qv = queries + (int64_t)q * d;
      auto& heap = heaps[q];
      for (int64_t r = r0; r < r1; ++r) {
        const float* ev = corpus + r * d;
        float acc = neg_half_norm[r];
        for (int32_t j = 0; j < d; ++j) acc += qv[j] * ev[j];
        if ((int32_t)heap.size() < k) {
          heap.push_back({acc, (int32_t)r});
          std::push_heap(heap.begin(), heap.end(), heap_less);
        } else if (acc > heap.front().val) {
          std::pop_heap(heap.begin(), heap.end(), heap_less);
          heap.back() = {acc, (int32_t)r};
          std::push_heap(heap.begin(), heap.end(), heap_less);
        }
      }
    }
  }
  for (int32_t q = 0; q < b; ++q) {
    auto& heap = heaps[q];
    std::sort_heap(heap.begin(), heap.end(), heap_less);
    const int32_t got = (int32_t)heap.size();
    for (int32_t j = 0; j < k; ++j) {
      const int32_t src = j < got ? j : -1;
      if (src >= 0) {
        out_vals[(int64_t)q * k + j] = heap[src].val;
        out_idx[(int64_t)q * k + j] = heap[src].idx;
      } else {
        out_vals[(int64_t)q * k + j] = -3.0e38f;
        out_idx[(int64_t)q * k + j] = -1;
      }
    }
  }
}

}  // extern "C"
