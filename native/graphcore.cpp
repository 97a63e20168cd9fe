// graphcore: native graph-construction runtime for bridged_gnn_tpu.
//
// The build-time graph operations (edge coalesce, destination-sort, CSR
// row pointers, degree computation, Pallas chunk metadata, edge
// partitioning) run on the host once per graph; for production-scale
// graphs (1e8+ edges) the numpy implementations become the pipeline
// bottleneck, so they are implemented here natively and exposed through a
// minimal C ABI consumed via ctypes (bridged_gnn_tpu/io/native.py).
//
// The reference delegates the equivalent work to torch_sparse's C++
// kernels (coalesce — SURVEY §2b); this library is the framework-native
// replacement.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// Sort edges by (dst, src) and drop duplicates.
// in:  src[e], dst[e]  (int64)
// out: out_src, out_dst (caller-allocated, capacity e)
// returns: number of unique edges
int64_t gc_coalesce(const int64_t* src, const int64_t* dst, int64_t e,
                    int64_t* out_src, int64_t* out_dst) {
  std::vector<int64_t> order(e);
  std::iota(order.begin(), order.end(), 0);
  std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    if (dst[a] != dst[b]) return dst[a] < dst[b];
    return src[a] < src[b];
  });
  int64_t n = 0;
  for (int64_t i = 0; i < e; ++i) {
    int64_t k = order[i];
    if (n > 0 && out_src[n - 1] == src[k] && out_dst[n - 1] == dst[k])
      continue;
    out_src[n] = src[k];
    out_dst[n] = dst[k];
    ++n;
  }
  return n;
}

// Stable sort edges by (dst, src) keeping duplicates.
void gc_sort_by_dst(const int64_t* src, const int64_t* dst, int64_t e,
                    int64_t* out_src, int64_t* out_dst) {
  std::vector<int64_t> order(e);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    if (dst[a] != dst[b]) return dst[a] < dst[b];
    return src[a] < src[b];
  });
  for (int64_t i = 0; i < e; ++i) {
    out_src[i] = src[order[i]];
    out_dst[i] = dst[order[i]];
  }
}

// CSR row pointers from dst-sorted edges: row_ptr has n+1 entries.
void gc_csr_rowptr(const int64_t* dst_sorted, int64_t e, int64_t n,
                   int64_t* row_ptr) {
  std::memset(row_ptr, 0, sizeof(int64_t) * (n + 1));
  for (int64_t i = 0; i < e; ++i) row_ptr[dst_sorted[i] + 1]++;
  for (int64_t v = 0; v < n; ++v) row_ptr[v + 1] += row_ptr[v];
}

// In/out degrees.
void gc_degrees(const int64_t* src, const int64_t* dst, int64_t e, int64_t n,
                int64_t* in_deg, int64_t* out_deg) {
  std::memset(in_deg, 0, sizeof(int64_t) * n);
  std::memset(out_deg, 0, sizeof(int64_t) * n);
  for (int64_t i = 0; i < e; ++i) {
    out_deg[src[i]]++;
    in_deg[dst[i]]++;
  }
}

// Pallas segment-kernel chunk metadata over dst-sorted (padded) edges:
// for each node block, the [first, last] edge-chunk covering its edges.
// Returns max_chunks.
int64_t gc_chunk_meta(const int64_t* dst_sorted, int64_t e_pad,
                      int64_t n_pad, int64_t node_block, int64_t edge_chunk,
                      int32_t* chunk_base, int32_t* num_chunks) {
  int64_t n_blocks = (n_pad + node_block - 1) / node_block;
  int64_t max_chunks = 1;
  const int64_t* begin = dst_sorted;
  const int64_t* end = dst_sorted + e_pad;
  for (int64_t b = 0; b < n_blocks; ++b) {
    const int64_t lo = b * node_block;
    const int64_t hi = lo + node_block;
    const int64_t s = std::lower_bound(begin, end, lo) - begin;
    const int64_t t = std::lower_bound(begin, end, hi) - begin;
    chunk_base[b] = static_cast<int32_t>(s / edge_chunk);
    int32_t nc = 0;
    if (t > s) nc = static_cast<int32_t>((t - 1) / edge_chunk + 1 - chunk_base[b]);
    num_chunks[b] = nc;
    if (nc > max_chunks) max_chunks = nc;
  }
  return max_chunks;
}

// Greedy contiguous edge partition into p shards of near-equal edge count
// respecting chunk alignment. out: shard_start[p+1] (edge offsets).
void gc_edge_partition(int64_t e, int64_t p, int64_t align,
                       int64_t* shard_start) {
  for (int64_t i = 0; i <= p; ++i) {
    int64_t pos = (e * i) / p;
    shard_start[i] = (pos / align) * align;
  }
  shard_start[p] = e;
}

}  // extern "C"
