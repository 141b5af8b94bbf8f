// Native host-side graph kernels for the SfM runtime.
//
// reference behavior: the C++ hot paths of src/colmap/math/union_find.h and
// scene/correspondence_graph.cc track establishment — the parts of the
// pipeline that stay on the host (graph bookkeeping) and are latency-bound
// in Python. Exposed as a C ABI consumed through ctypes; a NumPy fallback
// exists in colmap_tpu/utils/native.py.
//
// Build: g++ -O3 -shared -fPIC -o libgraph_ops.so graph_ops.cpp

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct UnionFind {
  std::vector<int64_t> parent;
  std::vector<int32_t> rank_;

  explicit UnionFind(int64_t n) : parent(n), rank_(n, 0) {
    for (int64_t i = 0; i < n; ++i) parent[i] = i;
  }

  int64_t Find(int64_t a) {
    int64_t root = a;
    while (parent[root] != root) root = parent[root];
    while (parent[a] != root) {
      const int64_t next = parent[a];
      parent[a] = root;
      a = next;
    }
    return root;
  }

  void Union(int64_t a, int64_t b) {
    a = Find(a);
    b = Find(b);
    if (a == b) return;
    if (rank_[a] < rank_[b]) std::swap(a, b);
    parent[b] = a;
    if (rank_[a] == rank_[b]) ++rank_[a];
  }
};

}  // namespace

extern "C" {

// Union-find over num_nodes nodes joined by n_edges (a[i], b[i]) pairs.
// Writes the root label of every node into out_labels (length num_nodes).
void union_find_labels(int64_t num_nodes, const int64_t* edges_a,
                       const int64_t* edges_b, int64_t n_edges,
                       int64_t* out_labels) {
  UnionFind uf(num_nodes);
  for (int64_t e = 0; e < n_edges; ++e) {
    uf.Union(edges_a[e], edges_b[e]);
  }
  for (int64_t i = 0; i < num_nodes; ++i) {
    out_labels[i] = uf.Find(i);
  }
}

// CSR construction: given row indices (unsorted) of n items over num_rows
// rows, fill offsets (num_rows+1) and order (n: permutation sorting items
// by row, stable). Counting sort — O(n + num_rows).
void build_csr(const int64_t* rows, int64_t n, int64_t num_rows,
               int64_t* offsets, int64_t* order) {
  std::memset(offsets, 0, sizeof(int64_t) * (num_rows + 1));
  for (int64_t i = 0; i < n; ++i) ++offsets[rows[i] + 1];
  for (int64_t r = 0; r < num_rows; ++r) offsets[r + 1] += offsets[r];
  std::vector<int64_t> cursor(offsets, offsets + num_rows);
  for (int64_t i = 0; i < n; ++i) {
    order[cursor[rows[i]]++] = i;
  }
}

}  // extern "C"
