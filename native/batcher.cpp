// Native graph batcher: the host-side hot loop of the data pipeline.
//
// The reference delegates collation to PyG's DataLoader (loader.py:48-60,
// C++ inside torch); here the equivalent native component packs ragged
// graphs into the padded CSR / slotted-dense GraphBatch layout consumed by
// the TPU compute path:
//   - node/edge flattening with per-graph offsets
//   - stable counting sort of edges by receiver (CSR order)
//   - dense per-graph adjacency fill (slotted mode)
//   - Pallas SpMM plan windows (tile min/max scans)
// Exposed as a C ABI for ctypes (no pybind11 in this image).  The Python
// wrapper (graph_hscn_tpu/data/native.py) falls back to the numpy
// implementation when the shared library is absent.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Pack a list of graphs into one padded batch.
//
// Inputs (host buffers, graph-major):
//   num_graphs           G
//   node_offsets [G+1]   prefix sums of per-graph node counts
//   edge_offsets [G+1]   prefix sums of per-graph edge counts
//   node_feat    [sum_n * F] float32, concatenated
//   edge_src/dst [sum_e] int32, graph-local indices
//   y            [G * C] float32 (may be null)
//   budget_nodes/budget_edges/budget_graphs: padded sizes (budget_graphs
//     includes the trailing dummy graph)
//   slot_nodes: 0 = contiguous packing, >0 = slotted dense layout
//
// Outputs (caller-allocated, padded sizes):
//   out_node_feat [N * F]   out_senders/out_receivers [E]
//   out_node_graph [N]      out_n_node/out_n_edge [GP]
//   out_node_mask/out_edge_mask/out_graph_mask (uint8)
//   out_y [GP * C] (null ok)
//   out_dense_adj [ (GP-1) * slot * slot ] (null unless slotted)
//
// Returns 0 on success, negative error code on budget violation.
int pack_batch(
    int32_t num_graphs,
    const int64_t* node_offsets,
    const int64_t* edge_offsets,
    const float* node_feat, int32_t feat_dim,
    const int32_t* edge_src, const int32_t* edge_dst,
    const float* y, int32_t y_dim,
    int32_t budget_nodes, int32_t budget_edges, int32_t budget_graphs,
    int32_t slot_nodes,
    float* out_node_feat,
    int32_t* out_senders, int32_t* out_receivers,
    int32_t* out_node_graph,
    int32_t* out_n_node, int32_t* out_n_edge,
    uint8_t* out_node_mask, uint8_t* out_edge_mask, uint8_t* out_graph_mask,
    float* out_y,
    float* out_dense_adj) {
  const int32_t G = num_graphs;
  const int32_t GP = budget_graphs;
  int32_t N = budget_nodes;
  const int32_t E = budget_edges;
  if (slot_nodes > 0) N = (GP - 1) * slot_nodes;
  if (G >= GP) return -1;

  const int64_t tot_n = node_offsets[G];
  const int64_t tot_e = edge_offsets[G];
  if (slot_nodes == 0 && tot_n >= N) return -2;
  if (tot_e > E) return -3;

  // Zero/initialize outputs.
  std::memset(out_node_feat, 0, sizeof(float) * (size_t)N * feat_dim);
  std::fill(out_senders, out_senders + E, N - 1);
  std::fill(out_receivers, out_receivers + E, N - 1);
  std::fill(out_node_graph, out_node_graph + N, GP - 1);
  std::memset(out_n_node, 0, sizeof(int32_t) * GP);
  std::memset(out_n_edge, 0, sizeof(int32_t) * GP);
  std::memset(out_node_mask, 0, N);
  std::memset(out_edge_mask, 0, E);
  std::memset(out_graph_mask, 0, GP);
  if (out_y) std::memset(out_y, 0, sizeof(float) * (size_t)GP * y_dim);
  if (out_dense_adj && slot_nodes > 0)
    std::memset(out_dense_adj, 0,
                sizeof(float) * (size_t)(GP - 1) * slot_nodes * slot_nodes);

  // Unsorted staging for edges.
  std::vector<int32_t> snd(tot_e), rcv(tot_e);

  int64_t n_off = 0;
  int64_t e_cursor = 0;
  for (int32_t gi = 0; gi < G; ++gi) {
    if (slot_nodes > 0) n_off = (int64_t)gi * slot_nodes;
    const int64_t n0 = node_offsets[gi], n1 = node_offsets[gi + 1];
    const int64_t e0 = edge_offsets[gi], e1 = edge_offsets[gi + 1];
    const int32_t n = (int32_t)(n1 - n0);
    if (slot_nodes > 0 && n > slot_nodes) return -4;

    std::memcpy(out_node_feat + n_off * feat_dim,
                node_feat + n0 * feat_dim,
                sizeof(float) * (size_t)n * feat_dim);
    for (int32_t i = 0; i < n; ++i) out_node_graph[n_off + i] = gi;
    std::memset(out_node_mask + n_off, 1, n);
    out_n_node[gi] = n;
    out_n_edge[gi] = (int32_t)(e1 - e0);
    out_graph_mask[gi] = 1;
    if (out_y && y)
      std::memcpy(out_y + (size_t)gi * y_dim, y + (size_t)gi * y_dim,
                  sizeof(float) * y_dim);

    for (int64_t e = e0; e < e1; ++e) {
      snd[e_cursor] = (int32_t)(edge_src[e] + n_off);
      rcv[e_cursor] = (int32_t)(edge_dst[e] + n_off);
      ++e_cursor;
    }
    if (out_dense_adj && slot_nodes > 0) {
      float* adj = out_dense_adj +
                   (size_t)gi * slot_nodes * slot_nodes;
      for (int64_t e = e0; e < e1; ++e) {
        adj[(size_t)edge_dst[e] * slot_nodes + edge_src[e]] += 1.0f;
      }
    }
    if (slot_nodes == 0) n_off = n1;
  }

  // Stable counting sort by receiver -> CSR order.
  std::vector<int32_t> counts(N + 1, 0);
  for (int64_t e = 0; e < tot_e; ++e) counts[rcv[e] + 1]++;
  for (int32_t i = 0; i < N; ++i) counts[i + 1] += counts[i];
  std::vector<int32_t> pos(counts.begin(), counts.end() - 1);
  for (int64_t e = 0; e < tot_e; ++e) {
    const int32_t p = pos[rcv[e]]++;
    out_senders[p] = snd[e];
    out_receivers[p] = rcv[e];
    out_edge_mask[p] = 1;
  }
  return 0;
}

// Per-tile window scan for the Pallas SpMM plan: for each tile of
// `tile_edges` edges, the min masked receiver/sender (window starts) and
// relative indices.  Returns 0, or -1 if any span exceeds `window`.
int spmm_windows(
    const int32_t* senders, const int32_t* receivers,
    const uint8_t* edge_mask, int64_t num_edges,
    int32_t num_nodes, int32_t tile_edges, int32_t window,
    int32_t* out_ws, int32_t* out_wr,
    int32_t* out_snd_rel, int32_t* out_rcv_rel) {
  const int64_t T = num_edges / tile_edges;
  for (int64_t t = 0; t < T; ++t) {
    int32_t smin = num_nodes + 1, rmin = num_nodes + 1;
    bool any = false;
    for (int32_t k = 0; k < tile_edges; ++k) {
      const int64_t e = t * tile_edges + k;
      if (!edge_mask[e]) continue;
      any = true;
      smin = std::min(smin, senders[e]);
      rmin = std::min(rmin, receivers[e]);
    }
    // No clamp to num_nodes - window: the kernels pad node arrays to
    // align32(num_nodes) + window, so end-of-range starts are legal, and
    // clamping would widen the last tiles' offsets past the window and
    // reject otherwise-feasible plans (matches the Python planner,
    // ops/pallas/spmm_kernel.py:_windows).
    int32_t ws = any ? smin : 0;
    int32_t wr = any ? rmin : 0;
    // Sublane-align the window starts (the Pallas kernels assume starts
    // divisible by 32 so Mosaic can prove vector load/store alignment for
    // every dtype; see ops/pallas/spmm_kernel.py:_windows).
    ws = (ws / 32) * 32;
    wr = (wr / 32) * 32;
    out_ws[t] = ws;
    out_wr[t] = wr;
    for (int32_t k = 0; k < tile_edges; ++k) {
      const int64_t e = t * tile_edges + k;
      if (!edge_mask[e]) {
        out_snd_rel[e] = window;
        out_rcv_rel[e] = window;
        continue;
      }
      const int32_t sr = senders[e] - ws;
      const int32_t rr = receivers[e] - wr;
      if (sr < 0 || sr >= window || rr < 0 || rr >= window) return -1;
      out_snd_rel[e] = sr;
      out_rcv_rel[e] = rr;
    }
  }
  return 0;
}

}  // extern "C"
