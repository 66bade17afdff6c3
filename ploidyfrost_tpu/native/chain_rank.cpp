// Chain ranking for unitig compaction (C ABI).
//
// Input: nxt[i] = successor node of i in the unitig-interior link graph
// (graph/construct._links_junctions), -1 = none. Nodes are (k-mer,
// orientation) pairs; every maximal chain is one unitig traversal.
//
// Output: `order` lists all nodes grouped by chain in walk order;
// `chain_start[j]` = 1 iff order[j] starts a new chain. Non-cycle
// chains are emitted in ascending head-node order (the same grouping
// the numpy pointer-doubling path produces); pure cycles are emitted
// afterwards, each started at its minimum node id — downstream
// assembly is chain-order-independent (the final unitig order is a
// separate lexicographic sort), only grouping and walk order matter.
//
// A sequential O(n) walk: the host pointer-doubling version
// (graph/construct._rank_chains) moves ~8 rounds x 100 MB of gather
// traffic at 12M nodes (~6 s); this loop touches each node twice.

#include <cstdint>
#include <vector>

extern "C" {

void pf_chain_rank(const int64_t* nxt, int64_t n, int64_t* order,
                   uint8_t* chain_start) {
  std::vector<uint8_t> has_prev(n, 0);
  for (int64_t i = 0; i < n; ++i) {
    const int64_t j = nxt[i];
    if (j >= 0) has_prev[j] = 1;
  }
  std::vector<uint8_t> visited(n, 0);
  int64_t idx = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (has_prev[i]) continue;
    int64_t node = i;
    chain_start[idx] = 1;
    while (node >= 0 && !visited[node]) {
      visited[node] = 1;
      order[idx++] = node;
      node = nxt[node];
    }
  }
  // remaining unvisited nodes are pure cycles; ascending scan hits each
  // cycle first at its minimum node id
  for (int64_t i = 0; i < n; ++i) {
    if (visited[i]) continue;
    int64_t node = i;
    chain_start[idx] = 1;
    while (!visited[node]) {
      visited[node] = 1;
      order[idx++] = node;
      node = nxt[node];
    }
  }
}
}
