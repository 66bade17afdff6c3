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

namespace {
// W-way interleaved chain walks: a single sequential walk is bound by
// one DRAM miss per step (~200 ns/node at 100M+ nodes); round-robin
// cursors over W independent chains keep W misses in flight.
constexpr int kWays = 32;
}  // namespace

extern "C" {

void pf_chain_rank(const int64_t* nxt, int64_t n, int64_t* order,
                   uint8_t* chain_start) {
  std::vector<uint8_t> has_prev(n, 0);
  for (int64_t i = 0; i < n; ++i) {
    const int64_t j = nxt[i];
    if (j >= 0) has_prev[j] = 1;
  }
  std::vector<int64_t> heads;
  heads.reserve(n / 4);
  for (int64_t i = 0; i < n; ++i)
    if (!has_prev[i]) heads.push_back(i);
  const int64_t nh = (int64_t)heads.size();

  // pass 1: chain lengths (interleaved walks). budget guards against
  // corrupt inputs (a chain feeding a cycle would otherwise spin)
  std::vector<int64_t> lens(nh, 0);
  {
    int64_t budget = n;
    int64_t next_head = 0;
    int64_t cur[kWays];
    int64_t ci[kWays];
    for (int w = 0; w < kWays; ++w) cur[w] = -2;
    int live = 0;
    for (int w = 0; w < kWays && next_head < nh; ++w) {
      ci[w] = next_head;
      cur[w] = heads[next_head++];
      ++live;
    }
    while (live > 0) {
      for (int w = 0; w < kWays; ++w) {
        if (cur[w] < -1) continue;  // -2 = idle slot
        int64_t node = cur[w];
        if (node < 0) {
          if (next_head < nh) {
            ci[w] = next_head;
            cur[w] = heads[next_head++];
          } else {
            cur[w] = -2;
            --live;
          }
          continue;
        }
        if (--budget < 0) { live = 0; break; }
        ++lens[ci[w]];
        cur[w] = nxt[node];
      }
    }
  }
  // chain offsets in ascending head order
  std::vector<int64_t> offs(nh + 1, 0);
  for (int64_t h = 0; h < nh; ++h) offs[h + 1] = offs[h] + lens[h];

  std::vector<uint8_t> visited(n, 0);
  // pass 2: emit nodes (interleaved walks, direct writes)
  {
    int64_t budget = n;
    int64_t next_head = 0;
    int64_t cur[kWays];
    int64_t pos[kWays];
    for (int w = 0; w < kWays; ++w) cur[w] = -2;
    int live = 0;
    for (int w = 0; w < kWays && next_head < nh; ++w) {
      pos[w] = offs[next_head];
      chain_start[offs[next_head]] = 1;
      cur[w] = heads[next_head++];
      ++live;
    }
    while (live > 0) {
      for (int w = 0; w < kWays; ++w) {
        if (cur[w] < -1) continue;
        int64_t node = cur[w];
        if (node < 0) {
          if (next_head < nh) {
            pos[w] = offs[next_head];
            chain_start[offs[next_head]] = 1;
            cur[w] = heads[next_head++];
          } else {
            cur[w] = -2;
            --live;
          }
          continue;
        }
        if (--budget < 0) { live = 0; break; }
        visited[node] = 1;
        order[pos[w]++] = node;
        cur[w] = nxt[node];
      }
    }
  }
  int64_t idx = offs[nh];
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
