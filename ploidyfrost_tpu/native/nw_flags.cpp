// Needleman-Wunsch flag-matrix kernel (C ABI, batch interface).
//
// Computes, for each (A, B) pair, the Up/LeftUp/Left traceback flag
// matrices with semantics identical to align/nw.py:_nw_matrix — itself
// the bit-exact port of the reference DP (PloidyFrost
// src/SeqAlign.cpp:480-549), including:
//   * +1 continuation bonus when the predecessor cell's flag for the
//     same direction is set (SeqAlign.cpp:512-525);
//   * the forbidden Left move into a next-char-of-A '-' position
//     (SeqAlign.cpp:528-532);
//   * integer score cells (integer scoring parameters only — the
//     Python callers fall back to the vectorized wavefront otherwise).
//
// The analysis phase's non-fast-path bubbles have small DP matrices
// (p90 ~100x100); a scalar C loop beats both the device kernel (tunnel
// latency-bound for small batches) and the numpy wavefront (per-
// diagonal interpreter overhead) by orders of magnitude here.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {
constexpr int32_t kIntMin = INT32_MIN;

inline int32_t sub_score(uint8_t x, uint8_t y, int32_t match, int32_t dis,
                         int32_t gap) {
  if (x == y) return match;
  if (x == '-' || y == '-') return gap;
  return dis;
}

// One pair: writes (m+1)*(n+1) bytes each into up/lu/lf.
void nw_one(const uint8_t* A, int64_t m, const uint8_t* B, int64_t n,
            int32_t match, int32_t dis, int32_t gap, uint8_t* up, uint8_t* lu,
            uint8_t* lf, std::vector<int32_t>& prev,
            std::vector<int32_t>& cur) {
  const int64_t w = n + 1;
  prev.resize(w);
  cur.resize(w);
  std::memset(up, 0, (m + 1) * w);
  std::memset(lu, 0, (m + 1) * w);
  std::memset(lf, 0, (m + 1) * w);
  for (int64_t j = 0; j <= n; ++j) prev[j] = gap * (int32_t)j;
  for (int64_t j = 1; j <= n; ++j) lf[j] = 1;
  for (int64_t i = 1; i <= m; ++i) up[i * w] = 1;
  for (int64_t i = 1; i <= m; ++i) {
    uint8_t* up_r = up + i * w;
    uint8_t* lu_r = lu + i * w;
    uint8_t* lf_r = lf + i * w;
    const uint8_t* up_p = up + (i - 1) * w;
    const uint8_t* lu_p = lu + (i - 1) * w;
    cur[0] = gap * (int32_t)i;
    const uint8_t ai = A[i - 1];
    const bool a_next_dash = (i != m) && (A[i] == '-');
    for (int64_t j = 1; j <= n; ++j) {
      int32_t u = prev[j] + gap + (up_p[j] == 1);
      int32_t l2 = prev[j - 1] + sub_score(ai, B[j - 1], match, dis, gap) +
                   (lu_p[j - 1] == 1);
      int32_t l = cur[j - 1] + gap + (lf_r[j - 1] == 1);
      int32_t mx = u > l2 ? u : l2;
      if (l > mx) mx = l;
      if (mx == l && a_next_dash) {
        l = kIntMin;
        mx = u > l2 ? u : l2;
      }
      cur[j] = mx;
      up_r[j] = (u == mx);
      lu_r[j] = (l2 == mx);
      lf_r[j] = (l == mx);
    }
    prev.swap(cur);
  }
}
}  // namespace

extern "C" {

// abuf/bbuf: concatenated byte strings; aoff/boff: npairs+1 offsets.
// out: concatenated per-pair blocks of 3*(m_i+1)*(n_i+1) bytes laid out
// as [Up | LeftUp | Left]; ooff: npairs+1 offsets into out.
void pf_nw_flags_batch(const uint8_t* abuf, const int64_t* aoff,
                       const uint8_t* bbuf, const int64_t* boff,
                       int64_t npairs, int32_t match, int32_t dis,
                       int32_t gap, uint8_t* out, const int64_t* ooff) {
  std::vector<int32_t> prev, cur;
  for (int64_t p = 0; p < npairs; ++p) {
    const int64_t m = aoff[p + 1] - aoff[p];
    const int64_t n = boff[p + 1] - boff[p];
    const int64_t cells = (m + 1) * (n + 1);
    uint8_t* base = out + ooff[p];
    nw_one(abuf + aoff[p], m, bbuf + boff[p], n, match, dis, gap, base,
           base + cells, base + 2 * cells, prev, cur);
  }
}
}
