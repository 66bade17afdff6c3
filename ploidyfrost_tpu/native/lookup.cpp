// Bucketed binary-search lookup over a sorted uint64 k-mer table.
//
// Replaces np.searchsorted for the coverage-resolution probes
// (KmerCountDB.lookup — the batched replacement of the reference's
// CKMCFile::CheckKmer prefix-LUT + binary search,
// KMC/kmc_api/kmc_file.cpp). Same two-level structure as KMC's own
// format: a 2^16-entry prefix LUT narrows each probe to a ~100-entry
// bucket (L2-resident), then std::lower_bound finishes — ~6x faster
// than numpy's full-range binary search at 6M-entry tables.

#include <algorithm>
#include <cstdint>

extern "C" {

// lut: 2^16+1 bucket start offsets (lut[b] = first index with
// key >> shift >= b); out[i] = lower_bound(table, q[i]) as an index.
void pf_lookup_u64(const uint64_t* table, int64_t n, const int64_t* lut,
                   int32_t shift, const uint64_t* q, int64_t nq,
                   int64_t* out) {
  for (int64_t i = 0; i < nq; ++i) {
    const uint64_t key = q[i];
    uint64_t b = key >> shift;
    if (b > 65535) b = 65535;
    const uint64_t* lo = table + lut[b];
    const uint64_t* hi = table + lut[b + 1];
    out[i] = std::lower_bound(lo, hi, key) - table;
  }
}
}
