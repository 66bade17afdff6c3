"""ploidyfrost_tpu — TPU-native reference-free ploidy estimation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
CMB-BNU/PloidyFrost (reference at /root/reference):

    reads -> k-mer counting (replaces KMC)
          -> compacted de Bruijn graph (replaces Bifrost)
          -> superbubble detection (replaces CDBG/CCDBG drivers)
          -> branch multiple alignment (replaces SeqAlign NW MSA)
          -> variant sites + per-allele coverage (replaces ploidyEstimation)
          -> GMM-EM over allele frequencies (replaces GmmModel)
          -> ploidy call by min AIC.

Design notes (TPU-first, not a translation):
  * k-mer space is a device-resident sorted table; counting is
    pack -> sort -> segment-reduce, lookups are batched searchsorted
    gathers. Multi-chip: hash-sharded over a `shard` mesh axis with
    all_to_all routing and psum histograms (see ploidyfrost_tpu.parallel).
  * the graph is CSR adjacency arrays over unitig ids, built by
    vectorized successor-uniqueness linking + pointer doubling —
    no hash-table walks, no locks.
  * the analysis phase batches every k-mer coverage gather for all
    bubbles into a handful of device calls instead of the reference's
    per-k-mer binary searches (src/CDBG.cpp:66-120).

float64 is enabled globally: the reference does all model/coverage math
in C++ doubles (src/GmmModel.cpp, src/CDBG.cpp:29-120) and output parity
requires 6-significant-digit agreement.
"""

import os as _os

import jax

jax.config.update("jax_enable_x64", True)

# persistent compilation cache: the analysis CLI compiles a few dozen
# programs (EM loops, count-table merges, alignment scorers); caching them
# across processes makes repeat runs start in milliseconds.
_cache_dir = _os.environ.get(
    "PLOIDYFROST_TPU_CACHE", _os.path.expanduser("~/.cache/ploidyfrost_tpu/jax")
)
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
except Exception:  # cache is an optimization only
    pass

__version__ = "0.1.0"
