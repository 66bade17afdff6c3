"""cProfile the host-side analysis tail (unitig_coverage +
analyze_bubbles + write_outputs) at bench5m scale, excluding device
search wait time from the interpretation (it shows as jax blocking)."""

import cProfile
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

K = 25
GENOME_BP = 5_000_000


def main():
    from ploidyfrost_tpu.util.jaxcache import warm_backend_async

    warm_backend_async(search=True)
    from ploidyfrost_tpu.graph.construct import build_graph_from_kmers
    from ploidyfrost_tpu.kmer.pack import canonical_np, sequence_kmers_np
    from ploidyfrost_tpu.kmer.countdb import KmerCountDB
    from ploidyfrost_tpu.bubble.batched import find_superbubbles_device
    from ploidyfrost_tpu.sites.emit import analyze_bubbles, write_outputs
    from ploidyfrost_tpu.pipeline import unitig_coverage, window_coverage

    rng = np.random.default_rng(7)
    g1 = rng.integers(0, 4, GENOME_BP).astype(np.uint8)
    g2 = g1.copy()
    snp = rng.random(GENOME_BP) < 0.01
    g2[snp] = (g2[snp] + rng.integers(1, 4, snp.sum())) % 4
    k1, _ = sequence_kmers_np(g1, K)
    k2, _ = sequence_kmers_np(g2, K)
    allk = canonical_np(np.concatenate([k1, k2]), K)
    km, mult = np.unique(allk, return_counts=True)
    ct = (mult * 25 // 2 + rng.integers(0, 5, len(km))).astype(np.int64)
    g = build_graph_from_kmers(km, K)
    db = KmerCountDB(km, ct, K)
    state, bubbles = find_superbubbles_device(g, 8)

    prof = cProfile.Profile()
    prof.enable()
    t0 = time.perf_counter()
    ucov, umin = unitig_coverage(db, g)
    t1 = time.perf_counter()
    emissions, window_strings = analyze_bubbles(g, state, ucov, umin, 10, 1000)
    t2 = time.perf_counter()
    wcov = window_coverage(db, window_strings, 10, 1000)
    write_outputs(emissions, wcov, "prof", outdir="/tmp/prof_out")
    t3 = time.perf_counter()
    prof.disable()
    print(f"unitig_coverage {t1-t0:.2f}s analyze {t2-t1:.2f}s emit {t3-t2:.2f}s")
    stats = pstats.Stats(prof)
    stats.sort_stats("cumulative").print_stats(30)
    stats.sort_stats("tottime").print_stats(25)


if __name__ == "__main__":
    main()
