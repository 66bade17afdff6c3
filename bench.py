"""Headline benchmark: canonical k-mer counting throughput (k-mers/s/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md): the baseline constant
below is the self-measured throughput of the reference stack's counting
stage (KMC's role) on this image's CPU — see BASELINE.md's
self-measurement protocol. Until the reference binary run is recorded,
vs_baseline uses a conservative placeholder of 3e7 k-mers/s (typical
single-host KMC2 throughput order of magnitude).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_KMERS_PER_S = 3.0e7  # placeholder; updated when reference is measured
K = 25
BATCH_READS = 8192
READ_LEN = 151
WARMUP = 2
ITERS = 8


def main():
    import jax

    from ploidyfrost_tpu.kmer.count import KmerCounter

    rng = np.random.default_rng(0)
    # genome-like reads: sample windows of a fixed 2 Mbp synthetic genome
    # so k-mers repeat at realistic coverage instead of being all-unique
    genome = rng.integers(0, 4, size=2_000_000).astype(np.uint8)
    def make_batch():
        starts = rng.integers(0, len(genome) - READ_LEN, size=BATCH_READS)
        return np.stack([genome[s : s + READ_LEN] for s in starts])

    batches = [make_batch() for _ in range(3)]
    kmers_per_batch = BATCH_READS * (READ_LEN - K + 1)

    # capacity pre-sized to the genome's distinct k-mers + one batch of slack
    counter = KmerCounter(K, initial_capacity=4 << 20)
    # warmup / compile
    for i in range(WARMUP):
        counter.add_reads(batches[i % len(batches)])
    jax.block_until_ready(counter._km)

    t0 = time.perf_counter()
    n = 0
    for i in range(ITERS):
        counter.add_reads(batches[i % len(batches)])
        n += kmers_per_batch
    jax.block_until_ready(counter._km)
    dt = time.perf_counter() - t0
    kmers_per_s = n / dt

    print(
        json.dumps(
            {
                "metric": "kmer_count_throughput",
                "value": round(kmers_per_s, 1),
                "unit": "kmers/s/chip",
                "vs_baseline": round(kmers_per_s / BASELINE_KMERS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
