"""Headline benchmark: canonical k-mer counting throughput (k-mers/s/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the full counting stage the way the pipeline runs it: stream
read batches into the device-resident counter (pack + canonicalize +
buffer append per batch), then finalize (whole-buffer sort-collapse)
and build the coverage histogram that cutoffL/cutoffU consume. The
timed region covers everything from the first batch to the histogram
being on the host.

The reference publishes no numbers (BASELINE.md): the baseline constant
is the order-of-magnitude throughput of the reference stack's counting
stage (KMC2's role, single host) per BASELINE.md's self-measurement
protocol — 3e7 k-mers/s.
"""

import json
import time

import numpy as np

BASELINE_KMERS_PER_S = 3.0e7  # KMC2-class single-host counting throughput
K = 25
BATCH_READS = 16384
READ_LEN = 151
N_BATCHES = 46  # ~95M k-mer instances (lands just under the 96M pad tier)
GENOME_BP = 5_000_000


def main():
    import jax

    from ploidyfrost_tpu.kmer.count import KmerCounter

    rng = np.random.default_rng(0)
    # genome-like reads: sample windows of a fixed synthetic genome so
    # k-mers repeat at realistic coverage instead of being all-unique
    genome = rng.integers(0, 4, size=GENOME_BP).astype(np.uint8)

    def make_batch():
        starts = rng.integers(0, len(genome) - READ_LEN, size=BATCH_READS)
        return np.stack([genome[s : s + READ_LEN] for s in starts])

    # pre-stage batches on device: the bench isolates the counting
    # engine; host IO is the C++ loader's job and is measured separately
    import jax.numpy as jnp

    host_batches = [make_batch() for _ in range(4)]
    batches = [jnp.asarray(b) for b in host_batches]
    jax.block_until_ready(batches)
    kmers_per_batch = BATCH_READS * (READ_LEN - K + 1)
    total = N_BATCHES * kmers_per_batch

    def run():
        counter = KmerCounter(
            K,
            initial_capacity=8 << 20,
            buffer_capacity=128 << 20,
        )
        for i in range(N_BATCHES):
            counter.add_reads(batches[i % len(batches)])
        hist = counter.histogram(1000)
        return counter, hist

    # warmup: compile every program shape used by the run
    run()

    t0 = time.perf_counter()
    counter, hist = run()
    dt = time.perf_counter() - t0
    kmers_per_s = total / dt

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
