"""Measure the reference PloidyFrost binary's phase timings (BASELINE.md
protocol step 1) on a synthetic 5Mbp diploid dataset produced by our
stack (GFA + KMC1 database)."""

import os
import re
import subprocess
import sys
import time

import numpy as np

K = 25
G = 5_000_000
HET = 0.01
REF_BIN = "/root/repo/.refbuild/PloidyFrost"
WORK = "/tmp/baseline5m"


def main():
    from ploidyfrost_tpu.graph.construct import build_graph_from_kmers
    from ploidyfrost_tpu.io.kmc import write_kmc_db
    from ploidyfrost_tpu.kmer.pack import canonical_np, sequence_kmers_np

    os.makedirs(WORK, exist_ok=True)
    os.chdir(WORK)
    rng = np.random.default_rng(7)
    g1 = rng.integers(0, 4, G).astype(np.uint8)
    g2 = g1.copy()
    snp = rng.random(G) < HET
    g2[snp] = (g2[snp] + rng.integers(1, 4, snp.sum())) % 4
    k1, _ = sequence_kmers_np(g1, K)
    k2, _ = sequence_kmers_np(g2, K)
    km, mult = np.unique(canonical_np(np.concatenate([k1, k2]), K), return_counts=True)
    ct = np.minimum(mult * 12 + rng.integers(0, 5, len(km)), 10000).astype(np.int64)
    print(f"{len(km)} kmers", flush=True)

    if not os.path.exists("g.gfa"):
        t0 = time.perf_counter()
        g = build_graph_from_kmers(km, K)
        print(f"our build: {time.perf_counter()-t0:.1f}s, {len(g)} unitigs", flush=True)
        g.write_gfa("g.gfa")
        write_kmc_db("db", km, ct, K)

    for threads in (int(sys.argv[1]) if len(sys.argv) > 1 else 8,):
        t0 = time.perf_counter()
        p = subprocess.run(
            [REF_BIN, "-g", "g.gfa", "-d", "db", "-o", f"ref_t{threads}",
             "-t", str(threads), "-l", "10", "-u", "1000"],
            capture_output=True, text=True, timeout=7200,
        )
        wall = time.perf_counter() - t0
        print(f"=== reference -t {threads}: total wall {wall:.1f}s rc={p.returncode}")
        for line in p.stdout.splitlines():
            if re.search(r"time|Bubble|Coverage|Alleles", line):
                print("  ", line)
        if p.returncode:
            print(p.stderr[-2000:])


if __name__ == "__main__":
    main()
