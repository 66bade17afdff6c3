"""50 Mbp analysis scale point (VERDICT r5 task 4): time the `run`
phase (GFA load -> setUnitigId -> findSuperBubble -> ploidyEstimation
-> tables) at 1M+ unitigs for BOTH our CLI and the reference binary on
identical inputs (our GFA + counts, fed to the reference through the
KMC1 writer). Dataset: 50 Mbp diploid, 1% het, seed 7 — the same
recipe as the 5 Mbp bench point, scaled 10x.

Usage: python .scratch/measure_analysis50.py [ours|ref|both] [reps]
Artifacts cached in /tmp/analysis50 so reruns skip generation.
"""

import os
import re
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

K = 25
G = 50_000_000
HET = 0.01
REF_BIN = "/root/repo/.refbuild/PloidyFrost"
WORK = "/tmp/analysis50"


def prepare():
    from ploidyfrost_tpu.graph.construct import build_graph_from_kmers
    from ploidyfrost_tpu.io.kmc import write_kmc_db
    from ploidyfrost_tpu.kmer.pack import canonical_np, sequence_kmers_np

    os.makedirs(WORK, exist_ok=True)
    os.chdir(WORK)
    if os.path.exists("g.gfa") and os.path.exists("db.kmers.npz"):
        return
    rng = np.random.default_rng(7)
    g1 = rng.integers(0, 4, G).astype(np.uint8)
    g2 = g1.copy()
    snp = rng.random(G) < HET
    g2[snp] = (g2[snp] + rng.integers(1, 4, snp.sum())) % 4
    k1, _ = sequence_kmers_np(g1, K)
    k2, _ = sequence_kmers_np(g2, K)
    km, mult = np.unique(
        canonical_np(np.concatenate([k1, k2]), K), return_counts=True
    )
    del k1, k2, g1, g2
    ct = np.minimum(mult * 12 + rng.integers(0, 5, len(km)), 10000).astype(
        np.int64
    )
    print(f"{len(km)} kmers", flush=True)
    t0 = time.perf_counter()
    g = build_graph_from_kmers(km, K)
    print(
        f"build: {time.perf_counter()-t0:.1f}s, {len(g)} unitigs",
        flush=True,
    )
    g.write_gfa("g.gfa")
    np.savez("db.kmers.npz", kmers=km, counts=ct, k=K)
    write_kmc_db("db", km, ct, K)


def run_ours(rep):
    t0 = time.perf_counter()
    p = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys; sys.path.insert(0,'/root/repo');"
            "from ploidyfrost_tpu.cli import main;"
            "sys.exit(main(sys.argv[1:]))",
            "-g", "g.gfa", "-d", "db.kmers.npz", "-o", f"ours{rep}",
            "-l", "10", "-u", "1000",
        ],
        capture_output=True,
        text=True,
        timeout=7200,
    )
    wall = time.perf_counter() - t0
    print(f"=== ours rep{rep}: wall {wall:.1f}s rc={p.returncode}", flush=True)
    for line in p.stdout.splitlines():
        if re.search(r"time|Bubble|Coverage|Alleles|bubble", line):
            print("  ", line, flush=True)
    if p.returncode:
        print(p.stdout[-3000:])
        print(p.stderr[-3000:])


def run_ref(threads, rep):
    t0 = time.perf_counter()
    p = subprocess.run(
        [REF_BIN, "-g", "g.gfa", "-d", "db", "-o", f"ref{rep}_t{threads}",
         "-t", str(threads), "-l", "10", "-u", "1000"],
        capture_output=True, text=True, timeout=14400,
    )
    wall = time.perf_counter() - t0
    print(
        f"=== reference -t {threads} rep{rep}: wall {wall:.1f}s "
        f"rc={p.returncode}",
        flush=True,
    )
    for line in p.stdout.splitlines():
        if re.search(r"time|Bubble|Coverage|Alleles", line):
            print("  ", line, flush=True)
    if p.returncode:
        print(p.stderr[-2000:])


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    prepare()
    for r in range(reps):
        if which in ("ours", "both"):
            run_ours(r)
        if which in ("ref", "both"):
            run_ref(2, r)
