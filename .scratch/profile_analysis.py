"""Scale profiler for the analysis phase (superbubbles + ploidy sites).

Generates a big synthetic diploid genome, derives a k-mer count table
directly from the haplotypes (x simulated depth), builds the graph, and
times every analysis stage at scale.
"""

import sys
import time

import numpy as np

K = 25
GENOME_BP = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
HET = float(sys.argv[2]) if len(sys.argv) > 2 else 0.01
DEPTH = 25


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label:30s} {dt:8.2f}s", flush=True)
    return out, dt


def main():
    from ploidyfrost_tpu.util.jaxcache import warm_backend_async

    warm_backend_async(search=True)
    from ploidyfrost_tpu.graph.construct import build_graph_from_kmers
    from ploidyfrost_tpu.kmer.pack import canonical_np, sequence_kmers_np
    from ploidyfrost_tpu.kmer.countdb import KmerCountDB
    from ploidyfrost_tpu.bubble.batched import find_superbubbles_device, search_seeds
    from ploidyfrost_tpu.sites.emit import analyze_bubbles, write_outputs
    from ploidyfrost_tpu.pipeline import unitig_coverage, window_coverage

    rng = np.random.default_rng(7)
    g1 = rng.integers(0, 4, GENOME_BP).astype(np.uint8)
    g2 = g1.copy()
    snp = rng.random(GENOME_BP) < HET
    g2[snp] = (g2[snp] + rng.integers(1, 4, snp.sum())) % 4
    print(f"genome {GENOME_BP} bp, {snp.sum()} het SNPs")

    def make_kmers():
        k1, _ = sequence_kmers_np(g1, K)
        k2, _ = sequence_kmers_np(g2, K)
        allk = canonical_np(np.concatenate([k1, k2]), K)
        km, mult = np.unique(allk, return_counts=True)
        ct = mult * DEPTH // 2 + rng.integers(0, 5, len(km))
        return km, ct.astype(np.int64)

    (km, ct), _ = t("kmer tables (host)", make_kmers)
    print(f"{len(km)} distinct kmers")

    g, _ = t("build_graph_from_kmers", lambda: build_graph_from_kmers(km, K))
    print(f"{len(g)} unitigs, {g.total_length()} bp")
    _, dt_adj = t("adjacency", lambda: g._succ is not None and None)

    db, _ = t("CountDB", lambda: KmerCountDB(km, ct, K))

    (res := {})
    def search():
        state, bubbles = find_superbubbles_device(g, 8)
        res["state"], res["bubbles"] = state, bubbles
        return bubbles

    bubbles, dt_bub = t("find_superbubbles_device", search)
    print(f"{len(bubbles)} bubbles")

    (cov, _) , dt_cov = t("unitig_coverage", lambda: unitig_coverage(db, g))
    ucov, umin = unitig_coverage(db, g)

    def analyze():
        return analyze_bubbles(g, res["state"], ucov, umin, 10, 1000)

    (em_ws), dt_an = t("analyze_bubbles", analyze)
    emissions, window_strings = em_ws
    nsites = sum(len(e.sites) for e in emissions)
    print(f"{len(emissions)} aligned bubbles, {nsites} sites, {len(window_strings)} windows")

    wcov, dt_w = t("window_coverage", lambda: window_coverage(db, window_strings, 10, 1000))
    _, dt_out = t("write_outputs", lambda: write_outputs(emissions, wcov, "prof", outdir="/tmp/prof_out"))

    total = dt_bub + dt_cov + dt_an + dt_w + dt_out
    print(f"analysis total: {total:.2f}s -> {(len(bubbles) + nsites) / total:.0f} bubbles+sites/s")


if __name__ == "__main__":
    main()
