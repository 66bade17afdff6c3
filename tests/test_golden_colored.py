"""Colored (multi-sample) golden end-to-end parity test.

The fixtures in tests/golden/multi_colored/ are the outputs of the
REFERENCE PloidyFrost binary (built from /root/reference, run with
`-g ref.gfa -f ref.bfg_colors -d kmc_list -C cov_file -t 1`) on inputs
produced by THIS framework:

  * 3 synthetic diploid samples (seed 7, 60 kb shared genome, per-sample
    ~0.3% het SNPs, 14x per haplotype) — regenerated identically here;
  * our native colored graph construction (graph/colors.py) serialized
    through our GFA (DA:Z tags) + .bfg_colors writer (io/bfg.py) —
    the reference binary consumed those exact files;
  * our counter's count tables, which the reference consumed through our
    KMC1-format database writer (io/kmc.py).

The model fixture is the reference `PloidyFrost model -g` run on the
(identical) allele frequency file.

The test regenerates the same inputs, round-trips the colored graph
through the .bfg_colors writer AND reader, runs OUR colored analysis +
model, and compares every table byte-for-byte — covering the whole
multi-sample slice (SURVEY §7 step 7) in one shot.
"""

import os

import numpy as np
import pytest

GOLD = os.path.join(os.path.dirname(__file__), "golden", "multi_colored")

FILES = [
    "Unitig_Id",
    "super_bubble",
    "alignseq",
    "bicov",
    "bifre",
    "tricov",
    "trifre",
    "tetracov",
    "tetrafre",
    "pentacov",
    "pentafre",
    "allele_frequency",
]


def make_sample_reads(d):
    rng = np.random.default_rng(7)
    G = 60_000
    g1 = rng.integers(0, 4, G)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    paths = []
    for s in range(3):
        h1 = g1.copy()
        h2 = g1.copy()
        snp = rng.random(G) < 0.003
        h2[snp] = (h2[snp] + rng.integers(1, 4, snp.sum())) % 4
        path = os.path.join(d, f"s{s}.fa")
        with open(path, "w") as f:
            n = 0
            for hap in (h1, h2):
                seq = bases[hap].tobytes().decode()
                for _ in range(14):
                    for st in rng.integers(0, G - 150, G // 150):
                        n += 1
                        f.write(f">r{n}\n{seq[st:st+150]}\n")
        paths.append(path)
    return paths


@pytest.fixture(scope="module")
def colored_run(tmp_path_factory):
    d = tmp_path_factory.mktemp("colored")
    cwd = os.getcwd()
    os.chdir(d)
    try:
        paths = make_sample_reads(str(d))
        from ploidyfrost_tpu.graph.cdbg import CDBGraph
        from ploidyfrost_tpu.graph.colors import color_graph
        from ploidyfrost_tpu.graph.construct import (
            build_graph_from_kmers,
            simplify,
        )
        from ploidyfrost_tpu.io.bfg import read_bfg_colors, write_bfg_colors
        from ploidyfrost_tpu.io.fastx import read_batches
        from ploidyfrost_tpu.kmer.count import KmerCounter
        from ploidyfrost_tpu.kmer.cutoffs import (
            cutoff_lower_from_counts,
            cutoff_upper_from_counts,
        )

        filtered = []
        cutoffs = []
        for i, p in enumerate(paths):
            counter = KmerCounter(25, initial_capacity=1 << 20)
            for b in read_batches([p], 25):
                counter.add_reads(b)
            hist = counter.histogram(10000)
            lower = max(10, cutoff_lower_from_counts(list(hist[1:])))
            upper = cutoff_upper_from_counts(list(hist[1:]), 0.998)
            cutoffs.append((lower, upper))
            km, ct = counter.arrays()
            km = np.asarray(km, dtype=np.uint64)
            ct = np.asarray(ct)
            np.savez(f"s{i}.kmers.npz", kmers=km, counts=ct, k=25)
            filtered.append(km[ct >= lower])
        assert cutoffs == [(10, 39), (10, 41), (10, 37)]  # fixture run
        union = np.unique(np.concatenate(filtered))
        g = simplify(build_graph_from_kmers(union, 25), 25)
        colors = color_graph(g, filtered, [f"s{i}.fa" for i in range(3)])
        # serialize through the Bifrost-compat writer, reload through the
        # reader: the reference binary consumed these very bytes
        da = write_bfg_colors("ref.bfg_colors", g, colors)
        g.write_gfa("ref.gfa", da_ids=da)
        g2 = CDBGraph.from_gfa("ref.gfa")
        colors2 = read_bfg_colors("ref.bfg_colors", g2)
        assert (colors2.bits == colors.bits).all()

        with open("list.txt", "w") as f:
            for i in range(3):
                f.write(f"s{i}.kmers.npz\n")
        from ploidyfrost_tpu.cli import Options
        from ploidyfrost_tpu.pipeline import run_colored_analysis

        opt = Options()
        opt.graphfile = "ref.gfa"
        opt.colorfile = "ref.bfg_colors"
        opt.db = "list.txt"
        opt.outprefix = "gold"
        opt.coverage_vec = cutoffs
        assert run_colored_analysis(opt) == 0

        from ploidyfrost_tpu.model.gmm import run_model

        ploidy = run_model(
            "gold",
            fre_file=os.path.join(
                "PloidyFrost_output", "gold_allele_frequency.txt"
            ),
        )
        assert ploidy == 2
        yield str(d)
    finally:
        os.chdir(cwd)


@pytest.mark.parametrize("name", FILES)
def test_colored_golden_table(colored_run, name):
    mine = os.path.join(colored_run, "PloidyFrost_output", f"gold_{name}.txt")
    gold = os.path.join(GOLD, f"gold_{name}.txt")
    with open(mine, "rb") as f1, open(gold, "rb") as f2:
        assert f1.read() == f2.read(), f"{name} differs from reference output"


def test_colored_golden_model(colored_run):
    with open(os.path.join(colored_run, "gold_model_result.txt"), "rb") as f1, open(
        os.path.join(GOLD, "gold_model_result.txt"), "rb"
    ) as f2:
        assert f1.read() == f2.read()
