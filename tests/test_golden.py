"""Golden end-to-end parity test against the reference binary.

The fixtures in tests/golden/single_diploid/ are the outputs of the
REFERENCE PloidyFrost binary (built from /root/reference, run with
`-t 1 -l 10 -u 37`) on inputs produced by THIS framework:

  * synthetic diploid reads (seed 42, 100 kb genome, ~0.4% het SNPs +
    20 small indels, 14x per haplotype) — regenerated identically here;
  * our counter's KMC1-format database (io/kmc.py writer);
  * our native graph construction's GFA (graph/construct.py).

The test regenerates the same inputs, runs OUR pipeline + model, and
compares every output table byte-for-byte — validating the whole
single-sample slice (SURVEY §7 steps 1-6) in one shot.
"""

import os

import numpy as np
import pytest

GOLD = os.path.join(os.path.dirname(__file__), "golden", "single_diploid")

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


def make_reads(path: str):
    rng = np.random.default_rng(42)
    G = 100_000
    g1 = rng.integers(0, 4, G)
    g2 = g1.copy()
    snp = rng.random(G) < 0.004
    g2[snp] = (g2[snp] + rng.integers(1, 4, snp.sum())) % 4
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    h1 = bases[g1].tobytes().decode()
    h2l = list(bases[g2].tobytes().decode())
    for pos in rng.integers(1000, G - 1000, 20):
        if rng.random() < 0.5:
            h2l[pos:pos] = ["ACGT"[rng.integers(0, 4)] for _ in range(rng.integers(1, 4))]
        else:
            del h2l[pos : pos + int(rng.integers(1, 4))]
    h2 = "".join(h2l)
    with open(path, "w") as f:
        n = 0
        for hap in (h1, h2):
            for _ in range(14):
                for s in rng.integers(0, len(hap) - 150, len(hap) // 150):
                    n += 1
                    f.write(f">r{n}\n{hap[s:s+150]}\n")


@pytest.fixture(scope="module")
def golden_run(tmp_path_factory):
    d = tmp_path_factory.mktemp("golden")
    cwd = os.getcwd()
    os.chdir(d)
    try:
        make_reads("reads.fa")
        from ploidyfrost_tpu.graph.construct import (
            build_graph_from_kmers,
            simplify,
        )
        from ploidyfrost_tpu.io.fastx import read_batches
        from ploidyfrost_tpu.kmer.count import KmerCounter
        from ploidyfrost_tpu.kmer.cutoffs import (
            cutoff_lower_from_counts,
            cutoff_upper_from_counts,
        )

        counter = KmerCounter(25, initial_capacity=1 << 20)
        for b in read_batches(["reads.fa"], 25):
            counter.add_reads(b)
        km, ct = counter.arrays()
        km = np.asarray(km, dtype=np.uint64)
        ct = np.asarray(ct)
        hist = counter.histogram(10000)
        lower = max(10, cutoff_lower_from_counts(list(hist[1:])))
        upper = cutoff_upper_from_counts(list(hist[1:]), 0.998)
        assert (lower, upper) == (10, 37)  # matches the fixture run
        g = simplify(build_graph_from_kmers(km[ct >= lower], 25), 25)
        g.write_gfa("mygraph.gfa")
        np.savez("mydb.npz", kmers=km, counts=ct, k=25)

        from ploidyfrost_tpu.cli import Options
        from ploidyfrost_tpu.pipeline import run_analysis

        opt = Options()
        opt.graphfile = "mygraph.gfa"
        opt.db = "mydb.npz"
        opt.outprefix = "gold"
        opt.coverage_lower = lower
        opt.coverage_upper = upper
        assert run_analysis(opt) == 0

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
def test_golden_table(golden_run, name):
    mine = os.path.join(
        golden_run, "PloidyFrost_output", f"gold_{name}.txt"
    )
    gold = os.path.join(GOLD, f"gold_{name}.txt")
    with open(mine, "rb") as f1, open(gold, "rb") as f2:
        assert f1.read() == f2.read(), f"{name} differs from reference output"


def test_golden_model_result(golden_run):
    with open(os.path.join(golden_run, "gold_model_result.txt"), "rb") as f1, open(
        os.path.join(GOLD, "gold_model_result.txt"), "rb"
    ) as f2:
        assert f1.read() == f2.read()
