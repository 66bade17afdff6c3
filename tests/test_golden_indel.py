"""Golden end-to-end parity on a 1 Mbp TETRAPLOID indel-dense config.

The small single_diploid fixture (100 kb, 20 indels) exercises the SNP
fast path almost exclusively; this config forces the hard alignment
surfaces — MULTI-BRANCH bubbles (tri/tetra-allelic sites from four
haplotypes mutating at shared positions), co-optimal traceback ties,
and the 5-indel-run cap (/root/reference/src/SeqAlign.cpp:306-478) —
via ~900 scattered 1-6 bp indels plus clustered indel runs on a 1 Mbp
tetraploid. Fixtures in tests/golden/indel_dense/ are the reference
binary's outputs on inputs produced by THIS framework
(tests/golden/regenerate.py --only indel)."""

import os

import numpy as np
import pytest

GOLD = os.path.join(os.path.dirname(__file__), "golden", "indel_dense")

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

CUTOFFS = (10, 83)  # pinned from the fixture run
PLOIDY = 4


def make_indel_reads(path: str):
    rng = np.random.default_rng(13)
    G = 1_000_000
    g0 = rng.integers(0, 4, G)
    # shared variant positions: haplotypes mutating at the SAME site
    # with independent alleles produce tri- and tetra-allelic columns
    var_pos = np.flatnonzero(rng.random(G) < 0.006)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    haps = [bases[g0].tobytes().decode()]
    for _ in range(3):
        g = g0.copy()
        hit = var_pos[rng.random(len(var_pos)) < 0.6]
        g[hit] = (g[hit] + rng.integers(1, 4, len(hit))) % 4
        hl = list(bases[g].tobytes().decode())
        # ~300 scattered indels per haplotype, 1-6 bp
        for pos in sorted(rng.integers(1000, G - 1000, 300), reverse=True):
            ln = int(rng.integers(1, 7))
            if rng.random() < 0.5:
                hl[pos:pos] = ["ACGT"[rng.integers(0, 4)] for _ in range(ln)]
            else:
                del hl[pos : pos + ln]
        # clustered indel runs (several indels within ~60 bp) to push
        # the traceback's 5-indel-run cap and co-optimal ties
        for base_pos in sorted(rng.integers(5000, G - 5000, 8), reverse=True):
            for _ in range(int(rng.integers(3, 6))):
                pos = base_pos + int(rng.integers(0, 60))
                if rng.random() < 0.5:
                    hl[pos:pos] = ["ACGT"[rng.integers(0, 4)]]
                else:
                    del hl[pos : pos + 1]
        haps.append("".join(hl))
    with open(path, "w") as f:
        n = 0
        for hap in haps:
            for _ in range(18):
                for s in rng.integers(0, len(hap) - 150, len(hap) // 150):
                    n += 1
                    f.write(f">r{n}\n{hap[s:s+150]}\n")


def prepare_inputs(d: str):
    """Count + cutoffs + graph + db, shared by the test and the fixture
    regeneration (tests/golden/regenerate.py). Returns (lower, upper)."""
    from ploidyfrost_tpu.graph.construct import build_graph_from_kmers, simplify
    from ploidyfrost_tpu.io.fastx import read_batches
    from ploidyfrost_tpu.kmer.count import KmerCounter
    from ploidyfrost_tpu.kmer.cutoffs import (
        cutoff_lower_from_counts,
        cutoff_upper_from_counts,
    )

    counter = KmerCounter(25, initial_capacity=1 << 21)
    for b in read_batches([os.path.join(d, "reads.fa")], 25):
        counter.add_reads(b)
    km, ct = counter.arrays()
    km = np.asarray(km, dtype=np.uint64)
    ct = np.asarray(ct)
    hist = counter.histogram(10000)
    lower = max(10, cutoff_lower_from_counts(list(hist[1:])))
    upper = cutoff_upper_from_counts(list(hist[1:]), 0.998)
    g = simplify(build_graph_from_kmers(km[ct >= lower], 25), 25)
    g.write_gfa(os.path.join(d, "mygraph.gfa"))
    np.savez(os.path.join(d, "mydb.npz"), kmers=km, counts=ct, k=25)
    return km, ct, lower, upper


@pytest.fixture(scope="module")
def golden_indel_run(tmp_path_factory):
    d = tmp_path_factory.mktemp("golden_indel")
    cwd = os.getcwd()
    os.chdir(d)
    try:
        make_indel_reads("reads.fa")
        _, _, lower, upper = prepare_inputs(str(d))
        assert (lower, upper) == CUTOFFS  # matches the fixture run

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
        assert ploidy == PLOIDY
        yield str(d)
    finally:
        os.chdir(cwd)


@pytest.mark.parametrize("name", FILES)
def test_golden_indel_table(golden_indel_run, name):
    mine = os.path.join(
        golden_indel_run, "PloidyFrost_output", f"gold_{name}.txt"
    )
    gold = os.path.join(GOLD, f"gold_{name}.txt")
    with open(mine, "rb") as f1, open(gold, "rb") as f2:
        assert f1.read() == f2.read(), f"{name} differs from reference output"


def test_golden_indel_model_result(golden_indel_run):
    with open(
        os.path.join(golden_indel_run, "gold_model_result.txt"), "rb"
    ) as f1, open(os.path.join(GOLD, "gold_model_result.txt"), "rb") as f2:
        assert f1.read() == f2.read()
