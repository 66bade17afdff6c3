"""Regenerate the golden fixtures from the REFERENCE binary.

The oracle recipe (VERDICT r1 asked for this to be committed): fixtures
under tests/golden/{single_diploid,multi_colored}/ are reference-binary
outputs on inputs produced by THIS framework. If an output-format
question ever arises, rerun this script — it rebuilds the reference,
regenerates the identical synthetic inputs (same seeds as the tests),
runs the reference binary on them, and refreshes the fixture files.

Usage (from the repo root; needs cmake + g++, network NOT required):

    python tests/golden/regenerate.py [--refbuild DIR]

Steps:
  1. cmake+make /root/reference out-of-tree into .refbuild/ (cached);
  2. single_diploid: make_reads (tests/test_golden.py seeds) -> our
     counter -> KMC1 db (io/kmc.py writer) + our construction's GFA ->
     reference run `-t 1 -l 10 -u 37` + `model -g` -> copy tables;
  3. multi_colored: make_sample_reads (tests/test_golden_colored.py) ->
     per-sample KMC1 dbs + colored GFA/.bfg_colors from our writers ->
     reference run `-f -C -t 1` + `model -g` -> copy tables.
"""

import argparse
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

FILES = [
    "Unitig_Id", "super_bubble", "alignseq", "bicov", "bifre", "tricov",
    "trifre", "tetracov", "tetrafre", "pentacov", "pentafre",
    "allele_frequency",
]


def build_reference(refbuild: str) -> str:
    binpath = os.path.join(refbuild, "PloidyFrost")
    if os.path.exists(binpath):
        return binpath
    os.makedirs(refbuild, exist_ok=True)
    subprocess.run(["cmake", "/root/reference"], cwd=refbuild, check=True)
    subprocess.run(["make", "-j", "4"], cwd=refbuild, check=True)
    return binpath


def run(cmd, cwd):
    print("+", " ".join(cmd))
    subprocess.run(cmd, cwd=cwd, check=True)


def copy_tables(outdir: str, dest: str, extra=("model_result",)):
    os.makedirs(dest, exist_ok=True)
    for name in list(FILES) + list(extra):
        src = os.path.join(outdir, f"gold_{name}.txt")
        shutil.copy(src, os.path.join(dest, f"gold_{name}.txt"))
        print(f"  -> {dest}/gold_{name}.txt")


def regen_single(ref_bin: str, dest: str):
    import numpy as np

    from ploidyfrost_tpu.graph.construct import build_graph_from_kmers, simplify
    from ploidyfrost_tpu.io.fastx import read_batches
    from ploidyfrost_tpu.io.kmc import write_kmc_db
    from ploidyfrost_tpu.kmer.count import KmerCounter
    from ploidyfrost_tpu.kmer.cutoffs import (
        cutoff_lower_from_counts,
        cutoff_upper_from_counts,
    )
    from test_golden import make_reads

    d = tempfile.mkdtemp(prefix="golden_single_")
    make_reads(os.path.join(d, "reads.fa"))
    counter = KmerCounter(25, initial_capacity=1 << 20)
    for b in read_batches([os.path.join(d, "reads.fa")], 25):
        counter.add_reads(b)
    km, ct = counter.arrays()
    km = np.asarray(km, dtype=np.uint64)
    ct = np.asarray(ct)
    hist = counter.histogram(10000)
    lower = max(10, cutoff_lower_from_counts(list(hist[1:])))
    upper = cutoff_upper_from_counts(list(hist[1:]), 0.998)
    assert (lower, upper) == (10, 37), (lower, upper)
    g = simplify(build_graph_from_kmers(km[ct >= lower], 25), 25)
    g.write_gfa(os.path.join(d, "mygraph.gfa"))
    write_kmc_db(os.path.join(d, "mydb"), km, ct, 25)
    run([ref_bin, "-g", "mygraph.gfa", "-d", "mydb", "-o", "gold",
         "-t", "1", "-l", str(lower), "-u", str(upper)], cwd=d)
    outdir = os.path.join(d, "PloidyFrost_output")
    run([ref_bin, "model",
         "-g", os.path.join(outdir, "gold_allele_frequency.txt"),
         "-o", os.path.join(outdir, "gold")], cwd=d)
    copy_tables(outdir, dest)
    print(f"single_diploid fixtures refreshed (workdir kept: {d})")


def regen_indel(ref_bin: str, dest: str):
    from test_golden_indel import make_indel_reads, prepare_inputs

    from ploidyfrost_tpu.io.kmc import write_kmc_db

    d = tempfile.mkdtemp(prefix="golden_indel_")
    make_indel_reads(os.path.join(d, "reads.fa"))
    km, ct, lower, upper = prepare_inputs(d)
    print(f"indel_dense cutoffs: ({lower}, {upper}) — pin in test")
    write_kmc_db(os.path.join(d, "mydb"), km, ct, 25)
    run([ref_bin, "-g", "mygraph.gfa", "-d", "mydb", "-o", "gold",
         "-t", "1", "-l", str(lower), "-u", str(upper)], cwd=d)
    outdir = os.path.join(d, "PloidyFrost_output")
    run([ref_bin, "model",
         "-g", os.path.join(outdir, "gold_allele_frequency.txt"),
         "-o", os.path.join(outdir, "gold")], cwd=d)
    copy_tables(outdir, dest)
    print(f"indel_dense fixtures refreshed (workdir kept: {d})")


def regen_colored(ref_bin: str, dest: str):
    import numpy as np

    from ploidyfrost_tpu.graph.colors import color_graph
    from ploidyfrost_tpu.graph.construct import build_graph_from_kmers, simplify
    from ploidyfrost_tpu.io.bfg import write_bfg_colors
    from ploidyfrost_tpu.io.fastx import read_batches
    from ploidyfrost_tpu.io.kmc import write_kmc_db
    from ploidyfrost_tpu.kmer.count import KmerCounter
    from ploidyfrost_tpu.kmer.cutoffs import (
        cutoff_lower_from_counts,
        cutoff_upper_from_counts,
    )
    from test_golden_colored import make_sample_reads

    d = tempfile.mkdtemp(prefix="golden_colored_")
    paths = make_sample_reads(d)
    filtered, cutoffs = [], []
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
        write_kmc_db(os.path.join(d, f"s{i}db"), km, ct, 25)
        filtered.append(km[ct >= lower])
    assert cutoffs == [(10, 39), (10, 41), (10, 37)], cutoffs
    union = np.unique(np.concatenate(filtered))
    g = simplify(build_graph_from_kmers(union, 25), 25)
    colors = color_graph(g, filtered, [f"s{i}.fa" for i in range(3)])
    da = write_bfg_colors(os.path.join(d, "ref.bfg_colors"), g, colors)
    g.write_gfa(os.path.join(d, "ref.gfa"), da_ids=da)
    with open(os.path.join(d, "list.txt"), "w") as f:
        for i in range(3):
            f.write(f"s{i}db\n")
    with open(os.path.join(d, "cov.txt"), "w") as f:
        for lo, up in cutoffs:
            f.write(f"{lo}\t{up}\n")
    run([ref_bin, "-g", "ref.gfa", "-f", "ref.bfg_colors", "-d", "list.txt",
         "-C", "cov.txt", "-o", "gold", "-t", "1"], cwd=d)
    outdir = os.path.join(d, "PloidyFrost_output")
    run([ref_bin, "model",
         "-g", os.path.join(outdir, "gold_allele_frequency.txt"),
         "-o", os.path.join(outdir, "gold")], cwd=d)
    copy_tables(outdir, dest)
    print(f"multi_colored fixtures refreshed (workdir kept: {d})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--refbuild", default=os.path.join(REPO, ".refbuild"))
    ap.add_argument("--only", choices=["single", "colored", "indel"])
    args = ap.parse_args()
    ref_bin = build_reference(args.refbuild)
    here = os.path.dirname(os.path.abspath(__file__))
    if args.only in (None, "single"):
        regen_single(ref_bin, os.path.join(here, "single_diploid"))
    if args.only in (None, "colored"):
        regen_colored(ref_bin, os.path.join(here, "multi_colored"))
    if args.only in (None, "indel"):
        regen_indel(ref_bin, os.path.join(here, "indel_dense"))


if __name__ == "__main__":
    main()
