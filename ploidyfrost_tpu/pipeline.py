"""End-to-end analysis drivers: the main `run` subcommand and the
native `build` / `pipeline` subcommands.

`run_analysis` is the TPU-native replacement of the reference main path
(src/Main.cpp:817-853): load graph -> setUnitigId -> printInfo ->
findSuperBubble -> ploidyEstimation. Coverage resolution is batched onto
the device (see sites/emit.py for the two-pass structure); everything
else is deterministic host orchestration.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def _log(msg: str):
    print(msg, flush=True)


def load_count_db(path: str, k: int):
    """Load a k-mer count table: our .npz (from `count`) or a KMC
    database prefix (.kmc_pre/.kmc_suf, io/kmc.py)."""
    from .kmer.countdb import KmerCountDB

    if path.endswith(".npz") and os.path.exists(path):
        z = np.load(path)
        if int(z["k"]) != k:
            raise SystemExit(
                f"Error: count table k={int(z['k'])} != graph k={k}"
            )
        return KmerCountDB(z["kmers"], z["counts"], k)
    if os.path.exists(path + ".npz"):
        return load_count_db(path + ".npz", k)
    if os.path.exists(path + ".kmc_pre") or path.endswith(".kmc_pre"):
        from .io.kmc import read_kmc_db

        prefix = path[: -len(".kmc_pre")] if path.endswith(".kmc_pre") else path
        km, ct, kk = read_kmc_db(prefix)
        if kk != k:
            raise SystemExit(f"Error: KMC database k={kk} != graph k={k}")
        return KmerCountDB(km, ct, k)
    raise SystemExit(f"Error: Please input the correct kmc database path: {path}")


def unitig_coverage(db, g):
    """Batched readCov(u) for every unitig (src/CDBG.cpp:66-120): mean
    and min k-mer count per unitig, resolved in one bulk probe batch
    against the sorted table (host-side by design: the probes are
    latency-bound and measured faster on host than via device
    round-trips — see kmer/countdb.py).

    The k-mer feed comes straight from the packed SeqStore (vectorized
    extraction, graph/seqstore.py) — no per-unitig string walks."""
    flat, lens = g.store.all_kmers(g.k)
    counts, hit = db.lookup(flat)
    if not hit.all():
        from .kmer.pack import decode_kmers

        missing = decode_kmers([flat[int(np.argmin(hit))]], g.k)[0]
        print(f"CDBG::readCov():{missing} kmer can not found .")
        raise SystemExit(1)
    offs = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    # segment mean/min via reduceat (ufunc.at is orders slower); int64
    # segment sums are exact, so the float64 means match the former
    # float64 reduceat bit-for-bit without copying the 8B/k-mer array
    mean = np.add.reduceat(counts, offs) / lens
    mn = np.minimum.reduceat(counts, offs)
    return mean, mn


def window_coverage(db, strings: list[str], lower: int, upper: int):
    """Batched readCov(s, lower, upper) (src/CDBG.cpp:29-60): for each
    window string, (mean k-mer count, all-counts-in-(lower,upper) flag)."""
    from .kmer.pack import encode_bases
    from .graph.seqstore import SeqStore

    uniq = sorted(set(strings))
    out: dict[str, tuple[float, bool]] = {}
    if not uniq:
        return out
    # one vectorized encode + word-gather k-mer extraction over the
    # whole window corpus (the per-window string_kmers_np loop costs
    # ~130 us/window in python)
    lens = np.array([len(s) - db.k + 1 for s in uniq], dtype=np.int64)
    offs = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    wstore = SeqStore.from_codes(
        encode_bases("".join(uniq)),
        np.array([len(s) for s in uniq], dtype=np.int64),
    )
    flat, _ = wstore.all_kmers(db.k)
    counts, hit = db.lookup(flat)
    if not hit.all():
        from .kmer.pack import decode_kmers

        missing = decode_kmers([flat[int(np.argmin(hit))]], db.k)[0]
        print(f"CDBG::readCov():{missing} kmer can not found .")
        raise SystemExit(1)
    inb = (counts > lower) & (counts < upper)
    starts = offs[:-1]
    ok = np.minimum.reduceat(inb.view(np.uint8), starts) > 0
    mean = np.add.reduceat(counts, starts) / lens
    for i, s in enumerate(uniq):
        out[s] = (float(mean[i]), bool(ok[i]))
    return out


def load_color_matrix(path: str, g):
    """Load unitig colors: our .colors.npz (packed bit matrix) or a
    Bifrost .bfg_colors binary (io/bfg.py reader)."""
    from .graph.colors import ColorMatrix

    if path.endswith(".npz"):
        z = np.load(path, allow_pickle=False)
        bits = np.unpackbits(z["bits"], axis=0)[: int(z["rows"])].astype(bool)
        names = [str(n) for n in z["names"]]
        offsets = z["offsets"]
        return ColorMatrix(offsets, bits, names)
    from .io.bfg import read_bfg_colors

    return read_bfg_colors(path, g)


def save_color_matrix(path: str, colors) -> None:
    np.savez(
        path,
        bits=np.packbits(colors.bits.astype(np.uint8), axis=0),
        rows=colors.bits.shape[0],
        offsets=colors.offsets,
        names=np.array(colors.names),
    )


def write_graph_info_colored(g, colors, outpre: str, verbose: bool):
    """CCDBG::printInfo (src/CCDBG.cpp:2022-2053): graph info plus
    NbColors and one color name per line."""
    lines = (
        f"k:{g.k}\tg:{g.g}\tNbColors:{colors.n_colors}\t"
        f"nbKmer:{g.nb_kmers()}\tnbUnitig:{len(g)}\tlength:{g.total_length()}\n"
        + "".join(c + "\n" for c in colors.names)
    )
    if verbose:
        _log(">>>>>>>>>Graph Information>>>>>>>>>")
        print(lines, end="")
        _log(">>>>>>>>>>>>>>>>>>>>>>>>>>>>>>>>>>>")
    with open(outpre + "_graph_info.txt", "w") as f:
        f.write(lines)


def run_colored_analysis(opt) -> int:
    """The colored main run (src/Main.cpp:777-813): ColoredCDBG read,
    per-color KMC database open, setUnitigId, findSuperBubble,
    colored ploidyEstimation."""
    from .util.jaxcache import warm_backend_async

    warm_backend_async(search=True)  # overlap tunnel init + search warm

    from .bubble.batched import find_superbubbles_device as find_superbubbles
    from .bubble.superbubble import write_superbubble_file
    from .graph.cdbg import CDBGraph
    from .sites.emit_colored import (
        analyze_bubbles_colored,
        unitig_coverage_colored,
        window_coverage_colored,
        write_outputs_colored,
    )

    t0 = time.time()
    _log(f"Loading colored graph from {opt.graphfile} + {opt.colorfile}")
    g = CDBGraph.from_gfa(opt.graphfile)
    colors = load_color_matrix(opt.colorfile, g)
    _log(f"CCDBG: Graph loading Real time : {time.time() - t0}s")

    # one count database per color, listed one prefix per line in opt.db
    # (src/CCDBG.cpp:11-88)
    dbs = []
    with open(opt.db) as f:
        for line in f:
            name = line.rstrip("\n")
            if name:
                dbs.append(load_count_db(name, g.k))
                _log(f"CCDBG::CCDBG(): database {name} initialized")
    if len(dbs) != colors.n_colors:
        raise SystemExit(
            f"Error: {len(dbs)} databases != {colors.n_colors} colors"
        )
    cutoffs = list(opt.coverage_vec)
    if len(cutoffs) != len(dbs):
        raise SystemExit(
            f"Error: {len(cutoffs)} coverage cutoffs != {len(dbs)} databases"
        )
    for i, (lo, up) in enumerate(cutoffs):
        _log(f"CCDBG:: Database {i} Minimum Coverage:{lo}")
        _log(f"CCDBG:: Maximum Coverage:{up}")

    # multi-host: only process 0 writes artifacts (see run_analysis)
    from .parallel.mesh import is_primary

    primary = is_primary()
    os.makedirs("PloidyFrost_output", exist_ok=True)
    if primary:
        g.set_unitig_id(opt.outprefix)
        write_graph_info_colored(g, colors, opt.outprefix, opt.verbose)

    from .parallel.mesh import resolve_mesh

    # overlap host coverage probes + corpus decode with the device
    # search (same latency-hiding as run_analysis; the reference
    # interleaves readCovUni with the walk across pthreads,
    # src/CCDBG.cpp:583-1449)
    from concurrent.futures import ThreadPoolExecutor

    def _cov_and_decode():
        out = unitig_coverage_colored(dbs, g, cutoffs)
        g.seqs.materialize()
        return out

    pool = ThreadPoolExecutor(max_workers=1)
    cov_future = pool.submit(_cov_and_decode)

    _log("CCDBG::findSuperBubble(): Finding superbubbles")
    t0 = time.time()
    state, bubbles = find_superbubbles(
        g, opt.complex_size, colors, mesh=resolve_mesh()
    )
    if primary:
        write_superbubble_file(g, bubbles, opt.outprefix)
    _log(f"CCDBG::findSuperBubble(): Real time : {time.time() - t0}s")
    _log(f"CCDBG::findSuperBubble(): {len(bubbles)}  SuperBubbles Found")
    # reference parity: check_ProgramOptions FORCES bubble=true and p
    # defaults true with no way to unset, so a run always continues to
    # ploidyEstimation; -b is accepted but changes nothing
    # (src/Main.cpp:463, 92-120, 836-850)

    _log(
        "CCDBG::PloidyEstimation():  Analyzing superbubbles to generate sites' information"
    )
    t0 = time.time()
    umean, uok = cov_future.result()
    pool.shutdown()
    emissions, window_strings, window_colors = analyze_bubbles_colored(
        g, colors, state, umean, uok, opt.match, opt.mismatch, opt.gap,
        mesh=resolve_mesh(),
    )
    wcov = window_coverage_colored(dbs, window_strings, cutoffs)
    stats = write_outputs_colored(
        emissions,
        wcov,
        window_colors,
        colors.n_colors,
        opt.outprefix,
        **({} if primary else {"outdir": None}),
    )
    _log(f"CCDBG::PloidyEstimation(): Real time : {time.time() - t0}s")
    a = stats["allele"]
    _log(
        "CCDBG::PloidyEstimation(): Alleles in SuperBubbles  :\t"
        f"2 :{a[0]}\t3 :{a[1]}\t4 :{a[2]}\t5 :{a[3]}"
    )
    if stats["core_num"]:
        _log(
            "CCDBG::PloidyEstimation(): Sites' Average Coverage:"
            f"{stats['core_cov'] // stats['core_num']}"
        )
    return 0


def run_analysis(opt) -> int:
    """The reference main run (src/Main.cpp:764-853): graph load,
    setUnitigId, findSuperBubble, ploidyEstimation."""
    from .util.jaxcache import warm_backend_async

    warm_backend_async(search=True)  # overlap tunnel init + search warm

    from .bubble.batched import find_superbubbles_device as find_superbubbles
    from .bubble.superbubble import write_superbubble_file
    from .graph.cdbg import CDBGraph
    from .sites.emit import analyze_bubbles, write_outputs

    t0 = time.time()
    _log(f"Loading graph from {opt.graphfile}")
    try:
        g = CDBGraph.from_gfa(opt.graphfile)
    except FileNotFoundError:
        print(f"Error: Graph file not found: {opt.graphfile}", file=sys.stderr)
        return 1
    _log(f"Graph loading Real time : {time.time() - t0}s")
    if opt.k and g.k != opt.k and opt.k != 25:
        _log(f"warning: graph k={g.k} overrides -k {opt.k}")

    db = load_count_db(opt.db, g.k)

    # multi-host runs (PLOIDYFROST_COORDINATOR): every process computes
    # the identical tables (the search is distributed over the global
    # mesh, the host tail is redundant); only process 0 writes the
    # shared-filesystem artifacts — same contract as the count path
    from .parallel.mesh import is_primary

    primary = is_primary()
    os.makedirs("PloidyFrost_output", exist_ok=True)
    if primary:
        g.set_unitig_id(opt.outprefix)
        g.write_graph_info(opt.outprefix)
    if opt.verbose:
        _log(">>>>>>>>>Graph Information>>>>>>>>>")
        _log(
            f"k:{g.k}\tg:{g.g}\tnbKmer:{g.nb_kmers()}\t"
            f"nbUnitig:{len(g)}\tlength:{g.total_length()}\t"
        )

    from .util.profiling import maybe_trace

    from .parallel.mesh import resolve_mesh

    # overlap the host-side coverage probes (unitig_coverage: native
    # threaded table scans that release the GIL) with the device
    # superbubble search, whose wall time is dominated by waiting on
    # dispatch + transfers. The reference interleaves readCov with its
    # bubble walk across pthreads (src/CDBG.cpp:1917-2642); this is the
    # same latency-hiding, expressed as one background host task under
    # the device phase. The unitig-string decode the analysis walk needs
    # (SeqStore.materialize) rides the same task.
    from concurrent.futures import ThreadPoolExecutor

    def _cov_and_decode():
        out = unitig_coverage(db, g)
        g.seqs.materialize()  # pre-decode for the analysis walk
        return out

    pool = ThreadPoolExecutor(max_workers=1)
    cov_future = pool.submit(_cov_and_decode)

    _log("findSuperBubble(): Finding superbubbles")
    t0 = time.time()
    with maybe_trace("findSuperBubble"):
        state, bubbles = find_superbubbles(
            g, opt.complex_size, mesh=resolve_mesh()
        )
    if primary:
        write_superbubble_file(g, bubbles, opt.outprefix)
    _log(f"findSuperBubble(): Real time : {time.time() - t0}s")
    _log(f"findSuperBubble(): {len(bubbles)}  SuperBubbles Found")
    # reference parity: -b never stops the run (see run_colored_analysis)

    _log("PloidyEstimation(): Analyzing superbubbles to generate sites' information")
    t0 = time.time()
    with maybe_trace("ploidyEstimation"):
        ucov, umin = cov_future.result()
        pool.shutdown()
        emissions, window_strings = analyze_bubbles(
            g,
            state,
            ucov,
            umin,
            opt.coverage_lower,
            opt.coverage_upper,
            opt.match,
            opt.mismatch,
            opt.gap,
            mesh=resolve_mesh(),
        )
        wcov = window_coverage(
            db, window_strings, opt.coverage_lower, opt.coverage_upper
        )
        stats = write_outputs(
            emissions,
            wcov,
            opt.outprefix,
            **({} if primary else {"outdir": None}),
        )
    _log(f"PloidyEstimation(): Real time : {time.time() - t0}s")
    a = stats["allele"]
    _log(
        "PloidyEstimation(): Alleles in SuperBubbles  :\t"
        f"2 :{a[0]}\t3 :{a[1]}\t4 :{a[2]}\t5 :{a[3]}"
    )
    if stats["core_num"]:
        _log(
            "PloidyEstimation(): Sites' Average Coverage:"
            f"{stats['core_cov'] // stats['core_num']}"
        )
    return 0


def build_graph_cli(opt) -> int:
    """Native compacted-DBG construction from reads (replaces
    `Bifrost build -i -d -k`, script/pipeline/4.bifrost:4)."""
    from .graph.construct import build_graph_from_reads

    if not opt.inputs:
        print("Error: no input reads", file=sys.stderr)
        return 1
    t0 = time.time()
    g, counter = build_graph_from_reads(
        opt.inputs, opt.k, min_count=max(1, opt.coverage_lower if opt.hist else 1)
    )
    _log(
        f"build: {len(g)} unitigs, {g.nb_kmers()} kmers, "
        f"{g.total_length()} bp in {time.time() - t0:.1f}s"
    )
    g.write_gfa(opt.outprefix + ".gfa")
    return 0


def build_colored_graph_cli(opt) -> int:
    """Native COLORED compacted-DBG construction (replaces
    `Bifrost build -i -d -k 25 -c`, script/pipeline/run-multisample.sh).
    Each positional argument is one sample (comma-separated files);
    writes {outprefix}.gfa + {outprefix}.colors.npz."""
    from .graph.colors import color_graph
    from .graph.construct import build_graph_from_kmers, simplify
    from .io.fastx import read_batches
    from .parallel.mesh import make_counter

    if not opt.inputs:
        print("Error: no input samples", file=sys.stderr)
        return 1
    t0 = time.time()
    sample_kmers = []
    names = []
    for sample in opt.inputs:
        files = sample.split(",")
        counter = make_counter(opt.k)
        for batch in read_batches(files, opt.k):
            counter.add_reads(batch)
        km, ct = counter.arrays()
        sample_kmers.append(np.asarray(km, dtype=np.uint64))
        names.append(files[0])
    union = np.unique(np.concatenate(sample_kmers))
    g = simplify(build_graph_from_kmers(union, opt.k), opt.k)
    colors = color_graph(g, sample_kmers, names)
    _log(
        f"build -c: {len(g)} unitigs, {g.nb_kmers()} kmers, "
        f"{colors.n_colors} colors in {time.time() - t0:.1f}s"
    )
    g.write_gfa(opt.outprefix + ".gfa")
    save_color_matrix(opt.outprefix + ".colors.npz", colors)
    return 0


def run_multisample_pipeline_cli(opt) -> int:
    """Native end-to-end multi-sample run (replaces
    script/pipeline/run-multisample.sh): per-sample count + cutoffs ->
    masked k-mer union -> colored graph -> colored analysis -> model.
    Every stage boundary is a durable artifact (SURVEY §5
    checkpoint/resume)."""
    from .util.jaxcache import warm_backend_async

    warm_backend_async(search=True)  # overlap tunnel init + search warm

    from .graph.colors import color_graph
    from .graph.construct import build_graph_from_kmers, simplify
    from .io.fastx import read_batches
    from .kmer.cutoffs import cutoff_lower_from_counts, cutoff_upper_from_counts
    from .model.gmm import run_model
    from .parallel.mesh import make_counter

    if not opt.inputs:
        print("Error: no input samples", file=sys.stderr)
        return 1
    pre = opt.outprefix
    filtered = []
    names = []
    cutoffs = []
    db_list_path = pre + ".kmc_list.txt"
    with open(db_list_path, "w") as dblist, open(
        pre + ".coverage_cutoff.txt", "w"
    ) as covfile:
        for i, sample in enumerate(opt.inputs):
            files = sample.split(",")
            counter = make_counter(opt.k)
            trim = getattr(opt, "trim", None)
            for batch in read_batches(files, opt.k, trim=trim):
                counter.add_reads(batch)
            counter.write_histogram(f"{pre}.s{i}.hist.txt")
            hist = counter.histogram(10000)
            lower = max(10, cutoff_lower_from_counts(list(hist[1:])))
            upper = cutoff_upper_from_counts(list(hist[1:]), opt.frequency)
            _log(f"pipeline-multi: sample {i} cutoffs L={lower} U={upper}")
            km, ct = counter.arrays()
            km = np.asarray(km, dtype=np.uint64)
            ct = np.asarray(ct)
            np.savez(f"{pre}.s{i}.kmers.npz", kmers=km, counts=ct, k=opt.k)
            dblist.write(f"{pre}.s{i}.kmers.npz\n")
            covfile.write(f"{lower}\t{upper}\n")
            cutoffs.append((lower, upper))
            # per-sample masking: keep k-mers with count >= lower
            # (kmc_tools filter -ci<lower>, script/pipeline/3.filter)
            filtered.append(km[ct >= lower])
            names.append(files[0])
    union = np.unique(np.concatenate(filtered))
    g = simplify(build_graph_from_kmers(union, opt.k), opt.k)
    colors = color_graph(g, filtered, names)
    g.write_gfa(pre + ".gfa")
    save_color_matrix(pre + ".colors.npz", colors)
    opt.graphfile = pre + ".gfa"
    opt.colorfile = pre + ".colors.npz"
    opt.db = db_list_path
    opt.coverage_vec = cutoffs
    rc = run_colored_analysis(opt)
    if rc:
        return rc
    ploidy = run_model(
        pre,
        fre_file=os.path.join(
            "PloidyFrost_output", pre + "_allele_frequency.txt"
        ),
        gauss_lower=1,
        gauss_upper=9,
        frequency=0.0,
        max_iter=1000,
        delta=opt.delta,
        m_threshold=opt.mthreshold,
        n_threshold=opt.nthreshold,
    )
    _log(f"estimated ploidy level is : {int(ploidy)}")
    return 0


def run_pipeline_cli(opt) -> int:
    """reads -> count -> graph -> bubbles -> variants -> model, one shot
    (replaces script/pipeline/run.sh)."""
    from .util.jaxcache import warm_backend_async

    warm_backend_async(search=True)  # overlap tunnel init + search warm

    from .kmer.cutoffs import cutoff_lower_from_counts, cutoff_upper_from_counts
    from .model.gmm import run_model

    if not opt.inputs:
        print("Error: no input reads", file=sys.stderr)
        return 1
    from .io.fastx import read_batches
    from .graph.construct import build_graph_from_kmers, simplify
    from .parallel.mesh import make_counter

    counter = make_counter(opt.k)
    for batch in read_batches(opt.inputs, opt.k, trim=getattr(opt, "trim", None)):
        counter.add_reads(batch)
    counter.write_histogram(opt.outprefix + ".hist.txt")
    hist = counter.histogram(10000)
    lower = max(10, cutoff_lower_from_counts(list(hist[1:])))
    upper = cutoff_upper_from_counts(list(hist[1:]), opt.frequency)
    _log(f"pipeline: cutoffs L={lower} U={upper}")
    opt.coverage_lower = lower
    opt.coverage_upper = upper
    km, ct = counter.arrays()
    km = np.asarray(km, dtype=np.uint64)
    ct = np.asarray(ct)
    # graph on k-mers >= lower cutoff = the reference's read-masking
    # stage (kmc_tools filter -ci<lower>, script/pipeline/3.filter)
    g = simplify(build_graph_from_kmers(km[ct >= lower], opt.k), opt.k)
    g.write_gfa(opt.outprefix + ".gfa")
    np.savez(
        opt.outprefix + ".kmers.npz",
        kmers=np.asarray(km),
        counts=np.asarray(ct),
        k=opt.k,
    )
    opt.graphfile = opt.outprefix + ".gfa"
    opt.db = opt.outprefix + ".kmers.npz"
    rc = run_analysis(opt)
    if rc:
        return rc
    ploidy = run_model(
        opt.outprefix,
        fre_file=os.path.join(
            "PloidyFrost_output", opt.outprefix + "_allele_frequency.txt"
        ),
        gauss_lower=1,
        gauss_upper=9,
        frequency=0.0,
        max_iter=1000,
        delta=opt.delta,
        m_threshold=opt.mthreshold,
        n_threshold=opt.nthreshold,
    )
    _log(f"estimated ploidy level is : {int(ploidy)}")
    return 0
