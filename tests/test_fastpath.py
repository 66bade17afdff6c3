"""Fast-path emission (sites/emit._emit_fast) vs the generic MSA path.

The fast path claims: for 2-branch equal-length <=2-mismatch bubbles
under default scoring, skipping NW + traceback + progressive MSA +
compareStrPair produces identical BubbleEmission rows. These tests
cross-validate that claim on randomized strict and branching jobs, and
check the eligibility gate rejects everything else.
"""

import numpy as np
import pytest

from ploidyfrost_tpu.align.msa import SeqAlign
from ploidyfrost_tpu.sites.emit import (
    _AlignJob,
    _emit_fast,
    _emit_generic,
    _fast_snp_positions,
)

BASES = "ACGT"


def _mutate(rng, s: str, nmut: int) -> str:
    out = list(s)
    for p in rng.choice(len(s), size=min(nmut, len(s)), replace=False):
        out[p] = BASES[int(rng.integers(0, 4))]
    return "".join(out)


def _rand_job(rng, strict: bool, k: int = 25):
    L = int(rng.integers(k + 4, 4 * k))
    a = "".join(rng.choice(list(BASES), L))
    # mutations only in the window where both the reference and our
    # emission read k-length contexts (site >= k-1, mirroring real
    # branch strings that share the entrance's k-1 suffix)
    b = list(a)
    nmut = min(int(rng.integers(0, 3)), L - k)
    if nmut:
        for p in rng.choice(np.arange(k - 1, L - 1), size=nmut, replace=False):
            c = BASES[int(rng.integers(0, 4))]
            b[int(p)] = c
    b = "".join(b)
    covs = [float(rng.integers(10, 60)), float(rng.integers(10, 60))] if strict else None
    return _AlignJob(
        [a, b], int(rng.integers(1, 1000)), strict, 3, 7,
        int(rng.integers(1, 50)), int(rng.integers(1, 50)),
        float(rng.integers(10, 60)), covs,
    )


def _assert_same(be_f, be_g):
    assert be_f.var_id == be_g.var_id
    assert be_f.is_simple == be_g.is_simple
    assert be_f.aligned_rows == be_g.aligned_rows
    assert len(be_f.sites) == len(be_g.sites)
    for sf, sg in zip(be_f.sites, be_g.sites):
        assert (
            sf.maxnum, sf.is_simple, sf.var_type_indel_len, sf.var_id,
            sf.var_num, sf.var_dis, sf.group_cov, sf.group_windows,
            sf.sum_cov,
        ) == (
            sg.maxnum, sg.is_simple, sg.var_type_indel_len, sg.var_id,
            sg.var_num, sg.var_dis, sg.group_cov, sg.group_windows,
            sg.sum_cov,
        )


@pytest.mark.parametrize("strict", [True, False])
def test_fast_matches_generic(strict):
    rng = np.random.default_rng(42 if strict else 43)
    sa = SeqAlign(2.0, -1.0, -3.0)
    n_fast = 0
    for _ in range(300):
        job = _rand_job(rng, strict)
        fsnp = _fast_snp_positions(job)
        if fsnp is None:
            continue
        n_fast += 1
        wf: list = []
        wg: list = []
        be_f = _emit_fast(job, fsnp, 25, wf)
        be_g = _emit_generic(job, sa, 25, wg, var_id=job.var_id)
        _assert_same(be_f, be_g)
        assert wf == wg
    assert n_fast > 100  # the gate admits the dominant population


def test_gate_rejects_unequal_and_dense():
    rng = np.random.default_rng(7)
    a = "".join(rng.choice(list(BASES), 60))
    # unequal length
    job = _rand_job(rng, True)
    job.str_vec = [a, a[:-1]]
    assert _fast_snp_positions(job) is None
    # >2 mismatches
    job.str_vec = [a, _mutate(rng, a, 10)]
    if sum(x != y for x, y in zip(*job.str_vec)) > 2:
        assert _fast_snp_positions(job) is None
    # 3 branches
    job.str_vec = [a, a, a]
    assert _fast_snp_positions(job) is None


def test_gate_requires_default_scoring():
    """analyze_bubbles only enables the fast path for (2, -1, -3)."""
    import inspect

    from ploidyfrost_tpu.sites import emit

    src = inspect.getsource(emit.analyze_bubbles)
    assert "(2.0, -1.0, -3.0)" in src


def test_colored_fast_matches_generic(monkeypatch):
    """The colored fast-SNP path must emit identically to the generic
    colored path (alignment + partition) on a synthetic 3-sample
    dataset where 2-branch SNP bubbles dominate."""
    import os
    import tempfile

    from ploidyfrost_tpu.bubble.batched import find_superbubbles_device
    from ploidyfrost_tpu.graph.colors import color_graph
    from ploidyfrost_tpu.graph.construct import build_graph_from_kmers, simplify
    from ploidyfrost_tpu.kmer.pack import canonical_np, sequence_kmers_np
    from ploidyfrost_tpu.sites import emit as emit_mod
    from ploidyfrost_tpu.sites.emit_colored import (
        analyze_bubbles_colored,
        unitig_coverage_colored,
    )
    from ploidyfrost_tpu.kmer.countdb import KmerCountDB

    rng = np.random.default_rng(17)
    G = 60_000
    base = rng.integers(0, 4, G).astype(np.uint8)
    filtered = []
    dbs = []
    cutoffs = []
    for s in range(3):
        h2 = base.copy()
        snp = rng.random(G) < 0.004
        h2[snp] = (h2[snp] + rng.integers(1, 4, snp.sum())) % 4
        k1, _ = sequence_kmers_np(base, 25)
        k2, _ = sequence_kmers_np(h2, 25)
        allk = canonical_np(np.concatenate([k1, k2]), 25)
        km, mult = np.unique(allk, return_counts=True)
        ct = (mult * 15 + rng.integers(0, 4, len(km))).astype(np.int64)
        keep = ct >= 10
        filtered.append(km[keep])
        dbs.append(KmerCountDB(km, ct, 25))
        cutoffs.append((10, 60))
    union = np.unique(np.concatenate(filtered))
    g = simplify(build_graph_from_kmers(union, 25), 25)
    colors = color_graph(g, filtered, ["a", "b", "c"])
    state, _ = find_superbubbles_device(g, 8, colors)
    umean, uok = unitig_coverage_colored(dbs, g, cutoffs)

    def run():
        st = state.copy() if hasattr(state, "copy") else None
        s2, _ = find_superbubbles_device(g, 8, colors)
        return analyze_bubbles_colored(g, colors, s2, umean, uok)

    em_fast, ws_fast, wc_fast = run()
    monkeypatch.setattr(emit_mod, "_fast_snp_positions", lambda j: None)
    monkeypatch.setattr(emit_mod, "_gapless_eligible", lambda sv: False)
    em_gen, ws_gen, wc_gen = run()
    assert ws_fast == ws_gen
    assert set(wc_fast) == set(wc_gen)
    for w in wc_fast:
        np.testing.assert_array_equal(wc_fast[w], wc_gen[w])
    assert len(em_fast) == len(em_gen) > 50
    n_sites = 0
    for a, b in zip(em_fast, em_gen):
        assert (a.var_id, a.is_simple, a.entrance_id, a.exit_id) == (
            b.var_id, b.is_simple, b.entrance_id, b.exit_id
        )
        assert a.aligned_rows == b.aligned_rows
        assert len(a.sites) == len(b.sites)
        for sa, sb in zip(a.sites, b.sites):
            n_sites += 1
            assert (sa.maxnum, sa.is_simple, sa.var_type_indel_len,
                    sa.var_id, sa.var_num, sa.var_dis,
                    sa.group_windows, sa.coefficient) == (
                sb.maxnum, sb.is_simple, sb.var_type_indel_len,
                sb.var_id, sb.var_num, sb.var_dis,
                sb.group_windows, sb.coefficient)
            if sa.color_group_cov is not None:
                np.testing.assert_array_equal(
                    sa.color_group_cov, sb.color_group_cov
                )
    assert n_sites > 30


def test_gapless_msa_matches_generic():
    """sequence_alignment_gapless must equal the full progressive MSA
    on every eligible multi-branch set (all pairs equal-length with
    <=2 mismatches under default scoring)."""
    from ploidyfrost_tpu.align.msa import SeqAlign
    from ploidyfrost_tpu.sites.emit import _gapless_eligible

    sa = SeqAlign(2.0, -1.0, -3.0)
    rng = np.random.default_rng(23)
    n_checked = 0
    while n_checked < 120:
        L = int(rng.integers(26, 90))
        base = "".join(rng.choice(list(BASES), L))
        nb = int(rng.integers(3, 6))
        strs = []
        pos = int(rng.integers(0, L))
        pos2 = int(rng.integers(0, L))
        for b in range(nb):
            s = list(base)
            # each branch mutates at one of two shared positions
            # (keeps every PAIR within 2 mismatches)
            p = pos if b % 2 == 0 else pos2
            s[p] = "ACGT"[int(rng.integers(0, 4))]
            strs.append("".join(s))
        strs = sorted(set(strs), key=lambda x: (-len(x), x), reverse=False)
        if len(strs) < 3 or not _gapless_eligible(strs):
            continue
        n_checked += 1
        a = sa.sequence_alignment_gapless(list(strs))
        b = sa.sequence_alignment(list(strs))
        assert a[0] == b[0], (strs, a[0], b[0])
        assert a[1] == b[1] and a[2] == b[2] and a[4] == b[4]
        assert a[3] == b[3]


def test_batch_fast_check_matches_scalar():
    """_fast_snp_positions_batch must make the identical decision and
    positions as the scalar check on a mixed random population."""
    import numpy as np

    from ploidyfrost_tpu.sites.emit import (
        _AlignJob,
        _fast_snp_positions,
        _fast_snp_positions_batch,
    )

    rng = np.random.default_rng(4)
    bases = "ACGT"

    def mk(sv):
        return _AlignJob(sv, 0, True, 1, 2, 10, 10, 1.0, None)

    jobs = []
    for _ in range(300):
        L = int(rng.integers(25, 120))
        a = "".join(rng.choice(list(bases), L))
        kind = rng.integers(0, 5)
        if kind == 0:  # identical
            jobs.append(mk([a, a]))
        elif kind == 1:  # 1-2 mismatches
            b = list(a)
            for p in rng.integers(0, L, int(rng.integers(1, 3))):
                b[p] = bases[(bases.index(b[p]) + 1) % 4]
            jobs.append(mk([a, "".join(b)]))
        elif kind == 2:  # many mismatches
            jobs.append(mk([a, "".join(rng.choice(list(bases), L))]))
        elif kind == 3:  # unequal length
            jobs.append(mk([a, a[:-1]]))
        else:  # 3 branches
            jobs.append(mk([a, a, a]))
    batch = _fast_snp_positions_batch(jobs)
    for j, got in zip(jobs, batch):
        exp = _fast_snp_positions(j)
        if exp is None:
            assert got is None
        else:
            assert got is not None
            np.testing.assert_array_equal(np.asarray(got), exp)
