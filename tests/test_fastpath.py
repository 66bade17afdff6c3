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
