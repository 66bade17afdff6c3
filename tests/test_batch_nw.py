"""Batched device NW kernel parity vs the host wavefront/scalar oracle."""

import random

import numpy as np
import pytest

from ploidyfrost_tpu.align.batch_nw import (
    needleman_wunsch_batch,
    nw_matrices_batched,
)
from ploidyfrost_tpu.align.nw import _nw_matrix, _nw_matrix_scalar, needleman_wunsch


def _rand_seq(rng, lo, hi, dash=False):
    alpha = "ACGT-" if dash else "ACGT"
    return "".join(rng.choice(alpha) for _ in range(rng.randint(lo, hi)))


def _assert_same(got, exp, ctx):
    for name, gm, em in zip(("Up", "LeftUp", "Left"), got, exp):
        np.testing.assert_array_equal(gm, em, err_msg=f"{name} differs: {ctx}")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matrices_match_host_wavefront(seed):
    rng = random.Random(seed)
    pairs = []
    for _ in range(40):
        pairs.append((_rand_seq(rng, 1, 90), _rand_seq(rng, 1, 90)))
    # mixed sizes force multiple tiers in one call
    pairs.append((_rand_seq(rng, 300, 400), _rand_seq(rng, 280, 420)))
    got = nw_matrices_batched(pairs, 2.0, -1.0, -3.0)
    for i, (A, B) in enumerate(pairs):
        exp = _nw_matrix(A, B, 2.0, -1.0, -3.0)
        _assert_same(got[i], exp, f"pair {i}: {A} / {B}")


def test_matrices_with_dashes_match_scalar_oracle():
    """The forbidden-Left rule only fires when A contains '-' (the
    progressive MSA path, src/SeqAlign.cpp:528-532)."""
    rng = random.Random(3)
    pairs = []
    for _ in range(30):
        A = _rand_seq(rng, 2, 40, dash=True)
        B = _rand_seq(rng, 2, 40)
        pairs.append((A, B))
    got = nw_matrices_batched(pairs, 2.0, -1.0, -3.0)
    for i, (A, B) in enumerate(pairs):
        exp = _nw_matrix_scalar(A, B, 2.0, -1.0, -3.0)
        _assert_same(got[i], exp, f"pair {i}: {A} / {B}")


def test_alignments_match_sequential():
    rng = random.Random(4)
    pairs = []
    for _ in range(25):
        base = _rand_seq(rng, 20, 60)
        mut = list(base)
        for _ in range(rng.randint(0, 4)):
            p = rng.randrange(len(mut))
            op = rng.random()
            if op < 0.5:
                mut[p] = rng.choice("ACGT")
            elif op < 0.75:
                mut.insert(p, rng.choice("ACGT"))
            else:
                del mut[p]
        pairs.append((base, "".join(mut) or "A"))
    batched = needleman_wunsch_batch(pairs)
    for i, (A, B) in enumerate(pairs):
        exp = needleman_wunsch(A, B)
        got = batched[i]
        assert len(got) == len(exp), f"pair {i}"
        for g, e in zip(got, exp):
            assert (g.str1, g.str2, g.score, g.pos, g.indel, g.snp) == (
                e.str1,
                e.str2,
                e.score,
                e.pos,
                e.indel,
                e.snp,
            ), f"pair {i}"


def test_non_integer_params_fall_back():
    pairs = [("ACGT", "AGGT")]
    got = needleman_wunsch_batch(pairs, match=1.5, dis_match=-1.0, gap=-3.0)
    exp = needleman_wunsch("ACGT", "AGGT", 1.5, -1.0, -3.0)
    assert len(got[0]) == len(exp)
    assert got[0][0].str1 == exp[0].str1


def test_batched_nw_mesh_parity():
    """Mesh-sharded DP matrices must equal the single-device and
    per-pair host matrices exactly (lanes split across 8 virtual
    devices, no collectives)."""
    from ploidyfrost_tpu.align.nw import _nw_matrix
    from ploidyfrost_tpu.align.batch_nw import nw_matrices_batched
    from ploidyfrost_tpu.parallel.sharded import balanced_mesh

    rng = np.random.default_rng(31)
    pairs = []
    for _ in range(40):
        la = int(rng.integers(5, 120))
        lb = max(5, la + int(rng.integers(-6, 7)))
        pairs.append((
            "".join("ACGT"[c] for c in rng.integers(0, 4, la)),
            "".join("ACGT"[c] for c in rng.integers(0, 4, lb)),
        ))
    mesh = balanced_mesh(8)
    got = nw_matrices_batched(pairs, 2.0, -1.0, -3.0, mesh=mesh)
    for (A, B), (u, l2, l3) in zip(pairs, got):
        eu, el2, el3 = _nw_matrix(A, B, 2.0, -1.0, -3.0)
        np.testing.assert_array_equal(u, eu)
        np.testing.assert_array_equal(l2, el2)
        np.testing.assert_array_equal(l3, el3)
