"""Cross-validation: device-batched superbubble search vs the sequential
host path.

The sequential path (bubble/superbubble.py) is itself golden-validated
byte-for-byte against the reference binary (tests/test_golden*.py), so
state-array equality here transitively proves the device engine matches
src/CDBG.cpp:1707-2823 on every graph class:

  * genome-like graphs with real bubbles (STAT_BUBBLE, replay skips),
  * dense random tangles (cycles, stalls, aborts, overflow fallback),
  * circular genomes (exit-loops-to-entrance: STAT_CYCLE_EXIT),
  * colored graphs (CCDBG color gates run at host replay time).
"""

import collections

import numpy as np
import pytest

from ploidyfrost_tpu.bubble.batched import (
    STAT_ABORT,
    STAT_BUBBLE,
    STAT_CYCLE_EXIT,
    STAT_OVERFLOW,
    STAT_STALL_CYCLE,
    find_superbubbles_device,
    search_seeds,
)
from ploidyfrost_tpu.bubble.superbubble import find_superbubbles
from ploidyfrost_tpu.graph.construct import _canon_np, build_graph_from_kmers
from ploidyfrost_tpu.kmer.pack import string_kmers_np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _graph_from_seqs(seqs, k):
    km = np.unique(
        np.concatenate([_canon_np(string_kmers_np(s, k), k) for s in seqs])
    )
    return build_graph_from_kmers(km, k)


def _genome_graph(seed, G=20000, k=15, snp=0.02, nhap=3, circular=False):
    rng = np.random.default_rng(seed)
    g1 = rng.integers(0, 4, G)
    haps = [g1]
    for _ in range(nhap - 1):
        g2 = g1.copy()
        m = rng.random(G) < snp
        g2[m] = (g2[m] + rng.integers(1, 4, m.sum())) % 4
        haps.append(g2)
    seqs = [BASES[h].tobytes().decode() for h in haps]
    if circular:
        seqs = [s + s for s in seqs]
    return _graph_from_seqs(seqs, k)


def _assert_parity(g, colors=None):
    s1, b1 = find_superbubbles(g, colors=colors)
    s2, b2 = find_superbubbles_device(g, colors=colors)
    assert np.array_equal(s1.flags, s2.flags)
    assert np.array_equal(s1.plus, s2.plus)
    assert np.array_equal(s1.minus, s2.minus)
    key = lambda b: (b.bubble_id, b.entrance, b.strand, b.exit, b.strict, b.complex)  # noqa: E731
    assert [key(b) for b in b1] == [key(b) for b in b2]
    return s1, b1


def _statuses(g):
    deg = np.asarray(g._out_deg)
    seeds = [
        i * 2 + s for i in range(len(g)) for s in (1, 0) if deg[i, s] > 1
    ]
    if not seeds:
        return collections.Counter()
    st, *_ = search_seeds(g, np.array(seeds, np.int32))
    return collections.Counter(st.tolist())


@pytest.mark.parametrize("seed", range(4))
def test_parity_genome_bubbles(seed):
    g = _genome_graph(seed, k=11 + seed, snp=0.01 + 0.01 * seed)
    _, bubbles = _assert_parity(g)
    assert bubbles  # genomes with het SNPs must yield bubbles


@pytest.mark.parametrize("seed", range(4))
def test_parity_dense_tangle(seed):
    rng = np.random.default_rng(seed)
    k = int(rng.integers(5, 8))
    space = 4**k
    km = np.unique(rng.integers(0, space, int(space * 0.3)).astype(np.uint64))
    km = np.unique(_canon_np(km, k))
    g = build_graph_from_kmers(km, k)
    _assert_parity(g)


def test_parity_circular_cycle_exit():
    g = _genome_graph(7, G=220, k=25, snp=0.0, nhap=2, circular=True)
    # hand-inject one SNP to form a bubble on the circle
    rng = np.random.default_rng(7)
    g1 = rng.integers(0, 4, 220)
    g2 = g1.copy()
    g2[110] = (g2[110] + 1) % 4
    seqs = [BASES[h].tobytes().decode() for h in (g1, g2)]
    g = _graph_from_seqs([s + s for s in seqs], 25)
    stats = _statuses(g)
    assert stats.get(STAT_CYCLE_EXIT, 0) > 0
    _assert_parity(g)


def test_outcome_class_coverage():
    """The genome + tangle suites must collectively exercise every
    recorded outcome class (incl. the host-fallback overflow path)."""
    total = collections.Counter()
    for seed in range(6):
        total += _statuses(_genome_graph(seed, k=11 + seed, snp=0.01 + 0.01 * seed))
    for seed in range(2):
        rng = np.random.default_rng(seed + 100)
        k = 7
        km = np.unique(
            rng.integers(0, 4**k, int(4**k * 0.25)).astype(np.uint64)
        )
        g = build_graph_from_kmers(np.unique(_canon_np(km, k)), k)
        total += _statuses(g)
    for stat in (STAT_BUBBLE, STAT_STALL_CYCLE, STAT_ABORT, STAT_OVERFLOW):
        assert total.get(stat, 0) > 0, f"outcome {stat} never exercised"


def test_parity_colored():
    """Colored registration gates run identically at replay time."""
    from ploidyfrost_tpu.graph.colors import color_graph

    rng = np.random.default_rng(3)
    G, k = 8000, 15
    g1 = rng.integers(0, 4, G)
    g2 = g1.copy()
    m = rng.random(G) < 0.015
    g2[m] = (g2[m] + rng.integers(1, 4, m.sum())) % 4
    seqs = [BASES[h].tobytes().decode() for h in (g1, g2)]
    g = _graph_from_seqs(seqs, k)
    # two colors: color 0 covers hap1's k-mers, color 1 covers hap2's
    colors = color_graph(
        g,
        [
            np.unique(_canon_np(string_kmers_np(seqs[0], k), k)),
            np.unique(_canon_np(string_kmers_np(seqs[1], k), k)),
        ],
    )
    _assert_parity(g, colors=colors)
