"""SeqStore (2-bit packed unitig storage) unit tests."""

import random

import numpy as np

from ploidyfrost_tpu.graph.cdbg import CDBGraph, revcomp
from ploidyfrost_tpu.graph.seqstore import SeqStore
from ploidyfrost_tpu.kmer.pack import string_kmers_np


def _rand_seqs(seed, n, lo, hi):
    rng = random.Random(seed)
    return [
        "".join(rng.choice("ACGT") for _ in range(rng.randint(lo, hi)))
        for _ in range(n)
    ]


def test_roundtrip_decode():
    seqs = _rand_seqs(0, 50, 1, 200) + ["A", "ACGT" * 8, "C" * 32, "G" * 33]
    st = SeqStore.from_strings(seqs)
    assert st.decode_all() == seqs
    for i in (0, 3, len(seqs) - 1):
        assert st.decode(i) == seqs[i]
    assert st.total_bases == sum(map(len, seqs))


def test_all_kmers_matches_string_path():
    k = 25
    seqs = _rand_seqs(1, 40, 25, 300)
    st = SeqStore.from_strings(seqs)
    flat, nk = st.all_kmers(k)
    exp = np.concatenate([string_kmers_np(s, k) for s in seqs])
    np.testing.assert_array_equal(flat, exp)
    np.testing.assert_array_equal(nk, [len(s) - k + 1 for s in seqs])


def test_head_tail_kmers():
    k = 11
    seqs = _rand_seqs(2, 30, 11, 64)
    st = SeqStore.from_strings(seqs)
    heads = st.head_kmers(k)
    tails = st.tail_kmers(k)
    exp_h = [string_kmers_np(s, k)[0] for s in seqs]
    exp_t = [string_kmers_np(s, k)[-1] for s in seqs]
    np.testing.assert_array_equal(heads, exp_h)
    np.testing.assert_array_equal(tails, exp_t)


def test_reorder():
    seqs = _rand_seqs(3, 20, 5, 100)
    st = SeqStore.from_strings(seqs)
    perm = np.random.default_rng(0).permutation(len(seqs))
    st2 = st.reorder(perm)
    assert st2.decode_all() == [seqs[p] for p in perm]


def test_adjacency_matches_dict_build():
    # CDBGraph's vectorized adjacency must equal a brute-force dict build
    k = 7
    rng = random.Random(4)
    genome = "".join(rng.choice("ACGT") for _ in range(800))
    kms = sorted(
        {
            min(genome[i : i + k], revcomp(genome[i : i + k]))
            for i in range(len(genome) - k + 1)
        }
    )
    from ploidyfrost_tpu.graph.construct import build_graph_from_kmers

    km_packed = np.sort(
        np.array([string_kmers_np(s, k)[0] for s in kms], dtype=np.uint64)
    )
    g = build_graph_from_kmers(km_packed, k)
    seqs = list(g.store.decode_all())

    entry = {}
    for i, s in enumerate(seqs):
        if s[:k] not in entry:
            entry[s[:k]] = (i, True)
        if revcomp(s[-k:]) not in entry:
            entry[revcomp(s[-k:])] = (i, False)
    succ = np.full((len(seqs), 2, 4), -1, dtype=np.int64)
    for i, s in enumerate(seqs):
        for strand, oriented in ((True, s), (False, revcomp(s))):
            suffix = oriented[-(k - 1) :]
            for bi, b in enumerate("ACGT"):
                hit = entry.get(suffix + b)
                if hit is not None:
                    j, stx = hit
                    succ[i, int(strand), bi] = j * 2 + int(stx)
    np.testing.assert_array_equal(g._succ, succ)


def test_native_kmers_at_matches_numpy(monkeypatch):
    """The threaded native extraction (pf_extract_kmers) must equal the
    numpy word-gather path above the batch threshold."""
    import numpy as np

    from ploidyfrost_tpu.graph.seqstore import SeqStore

    rng = np.random.default_rng(12)
    seqs = [
        "".join(rng.choice(list("ACGT"), int(rng.integers(25, 300))))
        for _ in range(400)
    ]
    st = SeqStore.from_strings(seqs)
    for k in (25, 31):
        pos = np.flatnonzero(st.kmer_start_mask(k))
        big = np.tile(pos, max(1, (1 << 15) // max(len(pos), 1) + 1))
        native = st.kmers_at(big, k)
        monkeypatch.setenv("PLOIDYFROST_NO_NATIVE", "1")
        import ploidyfrost_tpu.native as N

        saved = dict(N._lookup_state)
        N._lookup_state.clear()
        try:
            ref = st.kmers_at(big, k)
        finally:
            N._lookup_state.clear()
            N._lookup_state.update(saved)
            monkeypatch.delenv("PLOIDYFROST_NO_NATIVE")
        np.testing.assert_array_equal(native, ref)
