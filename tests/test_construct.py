"""Native graph construction vs a brute-force compaction oracle."""

import numpy as np
import pytest

from ploidyfrost_tpu.graph.cdbg import revcomp
from ploidyfrost_tpu.graph.construct import (
    _canon_np,
    build_graph_from_kmers,
    simplify,
)
from ploidyfrost_tpu.kmer.pack import encode_kmer_string


def genome_kmers(seqs, k):
    kms = set()
    for s in seqs:
        for i in range(len(s) - k + 1):
            w = s[i : i + k]
            kms.add(min(w, revcomp(w)))
    return kms


def brute_force_unitigs(kmer_set: set[str], k: int) -> set[str]:
    """Oracle: maximal non-branching paths in the bidirected DBG."""

    def succs(km):
        out = []
        for b in "ACGT":
            nxt = km[1:] + b
            if min(nxt, revcomp(nxt)) in kmer_set:
                out.append(nxt)
        return out

    def preds(km):
        return [revcomp(s) for s in succs(revcomp(km))]

    # oriented kmer x extends to its unique successor y iff
    # |succs(x)| == 1 and |preds(y)| == 1 and canon(y) != canon(x)
    def canon(s):
        return min(s, revcomp(s))

    def link(x):
        ss = succs(x)
        if len(ss) != 1:
            return None
        y = ss[0]
        if canon(y) == canon(x):
            return None
        if len(preds(y)) != 1:
            return None
        return y

    unitigs = set()
    seen = set()
    for km in kmer_set:
        if km in seen:
            continue
        # walk backward to the start of the chain
        x = km
        visited = {canon(x)}
        while True:
            ps = preds(x)
            if len(ps) != 1:
                break
            p = ps[0]
            if canon(p) in visited or canon(p) == canon(x):
                break
            if link(p) != x:
                break
            x = p
            visited.add(canon(x))
        # walk forward collecting the unitig
        seq = x
        visited = {canon(x)}
        seen.add(canon(x))
        while True:
            y = link(x)
            if y is None or canon(y) in visited:
                break
            seq += y[-1]
            x = y
            visited.add(canon(x))
            seen.add(canon(x))
        unitigs.add(min(seq, revcomp(seq)))
    return unitigs


def str_kmers_to_ints(kmer_set, k):
    return np.sort(
        np.array([encode_kmer_string(s) for s in kmer_set], dtype=np.uint64)
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_construct_matches_bruteforce_random(seed):
    rng = np.random.default_rng(seed)
    k = 5
    n = 300
    seqs = [
        "".join("ACGT"[c] for c in rng.integers(0, 4, rng.integers(k, 40)))
        for _ in range(12)
    ]
    kms = genome_kmers(seqs, k)
    if not kms:
        pytest.skip("no kmers")
    expected = brute_force_unitigs(kms, k)
    g = build_graph_from_kmers(str_kmers_to_ints(kms, k), k)
    got = {min(s, revcomp(s)) for s in g.seqs}
    assert got == expected


def test_construct_simple_genome():
    k = 5
    genome = "ACGTACATTGACCAGTTGACAGTTTGCA"
    kms = genome_kmers([genome], k)
    g = build_graph_from_kmers(str_kmers_to_ints(kms, k), k)
    got = {min(s, revcomp(s)) for s in g.seqs}
    assert got == brute_force_unitigs(kms, k)
    # every input k-mer is covered exactly once across unitigs
    covered = genome_kmers(g.seqs, k)
    assert covered == kms
    assert g.nb_kmers() == len(kms)


@pytest.mark.parametrize("seed", list(range(12)))
def test_simplify_fast_matches_rebuild(seed):
    """The unitig-level surgical simplify must equal the full
    recompaction of the surviving k-mer set byte-for-byte (same
    sequences, same lexicographic order) whenever it does not bail."""
    from ploidyfrost_tpu.graph.construct import (
        _simplify_fast,
        _simplify_rebuild,
    )

    rng = np.random.default_rng(seed + 100)
    k = 5
    seqs = [
        "".join("ACGT"[c] for c in rng.integers(0, 4, rng.integers(k, 60)))
        for _ in range(rng.integers(3, 14))
    ]
    kms = genome_kmers(seqs, k)
    if not kms:
        pytest.skip("no kmers")
    g = build_graph_from_kmers(str_kmers_to_ints(kms, k), k)
    lens = g.store.lengths
    deg_fw = g._out_deg[:, 1]
    deg_bw = g._out_deg[:, 0]
    drop = np.asarray((lens < 2 * k) & ((deg_fw == 0) | (deg_bw == 0)))
    if not drop.any():
        pytest.skip("nothing to simplify")
    fast = _simplify_fast(g, k, drop)
    full = _simplify_rebuild(g, k, drop)
    if fast is None:
        return  # bail case: simplify() takes the rebuild path
    assert list(fast.seqs) == list(full.seqs)
    # and the public entry agrees with the oracle either way
    assert list(simplify(g, k).seqs) == list(full.seqs)


def test_construct_snp_bubble():
    """Two haplotypes differing at one site -> entrance, two branches, exit."""
    k = 5
    h1 = "AATCGGCTACTGGTCAAGGCT"
    h2 = h1[:10] + "G" + h1[11:]
    assert h1[10] != "G"
    kms = genome_kmers([h1, h2], k)
    g = build_graph_from_kmers(str_kmers_to_ints(kms, k), k)
    assert {min(s, revcomp(s)) for s in g.seqs} == brute_force_unitigs(kms, k)
    # a bubble entrance exists: some (unitig, strand) has out-degree 2
    assert any(
        g.out_degree(i, s) == 2 for i in range(len(g)) for s in (True, False)
    )


def test_kmc_roundtrip(tmp_path):
    from ploidyfrost_tpu.io.kmc import read_kmc_db, write_kmc_db

    rng = np.random.default_rng(7)
    k = 25
    km = np.unique(
        rng.integers(0, 1 << (2 * k), 5000, dtype=np.uint64)
    )
    km = _canon_np(km, k)
    km = np.unique(km)
    ct = rng.integers(1, 10000, len(km))
    p = str(tmp_path / "db")
    write_kmc_db(p, km, ct, k)
    km2, ct2, k2 = read_kmc_db(p)
    assert k2 == k
    np.testing.assert_array_equal(km2, km)
    np.testing.assert_array_equal(ct2, ct)


def test_junction_links_match_probe_links():
    """The junction-sort link derivation must agree with the probe-based
    oracle — including palindromic-junction cases, which small k makes
    frequent ((k-1)-mer palindromes need k odd, k-1 even)."""
    from ploidyfrost_tpu.graph.construct import (
        _links_junctions,
        _links_probes,
        _revcomp_np,
    )

    rng = np.random.default_rng(0)
    for k in (5, 7, 25):
        for n in (50, 500, 3000):
            km = rng.integers(0, 1 << (2 * k), size=n, dtype=np.uint64)
            km = np.unique(_canon_np(km, k))
            rc = _revcomp_np(km, k)
            got = _links_junctions(km, rc, k)
            exp = _links_probes(km, rc, k)
            np.testing.assert_array_equal(got, exp, err_msg=f"k={k} n={n}")


def test_device_links_match_host_links():
    """The --device-build linking path (jax.lax.sort junction sort,
    graph/construct._links_junctions_device) must produce EXACTLY the
    host links on random and genome-like k-mer sets, palindromic
    junctions included."""
    from ploidyfrost_tpu.graph.construct import (
        _links_junctions,
        _links_junctions_device,
        _revcomp_np,
    )

    rng = np.random.default_rng(5)
    for k in (5, 7, 25):
        for n in (50, 700, 4000):
            km = rng.integers(0, 1 << (2 * k), size=n, dtype=np.uint64)
            km = np.unique(_canon_np(km, k))
            rc = _revcomp_np(km, k)
            np.testing.assert_array_equal(
                _links_junctions_device(km, rc, k),
                _links_junctions(km, rc, k),
                err_msg=f"k={k} n={n}",
            )


def test_device_build_graph_identical(tmp_path, monkeypatch):
    """build_graph_from_kmers under PLOIDYFROST_DEVICE_BUILD writes a
    byte-identical GFA."""
    from ploidyfrost_tpu.graph.construct import build_graph_from_kmers
    from ploidyfrost_tpu.kmer.pack import canonical_np, sequence_kmers_np

    rng = np.random.default_rng(9)
    g1 = rng.integers(0, 4, 30_000).astype(np.uint8)
    g2 = g1.copy()
    snp = rng.random(30_000) < 0.01
    g2[snp] = (g2[snp] + rng.integers(1, 4, snp.sum())) % 4
    k1, _ = sequence_kmers_np(g1, 25)
    k2, _ = sequence_kmers_np(g2, 25)
    km = np.unique(canonical_np(np.concatenate([k1, k2]), 25))

    monkeypatch.delenv("PLOIDYFROST_DEVICE_BUILD", raising=False)
    build_graph_from_kmers(km, 25).write_gfa(str(tmp_path / "host.gfa"))
    monkeypatch.setenv("PLOIDYFROST_DEVICE_BUILD", "1")
    build_graph_from_kmers(km, 25).write_gfa(str(tmp_path / "dev.gfa"))
    assert (tmp_path / "host.gfa").read_bytes() == (
        tmp_path / "dev.gfa"
    ).read_bytes()


def test_junction_links_match_probe_links_genome_like():
    from ploidyfrost_tpu.graph.construct import (
        _links_junctions,
        _links_probes,
        _revcomp_np,
    )
    from ploidyfrost_tpu.kmer.pack import canonical_np, sequence_kmers_np

    rng = np.random.default_rng(1)
    for k in (5, 11, 25):
        g1 = rng.integers(0, 4, 4000).astype(np.uint8)
        g2 = g1.copy()
        snp = rng.random(4000) < 0.02
        g2[snp] = (g2[snp] + rng.integers(1, 4, snp.sum())) % 4
        k1, _ = sequence_kmers_np(g1, k)
        k2, _ = sequence_kmers_np(g2, k)
        km = np.unique(canonical_np(np.concatenate([k1, k2]), k))
        rc = _revcomp_np(km, k)
        np.testing.assert_array_equal(
            _links_junctions(km, rc, k), _links_probes(km, rc, k),
            err_msg=f"k={k}",
        )


def test_lex_perm_matches_string_sort():
    """Packed-key lexicographic order == decoded-string sort, including
    >96-base prefix ties."""
    from ploidyfrost_tpu.graph.construct import _lex_perm
    from ploidyfrost_tpu.graph.seqstore import SeqStore

    rng = np.random.default_rng(17)
    bases = "ACGT"
    seqs = []
    for _ in range(300):
        L = int(rng.integers(25, 140))
        seqs.append("".join(rng.choice(list(bases), L)))
    # adversarial: shared 100-base prefixes with divergent / absent tails
    pre = "".join(rng.choice(list(bases), 100))
    seqs += [pre, pre + "A", pre + "T", pre + "AC", pre[:97], pre[:96]]
    store = SeqStore.from_strings(seqs)
    perm = _lex_perm(store)
    want = sorted(range(len(seqs)), key=seqs.__getitem__)
    assert list(perm) == want


def test_chain_rank_native_matches_numpy():
    """Native chain walk groups/orders chains identically to the numpy
    pointer-doubling path (chain order may differ; compare as sets of
    chain tuples)."""
    from ploidyfrost_tpu.graph.construct import (
        _rank_chains,
        _rank_chains_fast,
    )
    from ploidyfrost_tpu.native import load_chain_library

    if load_chain_library() is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(5)
    for trial in range(20):
        n = int(rng.integers(2, 200)) * 2
        nxt = np.full(n, -1, dtype=np.int64)
        # random partial successor links incl. chains and cycles
        src = rng.choice(n, size=n // 2, replace=False)
        dst = rng.choice(n, size=n // 2, replace=False)
        nxt[src] = dst
        # dedupe multi-predecessors (the linker never produces them)
        _, first = np.unique(nxt[nxt >= 0], return_index=True)
        keep = np.flatnonzero(nxt >= 0)[np.sort(first)]
        clean = np.full(n, -1, dtype=np.int64)
        clean[keep] = nxt[keep]

        def chains(order, start):
            out = []
            cur = []
            for node, s in zip(order, start):
                if s and cur:
                    out.append(tuple(cur))
                    cur = []
                cur.append(int(node))
            if cur:
                out.append(tuple(cur))
            return out

        o1, s1 = _rank_chains_fast(clean.copy())
        o2, h2 = _rank_chains(clean.copy())
        sh = h2[o2]
        s2 = np.concatenate([[True], sh[1:] != sh[:-1]])
        c1 = chains(o1, s1)
        c2 = chains(o2, s2)
        # cycles may be broken at different nodes only if numpy picked a
        # different entry; both break at the min node id, so exact match
        assert sorted(c1) == sorted(c2), trial


def test_probe_subset_matches_full():
    """_links_probes_subset == _links_probes restricted to the request
    set, on random k-mer tables (incl. palindromic junctions at even
    k-1)."""
    from ploidyfrost_tpu.graph.construct import (
        _canon_np,
        _links_probes,
        _links_probes_subset,
        _revcomp_np,
    )

    rng = np.random.default_rng(9)
    for k in (5, 9, 25):
        for trial in range(6):
            raw = rng.integers(0, 1 << min(2 * k, 63), 400).astype(np.uint64)
            km = np.unique(_canon_np(raw, k))
            rc = _revcomp_np(km, k)
            full = _links_probes(km, rc, k)
            req = rng.choice(2 * len(km), size=min(60, 2 * len(km)),
                             replace=False).astype(np.int64)
            sub = _links_probes_subset(km, rc, k, req)
            np.testing.assert_array_equal(sub, full[req])
