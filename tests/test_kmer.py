"""Unit tests for k-mer packing, counting, and cutoff heuristics."""

import numpy as np
import pytest

from ploidyfrost_tpu.kmer.pack import (
    INVALID_BASE,
    batch_kmers,
    canonical_kmers,
    decode_kmers,
    encode_bases,
    encode_kmer_string,
    revcomp_kmers,
    sequence_kmers,
)
from ploidyfrost_tpu.kmer.count import KmerCounter
from ploidyfrost_tpu.kmer.countdb import KmerCountDB
from ploidyfrost_tpu.kmer.cutoffs import (
    cutoff_lower_from_counts,
    cutoff_upper_from_counts,
)


def revcomp_str(s):
    return s[::-1].translate(str.maketrans("ACGT", "TGCA"))


def test_encode_decode_roundtrip():
    s = "ACGTTGCAAACCGGT"
    k = len(s)
    v = encode_kmer_string(s)
    assert decode_kmers(np.array([v], dtype=np.uint64), k) == [s]


def test_encode_lexicographic_order():
    # numeric order of packed k-mers == string order
    kmers = ["AAAC", "AACA", "ACGT", "CAAA", "TTTT"]
    vals = [encode_kmer_string(s) for s in kmers]
    assert vals == sorted(vals)


@pytest.mark.parametrize("k", [3, 11, 25, 31])
def test_revcomp_matches_string(k):
    rng = np.random.default_rng(0)
    for _ in range(20):
        s = "".join(rng.choice(list("ACGT"), size=k))
        v = np.array([encode_kmer_string(s)], dtype=np.uint64)
        rc = revcomp_kmers(v, k)
        assert decode_kmers(np.asarray(rc), k) == [revcomp_str(s)]


def test_canonical_is_min():
    k = 7
    s = "GATTACA"
    v = np.array([encode_kmer_string(s)], dtype=np.uint64)
    canon = canonical_kmers(v, k)
    expect = min(encode_kmer_string(s), encode_kmer_string(revcomp_str(s)))
    assert int(canon[0]) == expect


def test_sequence_kmers_with_invalid():
    s = "ACGTNACGT"
    codes = encode_bases(s)[None, :]
    k = 3
    kmers, valid = sequence_kmers(codes, k)
    assert kmers.shape == (1, 7)
    # windows covering the N (positions 2,3,4 start indices) are invalid
    expect_valid = [True, True, False, False, False, True, True]
    assert list(np.asarray(valid[0])) == expect_valid
    assert decode_kmers(np.asarray(kmers[0][valid[0]]), k) == ["ACG", "CGT", "ACG", "CGT"]


def brute_force_counts(reads, k):
    from collections import Counter

    c = Counter()
    for r in reads:
        for i in range(len(r) - k + 1):
            w = r[i : i + k]
            if set(w) <= set("ACGT"):
                c[min(w, revcomp_str(w))] += 1
    return c


def test_counter_matches_bruteforce():
    rng = np.random.default_rng(42)
    k = 5
    reads = [
        "".join(rng.choice(list("ACGTN"), p=[0.24, 0.24, 0.24, 0.24, 0.04], size=40))
        for _ in range(50)
    ]
    counter = KmerCounter(k)
    L = max(len(r) for r in reads)
    batch = np.full((len(reads), L), INVALID_BASE, dtype=np.uint8)
    for i, r in enumerate(reads):
        batch[i, : len(r)] = encode_bases(r)
    counter.add_reads(batch)
    km, ct = counter.arrays()
    got = dict(zip(decode_kmers(np.asarray(km), k), np.asarray(ct).tolist()))
    assert got == dict(brute_force_counts(reads, k))


def test_counter_streaming_merge():
    k = 4
    counter = KmerCounter(k)
    rng = np.random.default_rng(1)
    reads_all = []
    for _ in range(5):
        reads = ["".join(rng.choice(list("ACGT"), size=30)) for _ in range(20)]
        reads_all += reads
        batch = np.stack([encode_bases(r) for r in reads])
        counter.add_reads(batch)
    km, ct = counter.arrays()
    got = dict(zip(decode_kmers(np.asarray(km), k), np.asarray(ct).tolist()))
    expect = brute_force_counts(reads_all, k)
    # counter saturates at counter_max like KMC -cs
    expect = {s: min(c, counter.counter_max) for s, c in expect.items()}
    assert got == dict(expect)


def test_countdb_lookup_strings():
    k = 4
    counter = KmerCounter(k)
    reads = ["ACGTACGTAC", "TTTTACGTAA"]
    batch = np.full((2, 10), INVALID_BASE, np.uint8)
    for i, r in enumerate(reads):
        batch[i, : len(r)] = encode_bases(r)
    counter.add_reads(batch)
    db = KmerCountDB.from_counter(counter)
    bf = brute_force_counts(reads, k)
    res = db.lookup_strings(["ACGTA", "TTTT"])
    assert list(res[0]) == [
        bf[min("ACGT", revcomp_str("ACGT"))],
        bf[min("CGTA", revcomp_str("CGTA"))],
    ]
    assert list(res[1]) == [bf[min("TTTT", revcomp_str("TTTT"))]]
    with pytest.raises(KeyError):
        db.lookup_strings(["GGGG"])


def test_histogram():
    k = 3
    counter = KmerCounter(k)
    batch = encode_bases("AAAAA")[None, :]  # AAA x3 canonical
    counter.add_reads(batch)
    hist = counter.histogram(10)
    assert hist[3] == 1
    assert hist.sum() == 1


# --- cutoffs: exact ports of src/Main.cpp:200-277 ---------------------

def test_cutoff_lower_valley():
    # histogram falling then rising: valley at index 3 (cov 4)
    counts = [100, 50, 20, 10, 15, 30, 10]
    # scan: first i with v[i-1] < v[i] is i=4 -> round(1.25*3) = 4
    assert cutoff_lower_from_counts(counts) == 4


def test_cutoff_lower_monotonic():
    counts = [5, 4, 3, 2, 1]
    # never rises: peak = len = 5 -> round(1.25*4) = 5
    assert cutoff_lower_from_counts(counts) == 5


def test_cutoff_upper_quantile():
    counts = [1000, 10, 10, 10, 10, 10, 10, 10, 10, 10]
    # cum (with leading 0): [0,1000,1010,...,1090]; baseline v[1]=1000
    # cf = 0.5*(1090-1000)+1000 = 1045 -> first pp with cum>1045 is 6
    assert cutoff_upper_from_counts(counts, 0.5) == 6


def test_cutoff_roundtrip_files(tmp_path):
    from ploidyfrost_tpu.kmer.cutoffs import cutoff_lower, cutoff_upper

    p = tmp_path / "hist.txt"
    counts = [100, 50, 20, 10, 15, 30, 10]
    p.write_text("".join(f"{i+1}\t{c}\n" for i, c in enumerate(counts)))
    assert cutoff_lower(str(p)) == 4
    # cf = 0.998*(235-100)+100 = 234.73; cum=[0,100,150,170,180,195,225,235]
    # first cum>cf is index 7
    assert cutoff_upper(str(p), 0.998) == 7


def test_nibble_packed_extract_matches_unpacked():
    """The nibble-packed transfer path (2 codes/byte over the tunnel,
    device-side unpack) must produce the identical instance buffer —
    exercised here on CPU by calling the jitted step with packed=True
    directly (the dispatcher only packs on accelerator backends)."""
    import jax.numpy as jnp

    from ploidyfrost_tpu.kmer.count import (
        SENT32,
        _extract_append,
        _pack_nibbles_host,
    )

    rng = np.random.default_rng(5)
    codes = rng.integers(0, 4, size=(32, 64)).astype(np.uint8)
    codes[2, 30] = 4  # an N mid-read
    codes[3, 10:] = 4  # padding tail
    k = 25
    cap = 32 * (64 - k + 1)

    def run(dev_codes, packed):
        bhi = jnp.full((cap,), SENT32, dtype=jnp.uint32)
        blo = jnp.full((cap,), SENT32, dtype=jnp.uint32)
        nv = jnp.zeros((), dtype=jnp.int64)
        return _extract_append(
            bhi, blo, nv, dev_codes, jnp.int32(0), k, packed
        )

    a_hi, a_lo, a_nv = run(jnp.asarray(codes), False)
    b_hi, b_lo, b_nv = run(jnp.asarray(_pack_nibbles_host(codes)), True)
    np.testing.assert_array_equal(np.asarray(a_hi), np.asarray(b_hi))
    np.testing.assert_array_equal(np.asarray(a_lo), np.asarray(b_lo))
    assert int(a_nv) == int(b_nv) > 0


def test_2bit_packed_extract_matches_unpacked():
    """The 2-bit transfer path (4 codes/byte + per-row valid lengths)
    must fill the identical instance buffer as the unpacked step for
    suffix-invalid batches — exercised on CPU by calling the jitted
    step directly (the dispatcher only packs on accelerators)."""
    import jax.numpy as jnp

    from ploidyfrost_tpu.kmer.count import (
        SENT32,
        _extract_append,
        _extract_append_2bit,
        _pack_2bit_host,
    )

    rng = np.random.default_rng(6)
    B, L, k = 32, 67, 25  # L % 4 != 0: exercises the pack padding
    codes = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    codes[3, 10:] = 0x0F  # padding tail
    codes[7, :] = 0x0F  # fully-invalid padding row
    lens = (L - (codes > 3).sum(axis=1)).astype(np.int32)
    cap = B * (L - k + 1)

    def fresh():
        return (
            jnp.full((cap,), SENT32, dtype=jnp.uint32),
            jnp.full((cap,), SENT32, dtype=jnp.uint32),
            jnp.zeros((), dtype=jnp.int64),
        )

    bhi, blo, nv = fresh()
    a_hi, a_lo, a_nv = _extract_append(
        bhi, blo, nv, jnp.asarray(codes), jnp.int32(0), k, False
    )
    bhi, blo, nv = fresh()
    b_hi, b_lo, b_nv = _extract_append_2bit(
        bhi, blo, nv,
        jnp.asarray(_pack_2bit_host(codes)),
        jnp.asarray(lens),
        jnp.int32(0), k, L, False,
    )
    np.testing.assert_array_equal(np.asarray(a_hi), np.asarray(b_hi))
    np.testing.assert_array_equal(np.asarray(a_lo), np.asarray(b_lo))
    assert int(a_nv) == int(b_nv) > 0


def test_2bit_dispatch_rejects_midread_n():
    """A mid-read N is not suffix-invalid: the dispatcher must use the
    nibble path (checked via the suffix-invalid predicate itself)."""
    codes = np.zeros((4, 12), dtype=np.uint8)
    codes[1, 5] = 0x0F  # N mid-read, valid bases after
    invalid = codes > 3
    assert (invalid[:, :-1] & ~invalid[:, 1:]).any()
    codes[1, 5:] = 0x0F  # suffix from there on -> qualifies again
    invalid = codes > 3
    assert not (invalid[:, :-1] & ~invalid[:, 1:]).any()


def test_delta_compress_roundtrip_and_overflow():
    """arrays() wire compression: uint32 gaps reconstruct the sorted
    keys exactly; a >32-bit gap is counted so the caller falls back."""
    import jax.numpy as jnp

    from ploidyfrost_tpu.kmer.count import _delta_compress

    rng = np.random.default_rng(8)
    # keyspace chosen so gaps stay under 2^32 (k=25 tables: 2^50
    # keyspace over millions of keys — same regime)
    km = np.unique(
        rng.integers(0, 1 << 40, 100_000, dtype=np.uint64)
    )
    hi = (km >> np.uint64(32)).astype(np.uint32)
    lo = km.astype(np.uint32)
    d32, nover, first = _delta_compress(jnp.asarray(hi), jnp.asarray(lo))
    assert int(nover) == 0
    gaps = np.asarray(d32).astype(np.uint64)
    out = np.empty(len(km), dtype=np.uint64)
    out[0] = np.uint64(int(first))
    np.cumsum(gaps[1:], out=out[1:])
    out[1:] += out[0]
    np.testing.assert_array_equal(out, km)

    km2 = np.array([5, 6, 6 + (1 << 33)], dtype=np.uint64)
    d32, nover, _ = _delta_compress(
        jnp.asarray((km2 >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray(km2.astype(np.uint32)),
    )
    assert int(nover) == 1
