"""KMC database interop tests.

Round-trips both on-disk layouts through io/kmc.py and — when the
toolchain allows — cross-validates against the REFERENCE kmc_api
implementation compiled from /root/reference/KMC at test time
(tests/kmc_oracle.cpp): the reference code must be able to list and
random-access-probe databases we write, and our reader must agree with
what the reference reader sees.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from ploidyfrost_tpu.io.kmc import (
    kmer_signatures,
    read_kmc_db,
    write_kmc2_db,
    write_kmc_db,
)
from ploidyfrost_tpu.kmer.pack import canonical_np, decode_kmers

REF_KMC = "/root/reference/KMC"


def _random_table(seed, n, k):
    rng = np.random.default_rng(seed)
    km = rng.integers(0, 1 << (2 * k), size=2 * n, dtype=np.uint64)
    km = np.unique(canonical_np(km, k))[:n]
    ct = rng.integers(1, 10000, size=len(km)).astype(np.int64)
    return km, ct


@pytest.mark.parametrize("k", [25, 17, 21])
def test_kmc2_roundtrip(tmp_path, k):
    km, ct = _random_table(0, 5000, k)
    p = str(tmp_path / "db2")
    write_kmc2_db(p, km, ct, k)
    km2, ct2, k2 = read_kmc_db(p)
    assert k2 == k
    np.testing.assert_array_equal(km2, km)
    np.testing.assert_array_equal(ct2, ct)


def test_kmc2_roundtrip_small_and_empty(tmp_path):
    k = 25
    p = str(tmp_path / "one")
    km = np.array([12345678901234], dtype=np.uint64)
    km = canonical_np(km, k)
    ct = np.array([7], dtype=np.int64)
    write_kmc2_db(p, km, ct, k)
    km2, ct2, _ = read_kmc_db(p)
    np.testing.assert_array_equal(km2, km)
    np.testing.assert_array_equal(ct2, ct)


def test_signature_matches_bruteforce():
    # brute-force the reference get_signature semantics on random k-mers
    k, sig_len = 25, 7
    rng = np.random.default_rng(3)
    km = canonical_np(
        rng.integers(0, 1 << (2 * k), size=200, dtype=np.uint64), k
    )
    sigs = kmer_signatures(km, k, sig_len)

    special = 1 << (2 * sig_len)

    def allowed(m):
        if (m & 0x3F) == 0x3F or (m & 0x3F) == 0x3B or (m & 0x3C) == 0x3C:
            return False
        mm = m
        for _ in range(sig_len - 3):
            if (mm & 0xF) == 0:
                return False
            mm >>= 2
        if mm == 0 or mm == 0x04 or (mm & 0xF) == 0:
            return False
        return True

    def rev(m):
        r = 0
        for i in range(sig_len):
            r |= (3 - (m & 3)) << (2 * (sig_len - 1 - i))
            m >>= 2
        return r

    def norm1(m):
        a = m if allowed(m) else special
        b = rev(m) if allowed(rev(m)) else special
        return min(a, b)

    for km_val, sig in zip(km[:50], sigs[:50]):
        v = int(km_val)
        best = special
        for i in range(k - sig_len + 1):
            w = (v >> (2 * (k - sig_len - i))) & (special - 1)
            best = min(best, norm1(w))
        assert best == int(sig)


# ---------------------------------------------------------------------------
# Reference kmc_api oracle (compiled at test time)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if not os.path.isdir(REF_KMC) or shutil.which("g++") is None:
        pytest.skip("reference KMC sources or g++ unavailable")
    out = tmp_path_factory.mktemp("oracle") / "kmc_oracle"
    src = os.path.join(os.path.dirname(__file__), "kmc_oracle.cpp")
    cmd = [
        "g++",
        "-O1",
        "-std=c++14",
        "-I",
        REF_KMC,
        src,
        os.path.join(REF_KMC, "kmc_api/kmc_file.cpp"),
        os.path.join(REF_KMC, "kmc_api/kmer_api.cpp"),
        os.path.join(REF_KMC, "kmc_api/mmer.cpp"),
        "-o",
        str(out),
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=180)
    if r.returncode:
        pytest.skip(f"oracle build failed: {r.stderr[-500:]}")
    return str(out)


def _oracle_list(oracle, prefix):
    r = subprocess.run(
        [oracle, prefix, "list"], capture_output=True, text=True, timeout=120
    )
    assert r.returncode == 0, r.stderr
    pairs = [line.split("\t") for line in r.stdout.splitlines() if line]
    return {s: int(c) for s, c in pairs}


def _oracle_check(oracle, prefix, kmer_strs):
    r = subprocess.run(
        [oracle, prefix, "check"],
        input="\n".join(kmer_strs) + "\n",
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert r.returncode == 0, r.stderr
    return [int(x) for x in r.stdout.split()]


@pytest.mark.parametrize("fmt", ["kmc1", "kmc2"])
def test_reference_api_reads_our_db(tmp_path, oracle, fmt):
    k = 25
    km, ct = _random_table(1, 3000, k)
    p = str(tmp_path / fmt)
    if fmt == "kmc1":
        write_kmc_db(p, km, ct, k)
    else:
        write_kmc2_db(p, km, ct, k)
    # full listing must agree
    expected = dict(zip(decode_kmers(km, k), (int(c) for c in ct)))
    got = _oracle_list(oracle, p)
    assert got == expected
    # random-access probes (present and absent k-mers) must agree
    rng = np.random.default_rng(2)
    present = decode_kmers(km[rng.integers(0, len(km), 50)], k)
    absent_km = canonical_np(
        rng.integers(0, 1 << (2 * k), size=80, dtype=np.uint64), k
    )
    absent_km = absent_km[~np.isin(absent_km, km)][:50]
    absent = decode_kmers(absent_km, k)
    counts = _oracle_check(oracle, p, present + absent)
    exp_counts = [expected[s] for s in present] + [-1] * len(absent)
    assert counts == exp_counts
