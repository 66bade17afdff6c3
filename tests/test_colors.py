"""Unit tests: color matrix ops, .bfg_colors codecs, Cramér's V."""

import io

import numpy as np
import pytest


def test_wyhash_vectors():
    # cross-checked against the vendored bifrost wyhash
    # (bifrost/src/wyhash.h, final v3) compiled with g++
    from ploidyfrost_tpu.io.bfg import wyhash8

    d = bytes([1, 2, 3, 4, 250, 251, 252, 253])
    assert wyhash8(d, 0) == 8647445012313848284
    assert wyhash8(d, 0x123456789ABCDEF) == 5688032836064490754


def test_roaring_roundtrip():
    from ploidyfrost_tpu.io.bfg import roaring_deserialize, roaring_serialize

    rng = np.random.default_rng(0)
    for vals in [
        np.array([], dtype=np.uint32),
        np.array([0], dtype=np.uint32),
        np.array([5, 70000, 70001, 1 << 30], dtype=np.uint32),
        np.unique(rng.integers(0, 1 << 20, 10_000).astype(np.uint32)),
        # force a bitset container: >4096 values in one 16-bit key block
        np.arange(100, 5000, dtype=np.uint32),
    ]:
        vals = np.unique(vals)
        out = roaring_deserialize(roaring_serialize(vals))
        assert (out == vals).all()


def test_unitig_colors_roundtrip():
    from ploidyfrost_tpu.io.bfg import _decode_uc, encode_unitig_colors

    for ck in [
        np.array([], dtype=np.uint64),
        np.array([3], dtype=np.uint64),
        np.array([0, 1, 60], dtype=np.uint64),  # bitvector range
        np.array([0, 61, 1000], dtype=np.uint64),  # roaring
        np.array([123456], dtype=np.uint64),  # single int
    ]:
        buf = io.BytesIO(encode_unitig_colors(ck))
        got, full = _decode_uc(buf)
        assert (got == ck).all()
        assert len(full) == 0


def test_color_matrix_ops():
    from ploidyfrost_tpu.graph.colors import ColorMatrix

    offsets = np.array([0, 3, 5])
    bits = np.array(
        [
            [1, 0],
            [1, 1],
            [1, 0],
            [0, 1],
            [0, 1],
        ],
        dtype=bool,
    )
    cm = ColorMatrix(offsets, bits, ["a", "b"])
    assert cm.n_colors == 2
    assert cm.contains_all(0, 0) and not cm.contains_all(0, 1)
    assert cm.size(0) == 4 and cm.size(1) == 2
    assert list(cm.full_colors(1)) == [False, True]
    assert cm.contains_at(0, 1, 1) and not cm.contains_at(0, 0, 1)
    # size_as without a full/partial split ignores the other length
    assert cm.size_as(0, 100) == 4
    cm2 = ColorMatrix(offsets, bits, ["a", "b"], np.array([1, 0]))
    # one "full" color over 3 km + 1 partial pair -> with other len 5:
    # 1*5 + (4 - 1*3) = 6
    assert cm2.size_as(0, 5) == 6


def test_cramer_v_reference_semantics():
    from ploidyfrost_tpu.sites.emit_colored import cramer_v, max_cramer

    # single nonzero category -> 0 (count < 2 guard, src/CCDBG.cpp:348)
    assert cramer_v([1.0, 0.0], [2.0, 0.0]) == 0.0
    # perfectly associated 2x2
    v = cramer_v([10.0, 0.0], [0.0, 10.0])
    assert abs(v - 1.0) < 1e-12
    # identical distributions -> 0
    assert abs(cramer_v([5.0, 5.0], [5.0, 5.0])) < 1e-12
    # NaN from a zero-sum side is ignored by std::max semantics
    m = max_cramer(np.array([[1.0, 1.0], [0.0, 0.0], [0.0, 10.0]]))
    assert np.isfinite(m)


def test_kmer_head_bytes_layout():
    from ploidyfrost_tpu.io.bfg import kmer_head_bytes

    # base 0 in the two MOST significant bits (Kmer.cpp:92-107)
    b = kmer_head_bytes("T" + "A" * 24, 25)
    v = int.from_bytes(b, "little")
    assert v >> 62 == 3
    b2 = kmer_head_bytes("A" * 24 + "C", 25)
    v2 = int.from_bytes(b2, "little")
    assert (v2 >> (64 - 50)) & 3 == 1
