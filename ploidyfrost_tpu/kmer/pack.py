"""2-bit k-mer packing, reverse complement, canonicalization (device ops).

Replaces the roles of bifrost/src/Kmer.hpp:4-120 (2-bit packed k-mer,
twin/rep canonicalization) and KMC/kmc_api/kmer_api.h:433-486
(from_string / reverse / to_string) with vectorized jnp bit ops.

Encoding: A=0, C=1, G=2, T=3 (the shared KMC/Bifrost base encoding,
bifrost/src/Common.hpp:34). A k-mer is a single uint64 with the FIRST
base in the most-significant occupied bits, so unsigned integer order
== lexicographic string order — which makes `min(fwd, revcomp)`
canonicalization agree with KMC's canonical k-mer choice.

k <= 31 is supported in one word (the reference pipeline uses k=25,
script/pipeline/2.kmc_db:12).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# base codes: 0..3 = ACGT, INVALID_BASE marks N/other and padding
INVALID_BASE = np.uint8(4)

_CODE_TABLE = np.full(256, INVALID_BASE, dtype=np.uint8)
for _i, _c in enumerate("ACGT"):
    _CODE_TABLE[ord(_c)] = _i
    _CODE_TABLE[ord(_c.lower())] = _i

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def encode_bases(seq: bytes | str | np.ndarray) -> np.ndarray:
    """ASCII sequence -> uint8 base codes (host-side, vectorized)."""
    if isinstance(seq, str):
        seq = seq.encode()
    arr = np.frombuffer(seq, dtype=np.uint8) if isinstance(seq, bytes) else seq
    return _CODE_TABLE[arr]


def decode_bases(codes: np.ndarray) -> str:
    return _BASES[np.asarray(codes)].tobytes().decode()


def encode_kmer_string(s: str) -> int:
    """Pack one k-mer string into a python int (for tests / tiny paths)."""
    v = 0
    for c in s:
        v = (v << 2) | int(_CODE_TABLE[ord(c)])
    return v


def decode_kmers(kmers, k: int) -> list[str]:
    """uint64 array -> k-mer strings (host-side)."""
    kmers = np.asarray(kmers, dtype=np.uint64)
    out = []
    for v in kmers:
        v = int(v)
        out.append("".join("ACGT"[(v >> (2 * (k - 1 - i))) & 3] for i in range(k)))
    return out


def revcomp_np(kmers: np.ndarray, k: int) -> np.ndarray:
    """Host (numpy) reverse complement of packed k-mers."""
    x = (~np.asarray(kmers, dtype=np.uint64)).astype(np.uint64)
    for shift, mask in (
        (2, 0x3333333333333333),
        (4, 0x0F0F0F0F0F0F0F0F),
        (8, 0x00FF00FF00FF00FF),
        (16, 0x0000FFFF0000FFFF),
    ):
        m = np.uint64(mask)
        s = np.uint64(shift)
        x = ((x >> s) & m) | ((x & m) << s)
    x = (x >> np.uint64(32)) | (x << np.uint64(32))
    return x >> np.uint64(64 - 2 * k)


def canonical_np(kmers: np.ndarray, k: int) -> np.ndarray:
    km = np.asarray(kmers, dtype=np.uint64)
    return np.minimum(km, revcomp_np(km, k))


def sequence_kmers_np(codes: np.ndarray, k: int):
    """Host (numpy) variant of sequence_kmers for a single [L] code
    array: returns (kmers [L-k+1] uint64, valid bool). Used by the
    host-side string paths (window/unitig coverage) where per-length jit
    compiles would dominate."""
    codes = np.asarray(codes)
    L = codes.shape[-1]
    n = L - k + 1
    acc = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        acc = (acc << np.uint64(2)) | (
            codes[j : j + n].astype(np.uint64) & np.uint64(3)
        )
    bad = (codes >= INVALID_BASE).astype(np.int32)
    cum = np.cumsum(bad)
    hi = cum[k - 1 :]
    lo = np.concatenate([[0], cum[: n - 1]])
    return acc, (hi - lo) == 0


def string_kmers_np(s: str, k: int) -> np.ndarray:
    """All (forward-strand) k-mers of an ACGT string, host-side."""
    km, valid = sequence_kmers_np(encode_bases(s), k)
    if not valid.all():
        raise ValueError(f"invalid base in sequence {s[:50]!r}")
    return km


def revcomp_kmers(kmers: jnp.ndarray, k: int) -> jnp.ndarray:
    """Reverse complement of packed k-mers, fully vectorized bit-twiddling.

    Complement = ~x (2-bit codes are complement-symmetric: A<->T 0<->3,
    C<->G 1<->2), then reverse the 2-bit groups within the 64-bit word,
    then shift down so the k-mer occupies the low 2k bits.
    """
    x = jnp.asarray(kmers, dtype=jnp.uint64)
    x = ~x
    # swap adjacent 2-bit groups progressively (pairs, nibbles, bytes, ...)
    # np (not jnp) scalars: jnp scalar construction under trace is an eager
    # device_put, and lowering fetches each such constant back over the
    # (slow) device tunnel.
    m = np.uint64
    x = ((x >> m(2)) & m(0x3333333333333333)) | ((x & m(0x3333333333333333)) << m(2))
    x = ((x >> m(4)) & m(0x0F0F0F0F0F0F0F0F)) | ((x & m(0x0F0F0F0F0F0F0F0F)) << m(4))
    x = ((x >> m(8)) & m(0x00FF00FF00FF00FF)) | ((x & m(0x00FF00FF00FF00FF)) << m(8))
    x = ((x >> m(16)) & m(0x0000FFFF0000FFFF)) | ((x & m(0x0000FFFF0000FFFF)) << m(16))
    x = (x >> m(32)) | (x << m(32))
    return x >> m(64 - 2 * k)


def canonical_kmers(kmers: jnp.ndarray, k: int) -> jnp.ndarray:
    """min(k-mer, revcomp) — matches KMC canonical-form counting."""
    rc = revcomp_kmers(kmers, k)
    km = jnp.asarray(kmers, dtype=jnp.uint64)
    return jnp.minimum(km, rc)


def sequence_kmers(codes: jnp.ndarray, k: int):
    """All k-mers of a code sequence.

    codes: [..., L] uint8 (0..3 valid, INVALID_BASE for N/padding)
    returns (kmers [..., L-k+1] uint64, valid [..., L-k+1] bool)
    """
    codes = jnp.asarray(codes)
    L = codes.shape[-1]
    n = L - k + 1
    acc = jnp.zeros(codes.shape[:-1] + (n,), dtype=jnp.uint64)
    for j in range(k):
        b = codes[..., j : j + n].astype(jnp.uint64) & np.uint64(3)
        acc = (acc << np.uint64(2)) | b
    bad = (codes >= INVALID_BASE).astype(jnp.int32)
    cum = jnp.cumsum(bad, axis=-1)
    # window [i, i+k) contains an invalid base iff cum[i+k-1] - cum[i-1] > 0
    hi = cum[..., k - 1 :]
    lo = jnp.concatenate(
        [jnp.zeros(codes.shape[:-1] + (1,), jnp.int32), cum[..., : n - 1]], axis=-1
    )
    valid = (hi - lo) == 0
    return acc, valid


def batch_kmers(codes: jnp.ndarray, k: int):
    """Canonical k-mers of a batch of padded reads.

    codes: [B, L] uint8. Returns (canon [B, L-k+1] uint64, valid bool).
    """
    kmers, valid = sequence_kmers(codes, k)
    return canonical_kmers(kmers, k), valid
