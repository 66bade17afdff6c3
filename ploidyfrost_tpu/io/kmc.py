"""KMC1 database format reader/writer (.kmc_pre / .kmc_suf).

Interop layer with the reference stack: PloidyFrost opens a KMC database
for random access (CKMCFile::OpenForRA, KMC/kmc_api/kmc_file.cpp:27-66)
and probes it per k-mer. Our counter is a device-resident sorted table;
this module serializes that table into the KMC1 on-disk layout so that
(a) the reference binary can run on OUR counts (golden parity tests),
and (b) we can ingest databases produced by a real KMC run.

KMC1 .kmc_pre layout (decoded from kmc_file.cpp:140-302):

    [4B marker "KMCP"]
    [LUT: uint64 * 4^lut_prefix_length]     # record index of first k-mer
                                            # with each prefix (cumsum)
    [header, 5 x uint64]:
        kmer_length | mode << 32            # mode 0 = integer counters
        counter_size | lut_prefix_length << 32
        min_count | max_count << 32
        total_kmers
        both_strands_flag                   # low nibble: 0 => canonical
    [4B pad]                                # keeps (body-4) % 8 == 0
    [uint32 kmc_version = 0]                # 0 = KMC1 (kmc_file.cpp:192)
    [uint32 header_offset = 48]
    [4B marker "KMCP"]

.kmc_suf layout:

    [4B marker "KMCS"]
    [records: total_kmers x (sufix_size + counter_size) bytes]
        suffix: (k - lut)/4 bytes, 4 bases each, first base in the two
                MOST significant bits (BinarySearch compares MSB-first,
                kmc_file.cpp:1383-1438)
        counter: little-endian uint32
    [4B marker "KMCS"]

K-mers are sorted ascending as 2-bit MSB-first integers — identical to
our device table order, so serialization is a pure reshape.
"""

from __future__ import annotations

import numpy as np

PRE_MARKER = b"KMCP"
SUF_MARKER = b"KMCS"


def _pick_lut(k: int) -> int:
    """lut prefix length: (k - lut) must be divisible by 4
    (kmc_file.cpp:274); prefer ~9 like kmc for k=25."""
    best = None
    for lut in range(1, k):
        if (k - lut) % 4 == 0:
            if best is None or abs(lut - 9) < abs(best - 9):
                best = lut
    if best is None:
        raise ValueError(f"no valid lut prefix length for k={k}")
    return best


def write_kmc_db(
    prefix: str,
    kmers: np.ndarray,
    counts: np.ndarray,
    k: int,
    min_count: int = 1,
    max_count: int = 10000,
):
    """Serialize a sorted canonical k-mer count table to KMC1 files."""
    km = np.asarray(kmers, dtype=np.uint64)
    ct = np.asarray(counts, dtype=np.uint32)
    assert km.ndim == 1 and km.shape == ct.shape
    n = len(km)
    lut_len = _pick_lut(k)
    suffix_bases = k - lut_len
    sufix_size = suffix_bases // 4
    counter_size = 4

    pre = np.asarray(km >> np.uint64(2 * suffix_bases), dtype=np.int64)
    lut_entries = 1 << (2 * lut_len)
    counts_per_prefix = np.bincount(pre, minlength=lut_entries)
    lut = np.zeros(lut_entries, dtype=np.uint64)
    lut[1:] = np.cumsum(counts_per_prefix[:-1]).astype(np.uint64)

    with open(prefix + ".kmc_pre", "wb") as f:
        f.write(PRE_MARKER)
        f.write(lut.tobytes())
        header = np.zeros(5, dtype=np.uint64)
        header[0] = np.uint64(k)  # mode 0 in high bits
        header[1] = np.uint64(counter_size) | (np.uint64(lut_len) << np.uint64(32))
        header[2] = np.uint64(min_count) | (np.uint64(max_count) << np.uint64(32))
        header[3] = np.uint64(n)
        header[4] = np.uint64(0)  # low nibble 0 => both_strands (canonical)
        f.write(header.tobytes())
        f.write(b"\x00\x00\x00\x00")  # pad
        f.write(np.uint32(0).tobytes())  # kmc_version = KMC1
        f.write(np.uint32(48).tobytes())  # header_offset
        f.write(PRE_MARKER)

    suf = np.asarray(km & np.uint64((1 << (2 * suffix_bases)) - 1), dtype=np.uint64)
    rec = np.empty((n, sufix_size + counter_size), dtype=np.uint8)
    S = 2 * suffix_bases
    for j in range(sufix_size):
        rec[:, j] = ((suf >> np.uint64(S - 8 * (j + 1))) & np.uint64(0xFF)).astype(
            np.uint8
        )
    rec[:, sufix_size:] = ct.view(np.uint8).reshape(n, 4)  # little-endian
    with open(prefix + ".kmc_suf", "wb") as f:
        f.write(SUF_MARKER)
        f.write(rec.tobytes())
        f.write(SUF_MARKER)


def read_kmc_db(prefix: str):
    """Read a KMC1 database into (sorted kmers uint64, counts int64, k)."""
    with open(prefix + ".kmc_pre", "rb") as f:
        pre = f.read()
    if pre[:4] != PRE_MARKER or pre[-4:] != PRE_MARKER:
        raise ValueError(f"{prefix}.kmc_pre: bad markers")
    kmc_version = int(np.frombuffer(pre[-12:-8], dtype=np.uint32)[0])
    if kmc_version != 0:
        raise ValueError(
            f"{prefix}: only KMC1 databases supported (version={kmc_version:#x})"
        )
    header_offset = int(np.frombuffer(pre[-8:-4], dtype=np.uint32)[0])
    body = pre[4:-4]
    size = len(body) - 4  # mirrors kmc_file.cpp:203/259
    header_start = size - header_offset
    header = np.frombuffer(body[header_start : header_start + 40], dtype=np.uint64)
    k = int(header[0] & np.uint64(0xFFFFFFFF))
    counter_size = int(header[1] & np.uint64(0xFFFFFFFF))
    lut_len = int(header[1] >> np.uint64(32))
    total = int(header[3])
    lut = np.frombuffer(body[:header_start], dtype=np.uint64)
    suffix_bases = k - lut_len
    sufix_size = suffix_bases // 4

    with open(prefix + ".kmc_suf", "rb") as f:
        suf = f.read()
    if suf[:4] != SUF_MARKER or suf[-4:] != SUF_MARKER:
        raise ValueError(f"{prefix}.kmc_suf: bad markers")
    rec = np.frombuffer(suf[4:-4], dtype=np.uint8).reshape(
        total, sufix_size + counter_size
    )
    suffix = np.zeros(total, dtype=np.uint64)
    for j in range(sufix_size):
        suffix = (suffix << np.uint64(8)) | rec[:, j].astype(np.uint64)
    cbytes = rec[:, sufix_size:]
    counts = np.zeros(total, dtype=np.uint64)
    for b in range(counter_size):
        counts |= cbytes[:, b].astype(np.uint64) << np.uint64(8 * b)

    # expand LUT back to per-kmer prefixes
    starts = lut.astype(np.int64)
    reps = np.diff(np.append(starts, total))
    prefixes = np.repeat(np.arange(len(lut), dtype=np.uint64), reps)
    km = (prefixes << np.uint64(2 * suffix_bases)) | suffix
    return km, counts.astype(np.int64), k
