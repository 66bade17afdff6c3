"""Parity tests: native C++ FASTX batch loader vs the pure-Python oracle.

The native loader (ploidyfrost_tpu/native/fastx_reader.cpp) must produce
byte-identical batches to read_batches_py for every input shape: FASTA
and FASTQ, gzipped and plain, wrapped lines, N bases, empty records,
reads spanning multiple windows, multi-file iteration crossing batch
boundaries.
"""

import gzip
import random

import numpy as np
import pytest

from ploidyfrost_tpu.io.fastx import read_batches_native, read_batches_py
from ploidyfrost_tpu.native import load_library

pytestmark = pytest.mark.skipif(
    load_library() is None, reason="native fastx reader failed to build"
)


def _random_seq(rng, n):
    return "".join(rng.choice("ACGTacgtN") for _ in range(n))


def _write_fasta(path, seqs, wrap=None, gz=False):
    op = gzip.open if gz else open
    with op(path, "wt") as f:
        for i, s in enumerate(seqs):
            f.write(f">read{i} extra header\n")
            if wrap:
                for j in range(0, len(s), wrap):
                    f.write(s[j : j + wrap] + "\n")
                if not s:
                    f.write("\n")
            else:
                f.write(s + "\n")


def _write_fastq(path, seqs, gz=False):
    op = gzip.open if gz else open
    with op(path, "wt") as f:
        for i, s in enumerate(seqs):
            f.write(f"@read{i}\n{s}\n+\n{'I' * len(s)}\n")


def _collect(gen):
    return [b.copy() for b in gen]


def _assert_same(paths, k, batch_reads=7, max_len=64):
    a = _collect(read_batches_py(paths, k, batch_reads, max_len))
    b = _collect(read_batches_native(paths, k, batch_reads, max_len))
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


@pytest.mark.parametrize("gz", [False, True])
def test_fasta_parity(tmp_path, gz):
    rng = random.Random(0)
    seqs = [_random_seq(rng, n) for n in (0, 3, 25, 26, 63, 64, 65, 200, 500)]
    p = str(tmp_path / ("a.fa.gz" if gz else "a.fa"))
    _write_fasta(p, seqs, wrap=50, gz=gz)
    _assert_same([p], k=25)


@pytest.mark.parametrize("gz", [False, True])
def test_fastq_parity(tmp_path, gz):
    rng = random.Random(1)
    seqs = [_random_seq(rng, n) for n in (0, 10, 25, 64, 150, 151, 400)]
    p = str(tmp_path / ("r.fq.gz" if gz else "r.fq"))
    _write_fastq(p, seqs, gz=gz)
    _assert_same([p], k=25)


def test_multifile_batch_boundary(tmp_path):
    rng = random.Random(2)
    p1 = str(tmp_path / "x.fa")
    p2 = str(tmp_path / "y.fq")
    _write_fasta(p1, [_random_seq(rng, n) for n in (40, 80, 120)])
    _write_fastq(p2, [_random_seq(rng, n) for n in (30, 64, 99, 25)])
    # batch_reads=3 forces file boundaries to land mid-batch
    _assert_same([p1, p2], k=11, batch_reads=3, max_len=48)


def test_no_stale_rows_across_batches(tmp_path):
    # a long read followed by short reads: if the native loader did not
    # invalidate row tails, the short rows would leak the long read's bases
    p = str(tmp_path / "s.fa")
    _write_fasta(p, ["A" * 64, "C" * 30, "G" * 30, "T" * 30, "A" * 30])
    _assert_same([p], k=25, batch_reads=2, max_len=64)


def test_many_empty_records(tmp_path):
    # iterative empty-record skip: millions of bare headers must not
    # overflow the stack (regression for the recursive skip)
    p = str(tmp_path / "e.fa")
    with open(p, "w") as f:
        for i in range(200_000):
            f.write(f">e{i}\n")
        f.write(">real\nACGTACGTACGTACGTACGTACGTACGT\n")
    _assert_same([p], k=25)


def test_truncated_gzip_errors(tmp_path):
    # a corrupt gz stream must raise, not silently emit a truncated read
    good = tmp_path / "g.fq.gz"
    _write_fastq(str(good), ["ACGT" * 100] * 50, gz=True)
    data = good.read_bytes()
    bad = tmp_path / "bad.fq.gz"
    bad.write_bytes(data[: len(data) // 2])
    with pytest.raises(Exception):
        _collect(read_batches_native([str(bad)], 25))


def test_missing_file():
    with pytest.raises(FileNotFoundError):
        _collect(read_batches_native(["/nonexistent/file.fa"], 25))


def test_junk_between_fastq_records(tmp_path):
    """kseq scans forward to the next '@'/'>' marker between records
    (bifrost/src/kseq.h): junk/comment lines are skipped, never treated
    as headers — in BOTH readers, identically."""
    p = str(tmp_path / "junk.fq")
    with open(p, "wb") as f:
        f.write(b"@r1\nACGTACGTACGT\n+\nIIIIIIIIIIII\n")
        f.write(b"junk line\n# another\n\n")
        f.write(b"@r2\nTTTTACGTACGT\n+\nIIIIIIIIIIII\n")
    a = _collect(read_batches_py([p], 5, 4, 32))
    b = _collect(read_batches_native([p], 5, 4, 32))
    assert len(a) == len(b) == 1
    np.testing.assert_array_equal(a[0], b[0])
    # exactly the two real records survive
    from ploidyfrost_tpu.kmer.pack import INVALID_BASE

    assert (a[0][0] != INVALID_BASE).sum() == 12
    assert (a[0][1] != INVALID_BASE).sum() == 12
    assert (a[0][2:] == INVALID_BASE).all()


def test_multiline_fastq_parity(tmp_path):
    """Multi-line FASTQ (kseq-supported) parses identically in the
    native and Python readers, including zero-length records."""
    p = str(tmp_path / "ml.fq")
    with open(p, "wb") as f:
        f.write(b"@r1\nACGTAC\nGTACGTAA\n+\nIIIIII\nIIIIIIII\n")
        f.write(b"@r0\n\n+\n\n")
        f.write(
            b"@r2\nACGTACGTACGTACGTACGTACGTACGTA\n+r2\n"
            b"IIIIIIIIIIIIIIIIIIIIIIIIIIIII\n"
        )
    _assert_same([p], k=5)
