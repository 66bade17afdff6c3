"""Quality-trimming stage (Trimmomatic's role, script/pipeline/1.trim)."""

import gzip

import numpy as np
import pytest

from ploidyfrost_tpu.io.fastx import read_batches_py
from ploidyfrost_tpu.io.trim import PHRED_OFFSET, TrimConfig, trim_read


def q(*vals):
    return bytes(v + PHRED_OFFSET for v in vals)


def test_parse_spec_matches_reference_invocation():
    cfg = TrimConfig.parse("LEADING:10,TRAILING:10,SLIDINGWINDOW:3:20,MINLEN:50")
    assert cfg == TrimConfig()  # defaults ARE the reference's arguments


def test_leading_trailing():
    cfg = TrimConfig(leading=10, trailing=10, window=0, minlen=0)
    seq = b"ACGTACGT"
    qual = q(2, 5, 30, 30, 30, 30, 9, 3)
    assert trim_read(seq, qual, cfg) == b"GTAC"


def test_all_low_quality_dropped():
    cfg = TrimConfig(leading=10, trailing=10, window=0, minlen=1)
    assert trim_read(b"ACGT", q(2, 2, 2, 2), cfg) == b""


def test_sliding_window_cuts_at_first_bad_window():
    # window=3, threshold=20: quality collapses mid-read
    cfg = TrimConfig(leading=0, trailing=0, window=3, window_quality=20, minlen=0)
    qual = q(30, 30, 30, 30, 2, 2, 2, 2)
    # first bad window starts at index 3 (mean(30,2,2) < 20); base 3 (q=30)
    # individually passes, so the cut extends through it
    assert trim_read(b"AAAACCCC", qual, cfg) == b"AAAA"


def test_sliding_window_keeps_good_read():
    cfg = TrimConfig(leading=0, trailing=0, window=3, window_quality=20, minlen=0)
    seq = b"ACGTACGTAC"
    assert trim_read(seq, q(*[30] * 10), cfg) == seq


def test_minlen_drops_short_remainder():
    cfg = TrimConfig(leading=10, trailing=10, window=0, minlen=5)
    assert trim_read(b"ACGTACGT", q(2, 5, 30, 30, 30, 30, 9, 3), cfg) == b""


def test_fasta_passthrough():
    assert trim_read(b"ACGT", None, TrimConfig()) == b"ACGT"


def test_read_batches_trim_integration(tmp_path):
    # two reads: one fully good, one with a low-quality tail that shrinks
    # below k after trimming (so it contributes no rows)
    k = 5
    good = b"ACGTACGTACGTACGT"
    bad = b"ACGTACGTACGTACGT"
    fq = tmp_path / "r.fq.gz"
    with gzip.open(fq, "wb") as f:
        f.write(b"@r1\n" + good + b"\n+\n" + q(*[30] * len(good)) + b"\n")
        f.write(b"@r2\n" + bad + b"\n+\n" + q(*([30] * 4 + [2] * 12)) + b"\n")
    cfg = TrimConfig(leading=10, trailing=10, window=0, minlen=k)
    batches = list(read_batches_py(str(fq), k, batch_reads=4, max_len=32, trim=cfg))
    assert len(batches) == 1
    rows = batches[0]
    # r1 survives untouched; r2 trimmed to 4 bases < minlen -> dropped
    assert bytes(rows[0, : len(good)]) == bytes(
        np.frombuffer(good, np.uint8) % 8 % 5
    ) or (rows[0] != 4).sum() == len(good)
    assert (rows[1] != 4).sum() == 0  # second row is pure padding


def test_cli_trim_flag_parses():
    from ploidyfrost_tpu.cli import _extract_trim

    argv, trim = _extract_trim(["-o", "x", "--trim", "r.fq"])
    assert argv == ["-o", "x", "r.fq"] and trim == TrimConfig()
    argv, trim = _extract_trim(["--trim=LEADING:3,MINLEN:36"])
    assert trim.leading == 3 and trim.minlen == 36 and trim.trailing == 10


def test_native_trim_matches_python(tmp_path):
    """The native reader's in-C trimming cascade must produce batches
    byte-identical to the Python reader's (io/trim.trim_read)."""
    import numpy as np

    from ploidyfrost_tpu.io.fastx import read_batches_native, read_batches_py
    from ploidyfrost_tpu.native import load_library

    if load_library() is None:
        import pytest

        pytest.skip("native reader unavailable")
    rng = np.random.default_rng(9)
    p = tmp_path / "t.fq"
    with open(p, "w") as f:
        for i in range(400):
            n = int(rng.integers(30, 180))
            seq = "".join("ACGTN"[c] for c in rng.integers(0, 5, n))
            # quality ramps/drops to exercise every operator
            q = rng.integers(2, 41, n)
            if i % 3 == 0:
                q[: int(rng.integers(0, 8))] = 3  # bad leading
            if i % 4 == 0:
                q[-int(rng.integers(1, 9)) :] = 4  # bad trailing
            qual = "".join(chr(33 + int(x)) for x in q)
            f.write(f"@r{i}\n{seq}\n+\n{qual}\n")
    for spec in (TrimConfig(), TrimConfig(leading=20, trailing=25,
                                          window=5, window_quality=30,
                                          minlen=20)):
        a = [b.copy() for b in read_batches_py([str(p)], 25, 16, 96, trim=spec)]
        b = [b.copy() for b in read_batches_native([str(p)], 25, 16, 96, trim=spec)]
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
