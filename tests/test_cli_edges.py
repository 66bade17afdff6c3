"""CLI edge parity (VERDICT r2 weak #7) + trim/FASTQ edge cases."""

import gzip

import numpy as np
import pytest

from ploidyfrost_tpu.cli import main
from ploidyfrost_tpu.io.trim import TrimConfig, trim_read


def test_invalid_option_prints_usage_and_exits_clean(capsys):
    """Unknown option: 'Invalid option' + usage + nonzero exit, no
    traceback (src/Main.cpp:193-197)."""
    rc = main(["-Z", "nope"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "Invalid option" in out
    assert "ploidyfrost" in out.lower() or "usage" in out.lower()


def test_orphan_optstring_letters_hard_fail(capsys):
    """-e/-R/-N/-S are declared in the reference optstring but have no
    case handler, so they hit ``default:`` -> "Invalid option" + usage
    + exit(EXIT_FAILURE) (src/Main.cpp:124, 193-197). Same for -c on
    the main run path (only our build/pipeline subcommands accept it)."""
    for args in (["-e", "x"], ["-R", "x"], ["-N"], ["-S"], ["-c"],
                 ["model", "-e", "x"], ["count", "-N", "r.fa"]):
        rc = main(args)
        out = capsys.readouterr().out
        assert rc == 1, args
        assert "Invalid option" in out, args


def test_b_flag_does_not_stop_run(tmp_path, monkeypatch):
    """-b never stops before ploidyEstimation: the reference forces
    bubble=true and p defaults true with no way to unset
    (src/Main.cpp:463, 92-120, 836-850)."""
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(0)
    G = 6000
    g1 = rng.integers(0, 4, G).astype(np.uint8)
    g2 = g1.copy()
    snp = rng.random(G) < 0.01
    g2[snp] = (g2[snp] + rng.integers(1, 4, snp.sum())) % 4
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    with open("reads.fa", "w") as f:
        n = 0
        for hap in (g1, g2):
            for _ in range(20):
                for s in rng.integers(0, G - 100, G // 100):
                    n += 1
                    f.write(
                        f">r{n}\n"
                        + bases[hap[s : s + 100]].tobytes().decode()
                        + "\n"
                    )
    assert main(["count", "-k", "15", "-o", "db", "reads.fa"]) == 0
    assert main(["build", "-k", "15", "-o", "graph", "reads.fa"]) == 0
    rc = main(
        ["-g", "graph.gfa", "-d", "db.kmers.npz", "-o", "o", "-b", "-l",
         "2", "-u", "10000"]
    )
    assert rc == 0
    # ploidyEstimation ran: the coverage tables exist
    assert (tmp_path / "PloidyFrost_output" / "o_bicov.txt").exists()


def test_trim_malformed_spec_is_friendly():
    with pytest.raises(SystemExit) as e:
        main(["pipeline", "--trim=LEADING", "x.fa"])
    assert "malformed trim step" in str(e.value)
    with pytest.raises(SystemExit) as e:
        main(["pipeline", "--trim=SLIDINGWINDOW:3", "x.fa"])
    assert "malformed trim step" in str(e.value)


def test_sliding_window_drops_short_reads():
    """Reads shorter than the window are dropped when SLIDINGWINDOW is
    enabled (Trimmomatic SlidingWindowTrimmer semantics)."""
    cfg = TrimConfig(leading=0, trailing=0, window=5, window_quality=20,
                     minlen=1)
    seq = b"ACG"
    qual = bytes([33 + 30] * 3)  # high quality, but shorter than window
    assert trim_read(seq, qual, cfg) == b""
    # window disabled: kept
    cfg2 = TrimConfig(leading=0, trailing=0, window=0, window_quality=20,
                      minlen=1)
    assert trim_read(seq, qual, cfg2) == seq


def test_multiline_fastq(tmp_path):
    """Multi-line FASTQ (kseq-supported) parses correctly."""
    from ploidyfrost_tpu.io.fastx import iter_sequences_with_qual

    p = tmp_path / "ml.fq"
    p.write_bytes(
        b"@r1\nACGTAC\nGTACGT\n+\nIIIIII\nIIIIII\n"
        b"@r2\nACGT\n+r2\nIIII\n"
    )
    recs = list(iter_sequences_with_qual(str(p)))
    assert recs == [
        (b"ACGTACGTACGT", b"IIIIIIIIIIII"),
        (b"ACGT", b"IIII"),
    ]
