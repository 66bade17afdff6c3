"""CLI-level mesh parity: the `--devices` flag (parallel/mesh.py) must
route counting, superbubble search and EM through the 8-virtual-device
mesh AND produce byte-identical outputs to the single-device path — via
the CLI alone, no hand-assembled stages (VERDICT r3 item 1; the mesh is
our analog of the reference's `-t`, src/Main.cpp:124)."""

import os

import numpy as np
import pytest

from ploidyfrost_tpu.cli import main


def _write_reads(path, G=100_000, seed=3, passes=13):
    rng = np.random.default_rng(seed)
    g1 = rng.integers(0, 4, G)
    g2 = g1.copy()
    snp = rng.random(G) < 0.005
    g2[snp] = (g2[snp] + rng.integers(1, 4, snp.sum())) % 4
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    with open(path, "w") as f:
        n = 0
        for hap in (g1, g2):
            for _ in range(passes):
                for s in rng.integers(0, G - 150, G // 150):
                    n += 1
                    f.write(
                        f">r{n}\n"
                        + bases[hap[s : s + 150]].tobytes().decode()
                        + "\n"
                    )


def _run_pipeline(workdir, reads, devices):
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        rc = main(
            ["pipeline", "-o", "out", reads, f"--devices={devices}"]
        )
    finally:
        os.chdir(cwd)
    assert rc == 0


def _snapshot(workdir):
    out = {}
    for root, _, files in os.walk(workdir):
        for f in files:
            p = os.path.join(root, f)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, workdir)] = fh.read()
    return out


def test_pipeline_mesh_byte_parity(tmp_path):
    reads = str(tmp_path / "reads.fa")
    _write_reads(reads)
    d1 = tmp_path / "one"
    d8 = tmp_path / "mesh"
    d1.mkdir()
    d8.mkdir()
    _run_pipeline(str(d1), reads, 1)
    _run_pipeline(str(d8), reads, 8)
    s1 = _snapshot(str(d1))
    s8 = _snapshot(str(d8))
    assert set(s1) == set(s8)
    mismatched = [f for f in sorted(s1) if s1[f] != s8[f]]
    assert mismatched == [], f"mesh CLI outputs differ: {mismatched}"


def test_devices_flag_validation():
    with pytest.raises(SystemExit, match="integer"):
        main(["pipeline", "--devices=x"])
    with pytest.raises(SystemExit, match=">= 1"):
        main(["pipeline", "--devices=0"])


def test_pipeline_multi_mesh_byte_parity(tmp_path):
    """The COLORED end-to-end CLI (pipeline-multi) must also be
    byte-identical through the mesh: sharded counting per sample,
    colored sharded search, psum EM."""
    rng = np.random.default_rng(21)
    G = 60_000
    base = rng.integers(0, 4, G)
    h2 = base.copy()
    snp = rng.random(G) < 0.005
    h2[snp] = (h2[snp] + rng.integers(1, 4, snp.sum())) % 4
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    samples = []
    for s in range(3):
        p = str(tmp_path / f"s{s}.fa")
        with open(p, "w") as f:
            n = 0
            for hap in (base, h2):
                for _ in range(13):
                    for st in rng.integers(0, G - 150, G // 150):
                        n += 1
                        f.write(
                            f">r{n}\n"
                            + bases[hap[st : st + 150]].tobytes().decode()
                            + "\n"
                        )
        samples.append(p)

    def run(workdir, devices):
        cwd = os.getcwd()
        os.chdir(workdir)
        try:
            rc = main(
                ["pipeline-multi", "-o", "out"]
                + samples
                + [f"--devices={devices}"]
            )
        finally:
            os.chdir(cwd)
        assert rc == 0

    d1 = tmp_path / "one"
    d8 = tmp_path / "mesh"
    d1.mkdir()
    d8.mkdir()
    run(str(d8), 8)
    run(str(d1), 1)
    s1 = _snapshot(str(d1))
    s8 = _snapshot(str(d8))
    assert set(s1) == set(s8)
    mismatched = [f for f in sorted(s1) if s1[f] != s8[f]]
    assert mismatched == [], f"colored mesh CLI outputs differ: {mismatched}"
