"""Multi-HOST execution path (VERDICT r4 missing #1).

SURVEY §5's distributed backend is "JAX collectives over ICI within a
slice, DCN across hosts"; the reference's only scaling axis is -t
threads in one address space (src/Main.cpp:124). Here we prove the
process-spanning half: two OS processes x 4 virtual CPU devices form
one 8-device mesh via jax.distributed (Gloo standing in for DCN), the
sharded counter routes k-mers across the process boundary, and the
finalized table + histogram are byte-identical to a single-process
8-device run of the same batches — the multi-host leg of SURVEY §4's
"outputs invariant to mesh shape" requirement.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

K = 21


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _make_batches(tmp_path):
    rng = np.random.default_rng(17)
    G = 60_000
    genome = rng.integers(0, 4, G).astype(np.uint8)
    batches = {}
    for i in range(3):
        starts = rng.integers(0, G - 100, 512)
        batches[f"batch{i}"] = np.stack(
            [genome[s : s + 100] for s in starts]
        )
    path = os.path.join(tmp_path, "reads.npz")
    np.savez(path, k=K, **batches)
    return path, batches


def test_cli_count_two_processes(tmp_path):
    """`ploidyfrost-tpu count` driven by two coordinated processes: the
    user-facing multi-host path (PLOIDYFROST_COORDINATOR env). Both
    read the same FASTA; each ingests only its device shards; process 0
    writes artifacts that must match the single-process CLI run."""
    rng = np.random.default_rng(23)
    G = 50_000
    genome = rng.integers(0, 4, G).astype(np.uint8)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    reads = os.path.join(tmp_path, "reads.fa")
    with open(reads, "w") as f:
        for i, s in enumerate(rng.integers(0, G - 120, 1500)):
            f.write(f">r{i}\n" + bases[genome[s : s + 120]].tobytes().decode() + "\n")

    repo = os.path.dirname(os.path.dirname(__file__))
    code = (
        "import jax, sys; jax.config.update('jax_platforms','cpu');"
        "from ploidyfrost_tpu.cli import main;"
        "sys.exit(main(sys.argv[1:]))"
    )

    def run_single(outpre):
        env = dict(os.environ, PYTHONPATH=repo, PLOIDYFROST_DEVICES="auto")
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        r = subprocess.run(
            [sys.executable, "-c", code, "count", "-k", str(K), "-o",
             outpre, reads],
            env=env, capture_output=True, timeout=420,
        )
        assert r.returncode == 0, r.stderr.decode(errors="replace")

    single_pre = os.path.join(tmp_path, "cli_single")
    run_single(single_pre)

    port = _free_port()
    multi_pre = os.path.join(tmp_path, "cli_multi")
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            PLOIDYFROST_COORDINATOR=f"127.0.0.1:{port}",
            PLOIDYFROST_NUM_PROCESSES="2",
            PLOIDYFROST_PROCESS_ID=str(pid),
            PLOIDYFROST_LOCAL_DEVICES="4",
            PLOIDYFROST_DEVICES="auto",
            PYTHONPATH=repo,
        )
        env.pop("XLA_FLAGS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", code, "count", "-k", str(K), "-o",
                 multi_pre, reads],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, out in zip(procs, outs):
        if p.returncode != 0:
            pytest.fail(
                f"CLI worker rc={p.returncode}:\n"
                f"{out.decode(errors='replace')}"
            )
    with open(single_pre + ".hist.txt", "rb") as f1, open(
        multi_pre + ".hist.txt", "rb"
    ) as f2:
        assert f1.read() == f2.read()
    z1 = np.load(single_pre + ".kmers.npz")
    z2 = np.load(multi_pre + ".kmers.npz")
    assert np.array_equal(z1["kmers"], z2["kmers"])
    assert np.array_equal(z1["counts"], z2["counts"])


def test_two_process_mesh_matches_single_process(tmp_path):
    reads_npz, batches = _make_batches(tmp_path)

    # ---- single-process reference run on the test session's 8-dev mesh
    from ploidyfrost_tpu.parallel.sharded import (
        ShardedKmerCounter,
        balanced_mesh,
    )

    mesh = balanced_mesh(8)
    counter = ShardedKmerCounter(mesh, K, initial_capacity=1 << 14)
    for name in sorted(batches):
        counter.add_reads(batches[name])
    km1, ct1 = counter.arrays()
    single_pre = os.path.join(tmp_path, "single")
    counter.write_histogram(single_pre + ".hist.txt", max_cov=1000)

    # ---- 2-process x 4-device distributed run of the same batches
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "mh_worker.py")
    multi_pre = os.path.join(tmp_path, "multi")
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            PLOIDYFROST_COORDINATOR=f"127.0.0.1:{port}",
            PLOIDYFROST_NUM_PROCESSES="2",
            PLOIDYFROST_PROCESS_ID=str(pid),
            PLOIDYFROST_LOCAL_DEVICES="4",
            PYTHONPATH=os.path.dirname(os.path.dirname(__file__)),
        )
        env.pop("XLA_FLAGS", None)  # worker sets its own device count
        procs.append(
            subprocess.Popen(
                [sys.executable, worker, reads_npz, multi_pre],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, out in zip(procs, outs):
        if p.returncode != 0:
            pytest.fail(
                f"worker rc={p.returncode}:\n{out.decode(errors='replace')}"
            )

    # ---- byte parity
    z = np.load(multi_pre + ".kmers.npz")
    assert np.array_equal(z["kmers"], km1)
    assert np.array_equal(z["counts"], ct1)
    with open(single_pre + ".hist.txt", "rb") as f1, open(
        multi_pre + ".hist.txt", "rb"
    ) as f2:
        assert f1.read() == f2.read()


def test_cli_run_two_processes(tmp_path):
    """Full `run` (graph -> search -> sites -> tables) across two
    coordinated processes: the superbubble search executes over the
    process-spanning mesh (all_gathered outputs), the host tail runs
    redundantly, process 0 writes. Every output table must be
    byte-identical to the single-process CLI run."""
    rng = np.random.default_rng(5)
    G = 60_000
    g1 = rng.integers(0, 4, G).astype(np.uint8)
    g2 = g1.copy()
    snp = rng.random(G) < 0.005
    g2[snp] = (g2[snp] + rng.integers(1, 4, snp.sum())) % 4
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    reads = os.path.join(tmp_path, "reads.fa")
    with open(reads, "w") as f:
        n = 0
        for hap in (g1, g2):
            for _ in range(13):
                for s in rng.integers(0, G - 120, G // 120):
                    n += 1
                    f.write(
                        f">r{n}\n"
                        + bases[hap[s : s + 120]].tobytes().decode()
                        + "\n"
                    )

    repo = os.path.dirname(os.path.dirname(__file__))
    code = (
        "import jax, sys; jax.config.update('jax_platforms','cpu');"
        "from ploidyfrost_tpu.cli import main;"
        "sys.exit(main(sys.argv[1:]))"
    )
    base_env = dict(os.environ, PYTHONPATH=repo, PLOIDYFROST_DEVICES="1")

    # build db + graph once (single process)
    prep = os.path.join(tmp_path, "prep")
    os.makedirs(prep)
    for args in (
        ["count", "-k", str(K), "-o", "db", reads],
        ["build", "-k", str(K), "-o", "graph", reads],
    ):
        r = subprocess.run(
            [sys.executable, "-c", code] + args,
            env=base_env, cwd=prep, capture_output=True, timeout=420,
        )
        assert r.returncode == 0, r.stderr.decode(errors="replace")

    run_args = [
        "-g", os.path.join(prep, "graph.gfa"),
        "-d", os.path.join(prep, "db.kmers.npz"),
        "-o", "out", "-l", "2", "-u", "1000",
    ]

    # single-process run (8-device mesh, like the multi run's global mesh)
    single_dir = os.path.join(tmp_path, "single")
    os.makedirs(single_dir)
    env1 = dict(base_env, PLOIDYFROST_DEVICES="auto")
    env1["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    r = subprocess.run(
        [sys.executable, "-c", code] + run_args,
        env=env1, cwd=single_dir, capture_output=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr.decode(errors="replace")

    # 2-process x 4-device distributed run, shared cwd
    port = _free_port()
    multi_dir = os.path.join(tmp_path, "multi")
    os.makedirs(multi_dir)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            PLOIDYFROST_COORDINATOR=f"127.0.0.1:{port}",
            PLOIDYFROST_NUM_PROCESSES="2",
            PLOIDYFROST_PROCESS_ID=str(pid),
            PLOIDYFROST_LOCAL_DEVICES="4",
            PLOIDYFROST_DEVICES="auto",
            PYTHONPATH=repo,
        )
        env.pop("XLA_FLAGS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", code] + run_args,
                env=env, cwd=multi_dir,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        if p.returncode != 0:
            pytest.fail(
                f"run worker rc={p.returncode}:\n"
                f"{out.decode(errors='replace')}"
            )

    single_out = os.path.join(single_dir, "PloidyFrost_output")
    multi_out = os.path.join(multi_dir, "PloidyFrost_output")
    names = sorted(os.listdir(single_out))
    assert names == sorted(os.listdir(multi_out))
    assert any(n.endswith("_super_bubble.txt") for n in names)
    for name in names:
        with open(os.path.join(single_out, name), "rb") as f1, open(
            os.path.join(multi_out, name), "rb"
        ) as f2:
            assert f1.read() == f2.read(), name
