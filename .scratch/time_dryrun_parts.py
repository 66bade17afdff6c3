import os, sys, time, tempfile
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")
import numpy as np
from __graft_entry__ import _write_reads, _run_cli

rng = np.random.default_rng(0)
with tempfile.TemporaryDirectory() as td:
    reads = os.path.join(td, "reads.fa")
    t0 = time.time(); _write_reads(reads, 400_000, rng); print(f"reads {time.time()-t0:.1f}s", flush=True)
    dm = os.path.join(td, "mesh"); os.makedirs(dm)
    d1 = os.path.join(td, "one"); os.makedirs(d1)
    os.environ["PLOIDYFROST_TABLE_INIT"] = str(1 << 18)
    t0 = time.time(); _run_cli(dm, ["pipeline", "-o", "out", reads, "--devices=8"]); print(f"mesh pipeline {time.time()-t0:.1f}s", flush=True)
    t0 = time.time(); _run_cli(d1, ["pipeline", "-o", "out", reads, "--devices=1"]); print(f"one pipeline {time.time()-t0:.1f}s", flush=True)
