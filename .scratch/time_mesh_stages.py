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
    _write_reads(reads, 400_000, rng)
    wd = os.path.join(td, "w"); os.makedirs(wd)
    os.environ["PLOIDYFROST_TABLE_INIT"] = str(1 << 18)
    t0 = time.time(); _run_cli(wd, ["count", "-k", "25", "-o", "db", reads, "--devices=8"]); t1 = time.time()
    print(f"count(mesh): {t1-t0:.1f}s", flush=True)
    # second count run: warm persistent-cache? same process jit cache: new counter, same shapes
    t0 = time.time(); _run_cli(wd, ["count", "-k", "25", "-o", "db2", reads, "--devices=8"]); t1 = time.time()
    print(f"count(mesh, warm): {t1-t0:.1f}s", flush=True)
    _run_cli(wd, ["build", "-k", "25", "-o", "graph", reads, "--devices=1"])
    t0 = time.time()
    _run_cli(wd, ["-g", "graph.gfa", "-d", "db.kmers.npz", "-o", "out", "-h", "db.hist.txt", "--devices=8"])
    print(f"run(mesh): {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    _run_cli(wd, ["model", "-g", "PloidyFrost_output/out_allele_frequency.txt", "-o", "out", "--devices=8"])
    print(f"model(mesh): {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    _run_cli(wd, ["model", "-g", "PloidyFrost_output/out_allele_frequency.txt", "-o", "out2", "--devices=1"])
    print(f"model(one): {time.time()-t0:.1f}s", flush=True)
