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
    t0 = time.time(); _run_cli(wd, ["count", "-k", "25", "-o", "db1", reads, "--devices=1"]); t1 = time.time()
    print(f"count(one): {t1-t0:.1f}s", flush=True)
    import hashlib
    for f in ("db", "db1"):
        z = np.load(os.path.join(wd, f + ".kmers.npz"))
        print(f, len(z["kmers"]), hashlib.md5(z["kmers"].tobytes()+z["counts"].tobytes()).hexdigest(), flush=True)
