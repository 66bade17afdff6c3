"""Time the bench5m analysis (`run`) through the CLI mesh path on the
8-virtual-CPU mesh."""
import os, sys, time, tempfile
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")
import numpy as np

K = 25
GENOME_BP = 5_000_000

def bench5m(workdir):
    from ploidyfrost_tpu.graph.construct import build_graph_from_kmers
    from ploidyfrost_tpu.kmer.pack import canonical_np, sequence_kmers_np
    rng = np.random.default_rng(7)
    g1 = rng.integers(0, 4, GENOME_BP).astype(np.uint8)
    g2 = g1.copy()
    snp = rng.random(GENOME_BP) < 0.01
    g2[snp] = (g2[snp] + rng.integers(1, 4, snp.sum())) % 4
    k1, _ = sequence_kmers_np(g1, K)
    k2, _ = sequence_kmers_np(g2, K)
    allk = canonical_np(np.concatenate([k1, k2]), K)
    km, mult = np.unique(allk, return_counts=True)
    ct = (mult * 25 // 2 + rng.integers(0, 5, len(km))).astype(np.int64)
    g = build_graph_from_kmers(km, K)
    g.write_gfa(os.path.join(workdir, "bench5m.gfa"))
    np.savez(os.path.join(workdir, "bench5m.kmers.npz"), kmers=km, counts=ct, k=K)
    return len(g)

with tempfile.TemporaryDirectory() as wd:
    t0=time.time(); nu = bench5m(wd); print(f"gen: {time.time()-t0:.1f}s {nu} unitigs", flush=True)
    os.chdir(wd)
    from ploidyfrost_tpu.cli import main
    t0=time.time()
    rc = main(["-g","bench5m.gfa","-d","bench5m.kmers.npz","-o","b5","--devices=8"])
    print(f"mesh run rc={rc}: {time.time()-t0:.1f}s", flush=True)
