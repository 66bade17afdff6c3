import os, sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/.axon_site")
import numpy as np

reads = "/root/repo/.scratch/bench/reads50m.fa"
K = 25

from ploidyfrost_tpu.io.fastx import read_batches
from ploidyfrost_tpu.parallel.mesh import make_counter
import jax
from ploidyfrost_tpu.util.jaxcache import enable_compilation_cache
enable_compilation_cache()

counter = make_counter(K)
t0 = time.time()
nb = 0
t_read = 0.0
t_add = 0.0
tr = time.time()
for b in read_batches([reads], K):
    t_read += time.time() - tr
    ta = time.time()
    counter.add_reads(b)
    t_add += time.time() - ta
    nb += 1
    tr = time.time()
print(f"ingest: {time.time()-t0:.1f}s ({nb} batches; read {t_read:.1f}s, add {t_add:.1f}s)", flush=True)
t1 = time.time()
counter.flush()
print(f"final flush: {time.time()-t1:.1f}s", flush=True)
t1 = time.time()
km, ct = counter.arrays()
km = np.asarray(km, dtype=np.uint64); ct = np.asarray(ct)
print(f"arrays+fetch: {time.time()-t1:.1f}s ({len(km)} distinct)", flush=True)

from ploidyfrost_tpu.graph.construct import build_graph_from_kmers, simplify
t1 = time.time()
km = km[ct >= 1]
g = build_graph_from_kmers(km, K)
print(f"construct: {time.time()-t1:.1f}s", flush=True)
t1 = time.time()
g = simplify(g, K)
print(f"simplify: {time.time()-t1:.1f}s {len(g)} unitigs", flush=True)
t1 = time.time()
g.write_gfa("/tmp/ours50m.gfa")
print(f"write_gfa: {time.time()-t1:.1f}s", flush=True)
print(f"TOTAL: {time.time()-t0:.1f}s", flush=True)
