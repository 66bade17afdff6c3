import os, sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/.axon_site")
import numpy as np

reads = "/tmp/reads5m.fa"
K = 25

from ploidyfrost_tpu.io.fastx import read_batches
from ploidyfrost_tpu.kmer.count import KmerCounter
import jax

t0 = time.time()
batches = list(read_batches([reads], K))
t1 = time.time()
print(f"read+batch: {t1-t0:.1f}s ({len(batches)} batches)", flush=True)

counter = KmerCounter(K)
t0 = time.time()
for b in batches:
    counter.add_reads(b)
t1 = time.time()
print(f"add_reads: {t1-t0:.1f}s", flush=True)
km, ct = counter.arrays()
t2 = time.time()
print(f"arrays(flush+fetch start): {t2-t1:.1f}s", flush=True)
km = np.asarray(km, dtype=np.uint64)
ct = np.asarray(ct)
t3 = time.time()
print(f"fetch: {t3-t2:.1f}s  ({len(km)} distinct)", flush=True)

from ploidyfrost_tpu.graph.construct import build_graph_from_kmers, simplify
t0 = time.time()
g = build_graph_from_kmers(km, K)
t1 = time.time()
print(f"construct: {t1-t0:.1f}s", flush=True)
g = simplify(g, K)
t2 = time.time()
print(f"simplify: {t2-t1:.1f}s  {len(g)} unitigs", flush=True)
t0 = time.time()
g.write_gfa("/tmp/ours5m.gfa")
print(f"write_gfa: {time.time()-t0:.1f}s", flush=True)
