"""Per-phase profile of build_graph_from_kmers at 5/50 Mbp scale."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("PLOIDYFROST_DEVICES", "1")
import numpy as np

G = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
K = 25

from ploidyfrost_tpu.kmer.pack import canonical_np, sequence_kmers_np

t0 = time.time()
rng = np.random.default_rng(7)
g1 = rng.integers(0, 4, G).astype(np.uint8)
g2 = g1.copy()
snp = rng.random(G) < 0.01
g2[snp] = (g2[snp] + rng.integers(1, 4, snp.sum())) % 4
k1, _ = sequence_kmers_np(g1, K)
k2, _ = sequence_kmers_np(g2, K)
allk = canonical_np(np.concatenate([k1, k2]), K)
km = np.unique(allk)
del allk, k1, k2, g1, g2
print(f"gen: {time.time()-t0:.1f}s, {len(km)} distinct", flush=True)

from ploidyfrost_tpu.graph.construct import (
    _links_junctions_fast, _rank_chains_fast, _revcomp_np, _lex_perm)

t0 = time.time()
rc = _revcomp_np(km, K)
print(f"rc: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
nxt = _links_junctions_fast(km, rc, K)
print(f"link: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
order, chain_start = _rank_chains_fast(nxt)
print(f"rank: {time.time()-t0:.1f}s", flush=True)

starts = np.flatnonzero(chain_start)
ends = np.append(starts[1:], len(order))
head_nodes = order[starts]
tail_nodes = order[ends - 1]
keep = head_nodes <= (tail_nodes ^ 1)
kstarts = starts[keep]; kends = ends[keep]
m = kends - kstarts
nc = len(kstarts)
lengths = K + m - 1

from ploidyfrost_tpu.native import load_construct_library
import ctypes
from ploidyfrost_tpu.graph.seqstore import SeqStore

lib = load_construct_library()
t0 = time.time()
nwords = (lengths + 31) // 32
off_w = np.zeros(nc + 1, dtype=np.int64)
np.cumsum(nwords, out=off_w[1:])
words = np.zeros(int(off_w[-1]), dtype=np.uint64)
def i64p(a): return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
def u64p(a): return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))
lib.pf_assemble_unitigs(
    i64p(np.ascontiguousarray(order)), i64p(np.ascontiguousarray(kstarts)),
    i64p(np.ascontiguousarray(kends)), ctypes.c_int64(nc),
    u64p(np.ascontiguousarray(km)), u64p(np.ascontiguousarray(rc)),
    ctypes.c_int32(K), u64p(words), i64p(off_w))
store = SeqStore(words, off_w, lengths)
print(f"assemble: {time.time()-t0:.1f}s, {nc} unitigs", flush=True)

t0 = time.time()
perm = _lex_perm(store)
print(f"lex: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
store2 = store.reorder(perm)
print(f"reorder: {time.time()-t0:.1f}s", flush=True)

from ploidyfrost_tpu.graph.cdbg import CDBGraph
t0 = time.time()
g = CDBGraph(store2, K)
print(f"cdbg(adj): {time.time()-t0:.1f}s", flush=True)

from ploidyfrost_tpu.graph.construct import _simplify_fast, _simplify_rebuild
lens = g.store.lengths
deg_fw = g._out_deg[:, 1]; deg_bw = g._out_deg[:, 0]
drop = np.asarray((lens < 2*K) & ((deg_fw == 0) | (deg_bw == 0)))
print(f"drop candidates: {int(drop.sum())}", flush=True)
t0 = time.time()
fast = _simplify_fast(g, K, drop)
print(f"simplify_fast: {time.time()-t0:.1f}s -> {'ok '+str(len(fast)) if fast is not None else 'BAIL'}", flush=True)
