"""Native compacted-DBG construction from a k-mer table.

Replaces Bifrost's build path (CompactedDBG::{filter,construct,
splitAllUnitigs,joinUnitigs}, bifrost/src/CompactedDBG.tcc:248-3320) with
a bulk-synchronous, fully vectorized design — no Bloom filters, no
locks, no hash walks:

  1. the distinct canonical k-mer set IS the node set (exact counting
     replaces the reference's blocked-Bloom approximate membership —
     no false-positive cleanup pass needed);
  2. per-node out-degrees in both orientations come from 8 batched
     membership probes (4 bases x 2 strands) against the sorted table —
     device `searchsorted` gathers;
  3. a k-mer links forward to its unique successor iff
     outdeg(x,o) == 1 and indeg(y,o') == 1 (the unitig-interior rule,
     CompactedDBG.tcc construct/joinUnitigs semantics);
  4. maximal chains are extracted with pointer-doubling list ranking
     (O(log n) gathers) instead of sequential walks;
  5. each unitig appears once per direction; the duplicate is dropped by
     head/tail node-id comparison. Orientation + ordering are made
     deterministic (lexicographic), so construction is reproducible and
     mesh-shape-invariant (unlike Bifrost's thread-order-dependent
     insertion ids).

Optional `simplify` mirrors Bifrost `-i -d` (clip short tips / delete
short isolated unitigs, bifrost/src/CompactedDBG.tcc:745-770) by
removing the affected k-mers and recompacting.
"""

from __future__ import annotations

import numpy as np

from ..kmer.pack import decode_kmers
from .cdbg import CDBGraph, revcomp


def _revcomp_np(kmers: np.ndarray, k: int) -> np.ndarray:
    x = (~kmers).astype(np.uint64)
    for shift, mask in (
        (2, 0x3333333333333333),
        (4, 0x0F0F0F0F0F0F0F0F),
        (8, 0x00FF00FF00FF00FF),
        (16, 0x0000FFFF0000FFFF),
    ):
        m = np.uint64(mask)
        s = np.uint64(shift)
        x = ((x >> s) & m) | ((x & m) << s)
    x = (x >> np.uint64(32)) | (x << np.uint64(32))
    return x >> np.uint64(64 - 2 * k)


def _canon_np(kmers: np.ndarray, k: int) -> np.ndarray:
    return np.minimum(kmers, _revcomp_np(kmers, k))


def _member(sorted_kmers: np.ndarray, queries: np.ndarray) -> np.ndarray:
    idx = np.searchsorted(sorted_kmers, queries)
    idx = np.clip(idx, 0, len(sorted_kmers) - 1)
    return sorted_kmers[idx] == queries, idx


def build_graph_from_kmers(kmers: np.ndarray, k: int) -> CDBGraph:
    """Compact a sorted distinct canonical k-mer set into unitigs."""
    km = np.asarray(kmers, dtype=np.uint64)
    n = len(km)
    if n == 0:
        return CDBGraph([], k)
    mask = np.uint64((1 << (2 * k)) - 1)
    rc = _revcomp_np(km, k)

    # successor presence for both orientations x 4 bases
    # fw orientation = the canonical form itself; bw = its revcomp
    succ_idx = np.full((2, 4, n), -1, dtype=np.int64)  # index of next canon
    succ_flip = np.zeros((2, 4, n), dtype=bool)  # next is stored as rc
    outdeg = np.zeros((2, n), dtype=np.int8)
    for o, base_km in ((0, km), (1, rc)):
        for b in range(4):
            nxt = ((base_km << np.uint64(2)) | np.uint64(b)) & mask
            nxt_rc = _revcomp_np(nxt, k)
            nxt_canon = np.minimum(nxt, nxt_rc)
            present, idx = _member(km, nxt_canon)
            succ_idx[o, b] = np.where(present, idx, -1)
            succ_flip[o, b] = nxt != nxt_canon  # arriving in rc orientation
            outdeg[o] += present.astype(np.int8)

    # node = 2*i + o  (o=0: canonical orientation, o=1: revcomp)
    # link (i,o) -> (j,o') iff outdeg[o,i]==1 and indeg(j,o')==1,
    # where indeg(j, o') == outdeg[1-o', j] (predecessors of one side are
    # the successors of the twin side, NeighborIterator semantics)
    nxt_node = np.full(2 * n, -1, dtype=np.int64)
    for o in range(2):
        uniq = outdeg[o] == 1
        # the single successor: sum over bases of (idx+1), minus 1
        j = np.where(
            uniq,
            np.max(np.where(succ_idx[o] >= 0, succ_idx[o], -1), axis=0),
            -1,
        )
        flip = np.zeros(n, dtype=bool)
        for b in range(4):
            sel = uniq & (succ_idx[o, b] >= 0)
            flip[sel] = succ_flip[o, b][sel]
        o2 = flip.astype(np.int64)  # arriving orientation bit
        ok = uniq & (j >= 0)
        jj = np.where(ok, j, 0)
        indeg_ok = outdeg[1 - o2, jj] == 1
        # no self-loop links (k-mer following itself)
        not_self = jj != np.arange(n)
        ok = ok & indeg_ok & not_self
        nxt_node[2 * np.arange(n) + o] = np.where(ok, 2 * j + o2, -1)

    # drop links whose reverse direction disagrees (safety for palindromic
    # edge cases): link a->b must have twin(b)->twin(a)
    a = np.arange(2 * n)
    b = nxt_node
    has = b >= 0
    twin = lambda x: x ^ 1  # noqa: E731
    back = np.where(has, nxt_node[twin(np.where(has, b, 0))], -1)
    ok = has & (back == twin(a))
    nxt_node = np.where(ok, nxt_node, -1)

    # has_pred via scatter
    has_pred = np.zeros(2 * n, dtype=bool)
    valid_to = nxt_node[nxt_node >= 0]
    has_pred[valid_to] = True

    # pointer-doubling list ranking over the predecessor pointers:
    # pos[i] = distance from i back to its chain head; headof[i] = head id
    prev = np.full(2 * n, -1, dtype=np.int64)
    prev[valid_to] = a[nxt_node >= 0]
    pos = np.where(prev >= 0, np.int64(1), np.int64(0))
    jump = prev.copy()  # jump[i] = node `pos-accumulated` hops back
    for _ in range(64):
        active = jump >= 0
        if not active.any():
            break
        ji = np.where(active, jump, 0)
        jump2 = np.where(active, jump[ji], -1)
        pos = pos + np.where(active, pos[ji], 0)
        jump = np.where(active, jump2, jump)
    headof = np.where(prev < 0, a, -1)
    ptr2 = prev.copy()
    for _ in range(64):
        active = (headof < 0) & (ptr2 >= 0)
        if not active.any():
            break
        pi = np.where(active, ptr2, 0)
        resolved = headof[pi] >= 0
        headof = np.where(active & resolved, headof[pi], headof)
        ptr2 = np.where(active & ~resolved, ptr2[pi], ptr2)
    # cycles: headof still -1 — break at the minimum node id of the cycle
    cyc = headof < 0
    if cyc.any():
        # pointer-double a min-accumulator around the cycle
        mn = a.copy()
        jp = prev.copy()
        for _ in range(64):
            act = cyc & (jp >= 0)
            if not act.any():
                break
            ji = np.where(act, jp, 0)
            mn = np.where(act, np.minimum(mn, mn[ji]), mn)
            jp = np.where(act, jp[ji], jp)
        headof = np.where(cyc, mn, headof)
        # cut the link INTO each cycle head so chains are linear
        cyc_heads = np.unique(headof[cyc])
        pr = prev[cyc_heads]
        nxt_node[pr[pr >= 0]] = -1
        prev[cyc_heads] = -1
        # recompute positions for cycle nodes relative to their head
        # (rare path: do it sequentially per cycle)
        for h in cyc_heads:
            p = 0
            node = h
            while True:
                pos[node] = p
                node = nxt_node[node]
                p += 1
                if node < 0 or node == h:
                    break

    # group nodes by head, order by position -> chains
    order = np.lexsort((pos, headof))
    sorted_heads = headof[order]
    chain_start = np.concatenate(
        [[True], sorted_heads[1:] != sorted_heads[:-1]]
    )
    starts = np.flatnonzero(chain_start)
    ends = np.append(starts[1:], len(order))

    # decode chains -> unitig strings; drop twin duplicates
    base_chars = np.array(list("ACGT"))
    km_strs = None  # decoded lazily per chain head/tail need
    seqs: list[str] = []
    LAST = np.uint64(3)
    for s, e in zip(starts, ends):
        nodes = order[s:e]
        head_n, tail_n = nodes[0], nodes[-1]
        # twin chain's head is twin(tail); keep the lexicographically
        # decisive copy: keep iff head <= twin(tail)
        if head_n > (tail_n ^ 1):
            continue
        idxs = nodes >> 1
        orients = nodes & 1
        first = km[idxs[0]] if orients[0] == 0 else _revcomp_np(
            km[idxs[0] : idxs[0] + 1], k
        )[0]
        first_s = decode_kmers([first], k)[0]
        if len(nodes) == 1:
            seqs.append(first_s)
            continue
        oriented = np.where(
            orients == 0, km[idxs], _revcomp_np(km[idxs], k)
        )
        lasts = (oriented & LAST).astype(np.int64)
        tail_chars = base_chars[lasts[1:]]
        seqs.append(first_s + "".join(tail_chars))
    # deterministic canonical form: store min(seq, revcomp) and sort
    seqs = [min(s, revcomp(s)) for s in seqs]
    seqs.sort()
    return CDBGraph(seqs, k)


def simplify(g: CDBGraph, k: int) -> CDBGraph:
    """Bifrost `-i -d`: delete short isolated unitigs and clip short
    tips (< 2k bases), then recompact (CompactedDBG.tcc:745-770)."""
    drop = set()
    for i in range(len(g)):
        ln = len(g.seqs[i])
        nb_fw = g.out_degree(i, True)
        nb_bw = g.out_degree(i, False)
        if ln < 2 * k:
            if nb_fw == 0 and nb_bw == 0:
                drop.add(i)  # isolated
            elif nb_fw == 0 or nb_bw == 0:
                drop.add(i)  # tip
    if not drop:
        return g
    from ..kmer.pack import string_kmers_np

    kept = [s for i, s in enumerate(g.seqs) if i not in drop]
    kms = []
    for s in kept:
        kms.append(_canon_np(string_kmers_np(s, k), k))
    if not kms:
        return CDBGraph([], k)
    allkm = np.unique(np.concatenate(kms))
    return build_graph_from_kmers(allkm, k)


def build_graph_from_reads(paths, k: int, min_count: int = 1):
    """Count reads, threshold, compact, simplify. Returns (graph, counter)."""
    from ..io.fastx import read_batches
    from ..kmer.count import KmerCounter

    counter = KmerCounter(k)
    for batch in read_batches(paths, k):
        counter.add_reads(batch)
    km, ct = counter.arrays()
    km = np.asarray(km, dtype=np.uint64)
    ct = np.asarray(ct)
    if min_count > 1:
        km = km[ct >= min_count]
    g = build_graph_from_kmers(km, k)
    g = simplify(g, k)
    return g, counter
