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

    # ---- decode chains -> packed unitig codes, fully vectorized --------
    # twin chain's head is twin(tail); keep the decisive copy:
    # keep iff head <= twin(tail)
    head_nodes = order[starts]
    tail_nodes = order[ends - 1]
    keep = head_nodes <= (tail_nodes ^ 1)
    kstarts = starts[keep]
    kends = ends[keep]
    m = kends - kstarts  # nodes per kept chain
    nc = len(kstarts)
    if nc == 0:
        return CDBGraph([], k)
    lengths = k + m - 1  # unitig base length
    off_b = np.zeros(nc + 1, dtype=np.int64)
    np.cumsum(lengths, out=off_b[1:])
    codes = np.empty(int(off_b[-1]), dtype=np.uint8)
    # oriented value of every chain node (o==0: canonical form, o==1: rc)
    onodes = order  # all nodes in chain order
    oriented_all = np.where((onodes & 1) == 0, km[onodes >> 1], rc[onodes >> 1])
    # first k-mer of each kept chain -> k leading codes (MSB-first)
    firsts = oriented_all[kstarts]
    for t in range(k):
        codes[off_b[:-1] + t] = (
            (firsts >> np.uint64(2 * (k - 1 - t))) & np.uint64(3)
        ).astype(np.uint8)
    # every subsequent node contributes its last base
    if int(m.max()) > 1:
        chain_of = np.repeat(np.arange(nc), m)
        gpos = (
            np.arange(int(m.sum()), dtype=np.int64)
            - np.repeat(np.cumsum(m) - m, m)
        )  # position within chain
        # global chain-order index of each kept-chain node
        src = np.repeat(kstarts, m) + gpos
        non_first = gpos > 0
        tgt = off_b[chain_of[non_first]] + k + gpos[non_first] - 1
        codes[tgt] = (oriented_all[src[non_first]] & np.uint64(3)).astype(np.uint8)

    # ---- canonical form: min(seq, revcomp) per unitig, vectorized ------
    P = int(off_b[-1])
    seg = np.repeat(np.arange(nc), lengths)
    gstart = off_b[seg]
    gend = off_b[seg + 1]
    p = np.arange(P, dtype=np.int64)
    rc_codes = (3 - codes[gstart + gend - 1 - p]).astype(np.uint8)
    diff = codes != rc_codes
    dpos = np.where(diff, p, P)
    firstdiff = np.minimum.reduceat(dpos, off_b[:-1])
    fd = np.minimum(firstdiff, P - 1)
    take_rc = (firstdiff < P) & (rc_codes[fd] < codes[fd])
    codes = np.where(take_rc[seg], rc_codes, codes)

    from .seqstore import SeqStore

    store = SeqStore.from_codes(codes, lengths)
    # deterministic order: lexicographic over the decoded corpus
    strs = store.decode_all()
    perm = sorted(range(nc), key=strs.__getitem__)
    return CDBGraph(store.reorder(np.array(perm, dtype=np.int64)), k)


def simplify(g: CDBGraph, k: int) -> CDBGraph:
    """Bifrost `-i -d`: delete short isolated unitigs and clip short
    tips (< 2k bases), then recompact (CompactedDBG.tcc:745-770).
    Vectorized over the packed store (no per-unitig Python walks)."""
    lens = g.store.lengths
    deg_fw = g._out_deg[:, 1]
    deg_bw = g._out_deg[:, 0]
    drop = (lens < 2 * k) & ((deg_fw == 0) | (deg_bw == 0))
    if not drop.any():
        return g
    flat, nk = g.store.all_kmers(k)
    seg = np.repeat(np.arange(len(nk)), nk)
    kept = flat[~drop[seg]]
    if len(kept) == 0:
        return CDBGraph([], k)
    allkm = np.unique(_canon_np(kept, k))
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
