"""Device-batched superbubble search (TPU engine for src/CDBG.cpp:1707-2823).

The reference parallelizes superbubble extraction with N pthreads pulling
unitigs off a shared iterator (findSuperBubble_multithread_ptr,
src/CDBG.cpp:1707-1871) and serializes registration under a global mutex
(setNoBubble_multithread_ptr, src/CDBG.cpp:847-1100). The TPU-native
replacement exploits a structural fact of the algorithm:

    extractSuperBubble's DFS (src/CDBG.cpp:2643-2823) reads ONLY the
    graph adjacency — never the shared MyUnitig state. State is touched
    exclusively at registration time.

So the search phase is embarrassingly parallel over seeds: every
(unitig, strand) with out-degree > 1 runs its bounded DFS simultaneously
as one vmapped `lax.while_loop` over CSR successor arrays, with per-seed
fixed-shape state (seen-set, strand map, explicit stack) living in
device registers/VMEM. The host then *replays* the recorded outcomes in
canonical seed order (unitig id asc, plus before minus — the reference's
deterministic single-thread order, src/CDBG.cpp:178-252), skipping seeds
whose entrance pointer was already claimed by an earlier registration.
This is exactly equivalent to the sequential algorithm, because a seed's
search result cannot depend on earlier registrations — only its
*admission* can.

Seeds whose region exceeds the fixed caps (seen-set > MAX_SEEN, stack >
MAX_STACK, or step budget) are flagged and fall back to the exact host
search (bubble/superbubble.py) — they are tangles that nearly always
resolve to "no bubble" and are rare on real graphs.

Per-seed device state (MAX_SEEN slots):
    seen  int32  packed (idx<<1 | strand) handle at FIRST sighting — the
                 vec_km_seen entry (src/CDBG.cpp:2680, 2717)
    st    int32  0 = not in state_map, 2 = seen, 1 = visited
    sm    int32  strand_map value (updated on pop and on first sighting,
                 src/CDBG.cpp:2698-2699, 2719)
    cyc   bool   member of cycle_set (src/CDBG.cpp:2704-2712, 2722-2736)
    stack int32  explicit vertices_visit stack (may hold duplicates,
                 matching the reference's std::stack behavior)
"""

from __future__ import annotations

import functools

import numpy as np

from ..graph.cdbg import CDBGraph, UnitigHandle
from .superbubble import (
    NULL,
    BubbleState,
    extract_superbubble,
    list_bubbles,
)

MAX_SEEN = 32
MAX_STACK = 48
MAX_STEPS = 4 * MAX_STACK
CHUNK = 1 << 14
MAX_CHUNK = 1 << 17  # accelerator single-dispatch cap (~80 MB of state)

# outcome codes recorded per seed
STAT_NONE = 0  # stack drained, no cycle: no state change at all
STAT_STALL_CYCLE = 1  # stack drained with flag_cycle: cycle-set cleanup
STAT_CYCLE_EXIT = 2  # closed but exit loops back to seed: setNoBubble cycle
STAT_ABORT = 3  # closed with tip/cycle flag: setNoBubble all
STAT_BUBBLE = 4  # closed clean: real bubble registration
STAT_OVERFLOW = 5  # caps exceeded: host fallback


@functools.lru_cache(maxsize=8)
def _build_search(ms: int, mstk: int, max_steps: int):
    """Jitted single-device entry for the vmapped search."""
    import jax

    return jax.jit(_search_batched(ms, mstk, max_steps))


@functools.lru_cache(maxsize=8)
def _search_batched(ms: int, mstk: int, max_steps: int):
    """Build the vmapped bounded-DFS search for given caps (unjitted —
    parallel/sharded.py shard_maps this same callable over a device
    mesh for the multi-chip search; seeds are embarrassingly parallel).

    The per-seed state updates are expressed entirely as one-hot
    where-masks over the fixed-size slot arrays — NO scatter ops. Under
    vmap a scatter with computed indices lowers to an XLA scatter with
    batch dims, which is both slow to compile (the round-2 kernel, which
    carried ~10 of them per successor step, never finished compiling on
    the TPU backend in 21 minutes) and slow to run; an [MS]-wide masked
    select is a single fused elementwise op on the VPU. The 4x4 unrolled
    predecessor probes of the round-2 kernel are likewise collapsed into
    one [4, MS] vectorized compare."""
    import jax
    import jax.numpy as jnp

    from ..util.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    if ms > 32:
        # the cycle-set travels as a uint32 bitmask (kernel return)
        raise ValueError(f"MAX_SEEN caps at 32 (uint32 cyc mask), got {ms}")
    MS, MSTK = ms, mstk

    def search_one(seed, succ_node):
        """One seed's extractSuperBubble search. seed: packed int32 node.

        succ_node: [n, 2, 4] int32 packed successors (-1 = none).
        """
        iota = jnp.arange(MS, dtype=jnp.int32)
        istk = jnp.arange(MSTK, dtype=jnp.int32)
        seen0 = jnp.where(iota == 0, seed, jnp.int32(-1))
        st0 = jnp.zeros((MS,), jnp.int32)
        sm0 = jnp.zeros((MS,), jnp.int32)
        cyc0 = jnp.zeros((MS,), bool)
        stack0 = jnp.where(istk == 0, seed, jnp.int32(0))

        def cond(c):
            (_, _, _, _, _, sp, _, _, _, ovf, done, _, _, steps) = c
            return (sp > 0) & ~done & ~ovf & (steps < max_steps)

        def body(c):
            (seen, st, sm, cyc, stack, sp, nseen, fcyc, ftip, ovf, done,
             status, psec, steps) = c
            # -- pop v, mark visited, refresh strand_map (CDBG.cpp:2697-2699)
            sp = sp - 1
            v = jnp.sum(jnp.where(istk == sp, stack, 0), dtype=jnp.int32)
            vidx = v >> 1
            hit_v = (seen >> 1) == vidx  # one-hot: idx values in seen unique
            st = jnp.where(hit_v, 1, st)
            sm = jnp.where(hit_v, v & 1, sm)
            succs = succ_node[vidx, v & 1]
            ftip = ftip | jnp.all(succs < 0)  # tip (CDBG.cpp:2701-2703)

            def succ_body(b, carry):
                seen, st, sm, cyc, stack, sp, nseen, fcyc, ovf = carry
                u = succs[b]
                valid = u >= 0
                hv = (seen >> 1) == vidx  # v's slot (stable across appends)
                # successor is the seed itself: cycle (CDBG.cpp:2705-2712)
                hit_seed = valid & (u == seed)
                fcyc = fcyc | hit_seed
                cyc = cyc | (hit_seed & ((iota == 0) | hv))
                go = valid & ~hit_seed
                uidx = u >> 1
                ustr = u & 1
                hit_u = (seen >> 1) == uidx
                found = jnp.any(hit_u)
                visited = jnp.any(hit_u & (st == 1))
                # already-visited successor: cycle (CDBG.cpp:2730-2736)
                dv = go & visited
                fcyc = fcyc | dv
                cyc = cyc | (dv & (hit_u | hv))
                # not-yet-visited successor (CDBG.cpp:2714-2729)
                doc = go & ~visited
                app = doc & ~found
                ovf = ovf | (app & (nseen >= MS))
                wmask = app & (iota == jnp.minimum(nseen, MS - 1))
                # strand mismatch check BEFORE any overwrite (found case)
                sm_u = jnp.sum(jnp.where(hit_u, sm, 0), dtype=jnp.int32)
                mism = doc & found & (sm_u != ustr)
                fcyc = fcyc | mism
                cyc = cyc | (mism & (hit_u | hv))
                seen = jnp.where(wmask, u, seen)
                sm = jnp.where(wmask, ustr, sm)
                hit_u2 = hit_u | wmask  # u's slot after a potential append
                nseen = nseen + app.astype(jnp.int32)
                st = jnp.where(doc & hit_u2, 2, st)
                # all-predecessors-visited gate (CDBG.cpp:2740-2759),
                # all 4 candidate predecessors probed at once
                preds_w = succ_node[uidx, 1 - ustr]  # [4] twin-successors
                act = doc & (preds_w >= 0)
                pred = preds_w ^ 1  # twin -> predecessor handle
                hits_p = (seen[None, :] >> 1) == (pred[:, None] >> 1)
                pfound = jnp.any(hits_p, axis=1)
                st_p = jnp.sum(jnp.where(hits_p, st[None, :], 0), axis=1, dtype=jnp.int32)
                sm_p = jnp.sum(jnp.where(hits_p, sm[None, :], 0), axis=1, dtype=jnp.int32)
                pin = pfound & (st_p != 0)  # "in state_map"
                allv = doc & jnp.all(~act | (pin & (st_p == 1)))
                pmism = act & pin & (sm_p != (pred & 1))
                fcyc = fcyc | jnp.any(pmism)
                cyc = (
                    cyc
                    | (jnp.any(pmism) & hit_u2)
                    | jnp.any(pmism[:, None] & hits_p, axis=0)
                )
                push = doc & allv
                ovf = ovf | (push & (sp >= MSTK))
                stkmask = push & (istk == jnp.minimum(sp, MSTK - 1))
                stack = jnp.where(stkmask, u, stack)
                sp = sp + push.astype(jnp.int32)
                return (seen, st, sm, cyc, stack, sp, nseen, fcyc, ovf)

            (seen, st, sm, cyc, stack, sp, nseen, fcyc, ovf) = jax.lax.fori_loop(
                0, 4, succ_body,
                (seen, st, sm, cyc, stack, sp, nseen, fcyc, ovf),
            )

            # -- closing check (CDBG.cpp:2763-2778)
            top = stack[0]
            others = (st == 2) & (seen != top) & (iota < nseen)
            close = (sp == 1) & ~jnp.any(others) & ~ovf
            exit_succs = succ_node[top >> 1, top & 1]
            cyc_exit = jnp.any(exit_succs == seed)
            stat = jnp.where(
                cyc_exit,
                STAT_CYCLE_EXIT,
                jnp.where(fcyc | ftip, STAT_ABORT, STAT_BUBBLE),
            )
            status = jnp.where(close, stat, status)
            psec = jnp.where(close, top, psec)
            done = done | close
            return (seen, st, sm, cyc, stack, sp, nseen, fcyc, ftip, ovf,
                    done, status, psec, steps + 1)

        init = (seen0, st0, sm0, cyc0, stack0, jnp.int32(1), jnp.int32(1),
                jnp.array(False), jnp.array(False), jnp.array(False),
                jnp.array(False), jnp.int32(STAT_NONE), jnp.int32(-1),
                jnp.int32(0))
        (seen, st, sm, cyc, stack, sp, nseen, fcyc, ftip, ovf, done,
         status, psec, steps) = jax.lax.while_loop(cond, body, init)
        # stack drained without closing: STAT_NONE / STAT_STALL_CYCLE
        # (CDBG.cpp:2813-2822); caps exceeded: host fallback
        ovf = ovf | (~done & (sp > 0))
        status = jnp.where(
            ovf,
            STAT_OVERFLOW,
            jnp.where(done, status,
                      jnp.where(fcyc, STAT_STALL_CYCLE, STAT_NONE)),
        )
        # cycle-set as a bitmask: 64x less device->host traffic than the
        # [MS] bool array (the tunnel D2H link is the warm-path bottleneck)
        cyc_mask = jnp.sum(
            jnp.where(cyc, jnp.uint32(1) << iota.astype(jnp.uint32),
                      jnp.uint32(0)),
            dtype=jnp.uint32,
        )
        return status.astype(jnp.uint8), psec, nseen.astype(jnp.uint8), \
            seen, cyc_mask

    return jax.vmap(search_one, in_axes=(0, None))


def search_seeds(g: CDBGraph, seeds: np.ndarray, mesh=None):
    """Run the device search for every packed seed. Returns host numpy
    (status u8, psec i32, nseen u8, seen[<=MS] i32, cyc-bitmask u32)
    arrays in seed order; `seen` is column-trimmed to the batch's max
    live slot count.

    With `mesh` (a jax.sharding.Mesh with axes data x shard), seeds
    split over every device via the shard_mapped search
    (parallel/sharded.build_sharded_search_step) — the multi-chip
    analog of the reference's pthread pool (src/CDBG.cpp:1726-1777)."""
    import jax.numpy as jnp

    # pad the CSR successor array to a tiered unitig count: the search
    # program's shapes then depend only on the tier, so the (expensive,
    # remote-compiled) kernel is reused across graphs instead of
    # recompiling for every graph size. On accelerators the minimum tier
    # is 2^20 rows (32 MB) stepping 4x — ONE compiled program covers all
    # graphs below a million unitigs; CPU (tests) uses fine pow2 tiers.
    # Pad rows are all -1 (no successors) and are never reached.
    import jax

    n = g._succ.shape[0]
    if jax.default_backend() != "cpu":
        cap = 1 << 17
        while cap < n:
            cap <<= 2
    else:
        cap = 1 << max(n - 1, 1).bit_length()
    succ_padded = np.full((cap, 2, 4), -1, dtype=np.int32)
    succ_padded[:n] = g._succ
    succ_node = None if jax.process_count() > 1 else jnp.asarray(succ_padded)
    if mesh is not None:
        from ..parallel.sharded import build_sharded_search_step

        multi = jax.process_count() > 1
        fn = build_sharded_search_step(mesh, gather=multi)
        n_dev = int(np.prod(list(mesh.shape.values())))
        per = -(-len(seeds) // n_dev)
        per = 1 << max(per - 1, 0).bit_length()  # pow2: bounded compiles
        total = per * n_dev
        chunk = seeds.astype(np.int32)
        if total > len(chunk):
            chunk = np.concatenate(
                [chunk, np.full(total - len(chunk), chunk[-1], np.int32)]
            )
        if multi:
            # multi-HOST: every process holds the full seed list (all
            # loaded the same graph); build the global sharded input
            # from this process's contiguous slice, and replicate the
            # successor table. Outputs come back fully replicated
            # (all_gathered inside the step), so the host replay runs
            # identically on every process.
            from jax.sharding import NamedSharding, PartitionSpec

            nproc = jax.process_count()
            pid = jax.process_index()
            local = total // nproc
            s_seed = NamedSharding(mesh, PartitionSpec(("data", "shard")))
            s_rep = NamedSharding(mesh, PartitionSpec(None, None, None))
            chunk_g = jax.make_array_from_process_local_data(
                s_seed,
                np.ascontiguousarray(
                    chunk[pid * local : (pid + 1) * local]
                ),
                global_shape=(total,),
            )
            succ_g = jax.make_array_from_process_local_data(
                s_rep, succ_padded, global_shape=succ_padded.shape
            )
            res = fn(chunk_g, succ_g)
        else:
            res = fn(jnp.asarray(chunk), succ_node)
        nseen = np.asarray(res[2])[: len(seeds)]
        mx = max(1, int(nseen.max()))
        return [
            np.asarray(res[0])[: len(seeds)],
            np.asarray(res[1])[: len(seeds)],
            nseen,
            np.asarray(res[3][:, :mx])[: len(seeds)],
            np.asarray(res[4])[: len(seeds)],
        ]
    fn = _build_search(MAX_SEEN, MAX_STACK, MAX_STEPS)
    # chunk width: on accelerators ONE wide chunk (the vmapped
    # while_loop runs until its slowest lane finishes, so fewer chunks
    # = fewer straggler waits and fewer transfer round-trips over the
    # tunnel); on CPU (tests) small power-of-two tiers keep tiny
    # graphs fast.
    if jax.default_backend() == "cpu":
        chunk_w = 1 << max(min(len(seeds), CHUNK) - 1, 1).bit_length()
    else:
        chunk_w = CHUNK
        while chunk_w < min(len(seeds), MAX_CHUNK):
            chunk_w <<= 1
    # dispatch every chunk asynchronously, then fetch: the JAX dispatch
    # queue overlaps device execution with the (slow, tunneled) D2H
    # transfers. `seen` is fetched only up to the maximum live slot
    # count across the batch — typically ~8 of MAX_SEEN=32 columns —
    # and `cyc` travels as a uint32 bitmask (see kernel return).
    outs_dev = []
    pads = []
    for off in range(0, len(seeds), chunk_w):
        chunk = seeds[off : off + chunk_w]
        pad = chunk_w - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.full(pad, chunk[-1], np.int32)])
        outs_dev.append(fn(jnp.asarray(chunk, dtype=jnp.int32), succ_node))
        pads.append(pad)
    nseen = [np.asarray(r[2]) for r in outs_dev]
    mx = max(1, max(int(c.max()) for c in nseen))
    outs = []
    for res, pad, ns in zip(outs_dev, pads, nseen):
        got = [
            np.asarray(res[0]),
            np.asarray(res[1]),
            ns,
            np.asarray(res[3][:, :mx]),
            np.asarray(res[4]),
        ]
        if pad:
            got = [r[: len(r) - pad] for r in got]
        outs.append(got)
    return [np.concatenate([o[i] for o in outs]) for i in range(5)]


def _replay_fast(
    g: CDBGraph,
    state: BubbleState,
    seed_list,
    status,
    psec,
    nseen,
    seen,
    cyc,
    complex_size: int,
    colors=None,
):
    """Replay of the recorded search outcomes, in flat-int form:
    identical state transitions to the UnitigHandle-based loop
    (see _register_bubble / _set_no_bubble_* in superbubble.py, which
    mirror src/CDBG.cpp:552-846) but ~100x faster — plain Python ints
    over list-backed state, no handle objects, no method dispatch.
    tests/test_batched.py cross-validates both paths on random graphs.

    With `colors`, the colored registration gates
    (src/CCDBG.cpp:1450-1812 via superbubble._register_bubble) run on
    three precomputed arrays (ColorMatrix.gate_arrays) — per-unitig
    color-pair counts, full-unitig membership masks, and k-mer counts —
    instead of per-bubble ColorMatrix row slicing."""
    n = len(state.flags)
    if colors is not None:
        csizes, ccontains, cnkm = colors.gate_arrays()
        csizes_l = csizes.tolist()
        cnkm_l = cnkm.tolist()
        C = colors.n_colors
    flags = state.flags.tolist()
    plus = state.plus.tolist()
    minus = state.minus.tolist()
    # flat lists (index arithmetic) — building [n][2][4] nested lists
    # costs more than the whole replay loop at 100k+ unitigs
    succ = np.asarray(g._succ).reshape(-1).tolist()  # [n*8] (idx*2+strand)
    out_deg = np.asarray(g._out_deg).reshape(-1).tolist()  # [n*2]
    seeds_l = seed_list.tolist()
    status_l = status.tolist()
    psec_l = psec.tolist()
    nseen_l = nseen.tolist()
    seen_l = seen.tolist()
    cyc_l = cyc.tolist()
    NULLV = NULL

    def set_plus_self(x):
        plus[x] = x
        flags[x] &= 0xFE

    def set_minus_self(x):
        minus[x] = x
        flags[x] &= 0xFD

    def detach_and_self(x):
        ex = plus[x]
        if ex != NULLV and ex != x:
            if plus[ex] == x:
                set_plus_self(ex)
            else:
                set_minus_self(ex)
        set_plus_self(x)
        ex = minus[x]
        if ex != NULLV and ex != x:
            if plus[ex] == x:
                set_plus_self(ex)
            else:
                set_minus_self(ex)
        set_minus_self(x)

    def detach_endpoint(x, use_plus):
        # the endpoint detach block of _set_no_bubble_all
        # (src/CDBG.cpp:603-650): no ex != x guard, matching the ref
        ex = plus[x] if use_plus else minus[x]
        if ex != NULLV:
            if plus[ex] == x:
                set_plus_self(ex)
            else:
                set_minus_self(ex)
        if use_plus:
            set_plus_self(x)
        else:
            set_minus_self(x)

    for si in range(len(seeds_l)):
        sp = seeds_l[si]
        i = sp >> 1
        strand = sp & 1
        if (plus[i] if strand else minus[i]) != NULLV:
            continue  # claimed by an earlier registration
        stt = status_l[si]
        if stt == STAT_NONE:
            continue
        if stt == STAT_OVERFLOW:
            # host fallback: run the exact search on a VIEW over the
            # replay's own flat lists — BubbleState's ops are all
            # per-element, so plain lists satisfy the same API and the
            # former per-seed whole-array sync (O(n) both ways PER
            # overflow seed: quadratic at 1M+ unitigs, the round-4
            # 50 Mbp wall) disappears
            lview = BubbleState.__new__(BubbleState)
            lview.flags = flags
            lview.plus = plus
            lview.minus = minus
            extract_superbubble(
                g, lview, UnitigHandle(g, i, bool(strand)), complex_size,
                colors,
            )
            continue
        ns = nseen_l[si]
        row = seen_l[si]
        if stt == STAT_STALL_CYCLE:
            cmask = cyc_l[si]
            for slot in range(ns):
                if (cmask >> slot) & 1:
                    x = row[slot] >> 1
                    detach_and_self(x)
                    flags[x] |= 0x04
            if strand:
                set_plus_self(i)
            else:
                set_minus_self(i)
            continue
        pj = psec_l[si]
        j = pj >> 1
        jstrand = pj & 1
        if stt == STAT_CYCLE_EXIT:
            # _set_no_bubble_cycle (src/CDBG.cpp:552-602)
            for slot in range(ns):
                x = row[slot] >> 1
                detach_and_self(x)
                flags[x] |= 0x04
            if strand:
                set_plus_self(i)
            else:
                set_minus_self(i)
            if not jstrand:
                set_plus_self(j)
            else:
                set_minus_self(j)
        elif stt == STAT_ABORT:
            # _set_no_bubble_all (src/CDBG.cpp:603-699)
            detach_endpoint(i, bool(strand))
            detach_endpoint(j, not jstrand)
            for slot in range(ns):
                p = row[slot]
                if p == sp or p == pj:
                    continue
                x = p >> 1
                detach_and_self(x)
                flags[x] |= 0x04
        else:  # STAT_BUBBLE: _register_bubble (src/CDBG.cpp:700-846)
            if ns < 4:
                continue
            if (flags[j] | flags[i]) & 0x04:
                for slot in range(ns):
                    p = row[slot]
                    if p == sp:
                        if strand:
                            set_plus_self(i)
                        else:
                            set_minus_self(i)
                        continue
                    if p == pj:
                        # inverted strand handling vs the cycle variant
                        if jstrand:
                            set_minus_self(j)
                        else:
                            set_plus_self(j)
                        continue
                    x = p >> 1
                    detach_and_self(x)
                    flags[x] |= 0x04
                continue
            if ns <= 6:
                strict = True
                for slot in range(ns):
                    p = row[slot]
                    if p == sp or p == pj:
                        continue
                    x = p >> 1
                    xs = p & 1
                    # exactly one predecessor == entrance unitig and one
                    # successor == exit unitig (src/CDBG.cpp:1019-1041);
                    # in-degree(x, s) == out-degree(x, !s), pred idx =
                    # the single twin-successor's idx
                    if (
                        out_deg[x * 2 + 1 - xs] != 1
                        or out_deg[x * 2 + xs] != 1
                    ):
                        strict = False
                        break
                    base = x * 8 + (1 - xs) * 4
                    pk = succ[base]
                    if pk < 0:
                        pk = succ[base + 1]
                        if pk < 0:
                            pk = succ[base + 2]
                            if pk < 0:
                                pk = succ[base + 3]
                    if pk >> 1 != i:
                        strict = False
                        break
                    base = x * 8 + xs * 4
                    sk = succ[base]
                    if sk < 0:
                        sk = succ[base + 1]
                        if sk < 0:
                            sk = succ[base + 2]
                            if sk < 0:
                                sk = succ[base + 3]
                    if sk >> 1 != j:
                        strict = False
                        break
                if strict:
                    flags[i] |= 0x10 if strand else 0x08
                    flags[j] |= 0x08 if jstrand else 0x10
            if ns > complex_size:
                flags[i] |= 0x40 if strand else 0x20
                flags[j] |= 0x20 if jstrand else 0x40
            for slot in range(ns):
                p = row[slot]
                if p == sp or p == pj:
                    continue
                x = p >> 1
                detach_and_self(x)
                flags[x] |= 0x04
            if colors is not None:
                # colored registration gates (the flat form of
                # superbubble._register_bubble's colors block, matching
                # src/CCDBG.cpp uniform-color + successor-coverage rules)
                def endpoints_self():
                    if strand:
                        set_plus_self(i)
                    else:
                        set_minus_self(i)
                    if not jstrand:
                        set_plus_self(j)
                    else:
                        set_minus_self(j)

                f = True
                if csizes_l[i] != cnkm_l[i] * C:
                    f = False
                    flags[i] |= 0x04
                    endpoints_self()
                if colors.size_as_flat(j, cnkm_l[i]) != cnkm_l[j] * C:
                    f = False
                    flags[j] |= 0x04
                    endpoints_self()
                if f:
                    all_mask = np.ones(C, dtype=bool)
                    required = {i: all_mask, j: all_mask}
                    for slot in range(ns):
                        p = row[slot]
                        if p == pj:
                            continue
                        x = p >> 1
                        xs = p & 1
                        req = required.get(x)
                        if req is None:
                            req = ccontains[x]
                            required[x] = req
                        suc_any = np.zeros(C, dtype=bool)
                        base = x * 8 + xs * 4
                        for b in range(4):
                            sk = succ[base + b]
                            if sk >= 0:
                                suc_any |= ccontains[sk >> 1]
                        if (req & ~suc_any).any():
                            f = False
                            break
                    if not f:
                        endpoints_self()
                if not f:
                    continue
            if strand:
                plus[i] = j
                flags[i] |= 0x01
            else:
                minus[i] = j
                flags[i] |= 0x02
            if jstrand:
                minus[j] = i
                flags[j] |= 0x02
            else:
                plus[j] = i
                flags[j] |= 0x01

    state.flags = np.array(flags, dtype=np.uint8)
    state.plus = np.array(plus, dtype=np.int64)
    state.minus = np.array(minus, dtype=np.int64)


def find_superbubbles_device(
    g: CDBGraph, complex_size: int = 8, colors=None, mesh=None
) -> tuple[BubbleState, list]:
    """Drop-in replacement for superbubble.find_superbubbles: device
    search + host replay. Byte-identical outputs (tests/test_batched.py
    cross-validates against the sequential path on random graphs)."""
    n = len(g)
    state = BubbleState(n)
    # seeds in canonical order: unitig id asc, plus before minus
    # (src/CDBG.cpp:178-252)
    deg = np.asarray(g._out_deg)  # [n, 2], columns (minus, plus)
    plus_b = deg[:, 1] > 1
    minus_b = deg[:, 0] > 1
    idx = np.arange(n, dtype=np.int32)
    seed_list = np.empty(int(plus_b.sum() + minus_b.sum()), dtype=np.int32)
    # interleave in (i, plus), (i, minus) order
    order = np.lexsort((1 - np.concatenate([np.ones(plus_b.sum(), np.int8),
                                            np.zeros(minus_b.sum(), np.int8)]),
                        np.concatenate([idx[plus_b], idx[minus_b]])))
    packed = np.concatenate([idx[plus_b] * 2 + 1, idx[minus_b] * 2])
    seed_list = packed[order].astype(np.int32)
    if len(seed_list) == 0:
        return state, []

    status, psec, nseen, seen, cyc = search_seeds(g, seed_list, mesh)

    # flat-int replay: same transitions, no handle objects; the colored
    # registration gates run on precomputed ColorMatrix arrays
    _replay_fast(
        g, state, seed_list, status, psec, nseen, seen, cyc, complex_size,
        colors,
    )
    return state, list_bubbles(state, n, colors)
