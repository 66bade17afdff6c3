"""Device-resident k-mer counting (replaces the KMC counter + database).

The reference pipeline shells out to `kmc -ci1 -cs10000 -k25`
(script/pipeline/2.kmc_db:12) to produce an on-disk database that is then
probed one k-mer at a time via prefix-LUT + binary search
(KMC/kmc_api/kmc_file.cpp). TPU-native replacement:

    reads -> 2-bit pack -> canonical k-mers -> instance buffer
          -> (rare) collapse: one big sort + run-length reduce + merge

Design, driven by measured v5e op costs (ns/element):
  * XLA sort is the fast primitive (~4 ns/elt/operand); 64-bit scatters
    (~140 ns/elt), segment_sum (~70 ns/elt) and searchsorted (~700
    ns/query) are 1-2 orders slower. So the counter NEVER scatters and
    NEVER probes: it appends raw canonical k-mer instances to a
    device-resident buffer (dynamic_update_slice, contiguous) and
    amortizes ALL reduction work into rare buffer-sized collapses.
  * keys travel as two uint32 operands (a k<=31 canonical k-mer is <=62
    bits) because multi-operand u32 sorts are ~2x cheaper than u64 on
    the VPU, and counts are int32 (KMC saturates at -cs10000 anyway, so
    per-collapse clamping reproduces the reference's saturation exactly:
    clamp(a)+clamp(b) re-clamped == clamp(a+b) whenever either side or
    the sum crosses the cap).
  * a collapse sorts the buffer (2-op sort), finds run starts, compacts
    them with a second (key,pos) sort — cheaper than any scatter — takes
    run lengths as position diffs, then merges with the resident unique
    table via one small 3-op sort (throughput: see bench.py / BENCH_r*).
  * capacity overflow is *detected* at collapse time (the true unique
    count is returned uncapped) and the host grows the table and replays
    the same buffer — never a silent drop.

Histograms are one device bincount at finalize; `cutoffL`/`cutoffU`
consume them unchanged (src/Main.cpp:200-277).

Multi-chip: shard the k-mer space by hash (see parallel/sharded.py);
each shard runs this same collapse locally after an all_to_all exchange,
histograms merge with psum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .pack import batch_kmers

# numpy (NOT jnp) scalars: module-level jnp constants are committed device
# arrays, and every jit lowering that closes over one fetches it back to
# host — a multi-second round trip through remote-device tunnels.
SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)
SENT32 = 0xFFFFFFFF
# KMC counter saturation: -cs10000 (script/pipeline/2.kmc_db:12). Counts are
# capped at this value both in the reference database and here.
DEFAULT_COUNTER_MAX = 10000

_I32_MAX = np.int32(0x7FFFFFFF)


@functools.partial(jax.jit, static_argnums=(1,))
def _extract(codes, k):
    """[B, L] uint8 codes -> (hi, lo) u32 canonical k-mer pairs, invalid
    windows replaced by the (SENT32, SENT32) sentinel pair, + valid count."""
    canon, valid = batch_kmers(codes, k)
    canon = canon.ravel()
    valid = valid.ravel()
    hi = jnp.where(valid, (canon >> jnp.uint64(32)).astype(jnp.uint32), SENT32)
    lo = jnp.where(valid, canon.astype(jnp.uint32), SENT32)
    return hi, lo, jnp.sum(valid, dtype=jnp.int64)


def _unpack_nibbles(packed):
    """[B, L/2] u8 (two 4-bit base codes per byte, low nibble first) ->
    [B, L] u8 codes. The inverse of the host-side _pack_nibbles: the
    tunnel to a remote TPU moves ~35 MB/s, so read batches travel at 2
    codes/byte and unpack on device (one cheap vector op)."""
    import jax.numpy as jnp

    B, H = packed.shape
    lo = packed & jnp.uint8(0x0F)
    hi = packed >> jnp.uint8(4)
    return jnp.stack([lo, hi], axis=-1).reshape(B, 2 * H)


def _pack_nibbles_host(codes: np.ndarray) -> np.ndarray:
    """[B, L] u8 codes (values <= 0xF) -> [B, L/2] u8, L even."""
    return (codes[:, 0::2] | (codes[:, 1::2] << 4)).astype(np.uint8)


def _pack_2bit_host(codes: np.ndarray) -> np.ndarray:
    """[B, L] u8 codes -> [B, ceil(L/4)] u8, 4 codes/byte LSB-first.
    Invalid markers are masked to 2 bits — validity travels separately
    as per-row lengths (see add_reads), NOT in the codes."""
    B, L = codes.shape
    pad = (-L) % 4
    if pad:
        codes = np.concatenate(
            [codes, np.zeros((B, pad), np.uint8)], axis=1
        )
    c = codes & 3
    return (
        c[:, 0::4]
        | (c[:, 1::4] << 2)
        | (c[:, 2::4] << 4)
        | (c[:, 3::4] << 6)
    ).astype(np.uint8)


def _unpack_2bit(packed, L):
    """[B, W] u8 (4 codes/byte) -> [B, L] u8 codes."""
    import jax.numpy as jnp

    B, W = packed.shape
    shifts = jnp.arange(4, dtype=jnp.uint8) * jnp.uint8(2)
    u = (packed[:, :, None] >> shifts[None, None, :]) & jnp.uint8(3)
    return u.reshape(B, 4 * W)[:, :L]


@functools.partial(jax.jit, static_argnums=(6, 7, 8), donate_argnums=(0, 1))
def _extract_append_2bit(bhi, blo, nvalid, packed2, lens, fill, k, L,
                         use_pallas=False):
    """_extract_append for the 2-bit transfer path: reads travel at 4
    codes/byte (half the nibble path's bytes — the tunnel is the
    counting bottleneck) plus a per-row valid-length vector; validity
    is reconstructed on device as (column < length) and re-marked with
    the 0xF invalid code the extraction kernels already understand.
    Only suffix-invalid rows qualify (add_reads checks; mid-read Ns
    fall back to the nibble path)."""
    codes = _unpack_2bit(packed2, L)
    col = jnp.arange(L, dtype=jnp.int32)
    codes = jnp.where(
        col[None, :] < lens[:, None], codes, jnp.uint8(0x0F)
    )
    if use_pallas:
        from .pallas_extract import kernel_call

        hi, lo = kernel_call(codes, k)
        hi = hi.ravel()
        lo = lo.ravel()
        nv = jnp.sum(hi != jnp.uint32(SENT32), dtype=jnp.int64)
    else:
        canon, valid = batch_kmers(codes, k)
        canon = canon.ravel()
        valid = valid.ravel()
        hi = jnp.where(
            valid, (canon >> jnp.uint64(32)).astype(jnp.uint32), SENT32
        )
        lo = jnp.where(valid, canon.astype(jnp.uint32), SENT32)
        nv = jnp.sum(valid, dtype=jnp.int64)
    bhi = jax.lax.dynamic_update_slice(bhi, hi, (fill,))
    blo = jax.lax.dynamic_update_slice(blo, lo, (fill,))
    return bhi, blo, nvalid + nv


@functools.partial(jax.jit, static_argnums=(5, 6), donate_argnums=(0, 1))
def _extract_append(bhi, blo, nvalid, codes, fill, k, packed=False):
    """Fused pack + canonicalize + buffer append: ONE dispatch per read
    batch (dispatch latency through remote-device tunnels is material).
    With packed=True, `codes` arrives nibble-packed (2 codes/byte) and
    unpacks on device first."""
    if packed:
        codes = _unpack_nibbles(codes)
    canon, valid = batch_kmers(codes, k)
    canon = canon.ravel()
    valid = valid.ravel()
    hi = jnp.where(valid, (canon >> jnp.uint64(32)).astype(jnp.uint32), SENT32)
    lo = jnp.where(valid, canon.astype(jnp.uint32), SENT32)
    bhi = jax.lax.dynamic_update_slice(bhi, hi, (fill,))
    blo = jax.lax.dynamic_update_slice(blo, lo, (fill,))
    return bhi, blo, nvalid + jnp.sum(valid, dtype=jnp.int64)


@functools.partial(jax.jit, static_argnums=(5, 6), donate_argnums=(0, 1))
def _extract_append_pallas(bhi, blo, nvalid, codes, fill, k, packed=False):
    """_extract_append with the fused Pallas extraction kernel
    (kmer/pallas_extract.py) supplying the (hi, lo) halves directly —
    no 64-bit emulation on the TPU VPU. Selected by _extract_backend."""
    from .pallas_extract import kernel_call

    if packed:
        codes = _unpack_nibbles(codes)
    hi, lo = kernel_call(codes, k)
    hi = hi.ravel()
    lo = lo.ravel()
    nv = jnp.sum(hi != jnp.uint32(SENT32), dtype=jnp.int64)
    bhi = jax.lax.dynamic_update_slice(bhi, hi, (fill,))
    blo = jax.lax.dynamic_update_slice(blo, lo, (fill,))
    return bhi, blo, nvalid + nv


def _extract_backend(codes_shape, k) -> bool:
    """True when the Pallas extraction kernel should run: real TPU
    backend, a kernel-supported (tile-divisible, VMEM-fitting) shape,
    and not disabled via PLOIDYFROST_NO_PALLAS."""
    import os

    if os.environ.get("PLOIDYFROST_NO_PALLAS"):
        return False
    from .pallas_extract import supported

    if not supported(codes_shape[0], codes_shape[1], k):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@jax.jit
def _split_u64(canon, valid):
    canon = canon.ravel()
    valid = valid.ravel()
    hi = jnp.where(valid, (canon >> jnp.uint64(32)).astype(jnp.uint32), SENT32)
    lo = jnp.where(valid, canon.astype(jnp.uint32), SENT32)
    return hi, lo, jnp.sum(valid, dtype=jnp.int64)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _append(bhi, blo, hi, lo, fill):
    bhi = jax.lax.dynamic_update_slice(bhi, hi, (fill,))
    blo = jax.lax.dynamic_update_slice(blo, lo, (fill,))
    return bhi, blo


@jax.jit
def _join_u64(hi, lo):
    return (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)


@jax.jit
def _delta_compress(hi, lo):
    """Sorted-key wire compression for arrays(): gaps between adjacent
    keys as uint32 (gaps[0] = 0), the count of gaps overflowing 32 bits
    (fetch decides the fallback), and the first key. Gap values are
    computed in u64; an overflowing gap makes nover > 0 and the caller
    refetches raw keys instead."""
    km = _join_u64(hi, lo)
    prev = jnp.concatenate([km[:1], km[:-1]])
    d = km - prev
    over = d > jnp.uint64(0xFFFFFFFF)
    d32 = d.astype(jnp.uint32)
    return d32, jnp.sum(over, dtype=jnp.int32), km[0]


def _collapse(thi, tlo, tct, bhi, blo, counter_max):
    """Collapse `bhi/blo` instance buffer into the unique table.

    Returns (hi, lo, ct, n_unique) where n_unique is the TRUE number of
    distinct keys (may exceed the table capacity => host must grow and
    replay). Sentinel keys (invalid k-mers / padding) sort last and are
    excluded. All reductions are sorts, cumsums and SHIFTS — no
    scatters and no large random gathers: both measure ~140 ns/element
    on v5e vs ~2 ns/element/operand for sort, so run compaction CARRIES
    values through a (key, values...) sort instead of gathering by
    compacted index (the gather formulation made a 64M-cap collapse
    ~20x slower than an 8M-cap one).
    """
    cap = thi.shape[0]
    nb = bhi.shape[0]

    # ---- run-length reduce the raw instance buffer --------------------
    h, l = jax.lax.sort((bhi, blo), num_keys=2)
    first = jnp.concatenate(
        [jnp.ones(1, bool), (h[1:] != h[:-1]) | (l[1:] != l[:-1])]
    )
    seg = jnp.cumsum(first, dtype=jnp.int32) - 1
    ar = jnp.arange(nb, dtype=jnp.int32)
    n_runs = seg[-1] + 1
    m = min(cap, nb)
    # compact run starts to the front, carrying (h, l, position) through
    # the sort; run length = next start position - own position (a shift)
    key = jnp.where(first, seg, _I32_MAX)
    _, hs, ls, ps = jax.lax.sort((key, h, l, ar), num_keys=1)
    r = jnp.arange(m, dtype=jnp.int32)
    in_range = r < n_runs
    nxt = jnp.where(
        r + 1 < n_runs, jnp.concatenate([ps[1:m], np.array([0], np.int32)]), nb
    )
    bcnt = jnp.where(in_range, nxt - ps[:m], 0).astype(jnp.int32)
    buhi = jnp.where(in_range, hs[:m], SENT32)
    bulo = jnp.where(in_range, ls[:m], SENT32)
    # the sentinel run (if present) is the last run: zero it out
    bcnt = jnp.where(buhi == SENT32, 0, bcnt)
    buf_uniq_overflowed = n_runs > m  # only matters if non-sentinel runs lost

    # ---- merge with the resident unique table -------------------------
    mh = jnp.concatenate([thi, buhi])
    ml = jnp.concatenate([tlo, bulo])
    mc = jnp.concatenate([tct, bcnt])
    mh, ml, mc = jax.lax.sort((mh, ml, mc), num_keys=2)
    n2 = mh.shape[0]
    f2 = jnp.concatenate(
        [jnp.ones(1, bool), (mh[1:] != mh[:-1]) | (ml[1:] != ml[:-1])]
    )
    seg2 = jnp.cumsum(f2, dtype=jnp.int32) - 1
    n_runs2 = seg2[-1] + 1
    # count of distinct keys, EXCLUDING the merged sentinel run
    sent_present = mh[-1] == SENT32
    n_uniq = n_runs2 - sent_present.astype(jnp.int32)
    # each merged run has AT MOST 2 contributors (the resident table and
    # the buffer-uniq list are each internally unique), so a run's total
    # at its START is mc[i] + (mc[i+1] if the next row continues the
    # run) — one shift, evaluated elementwise before compaction
    next_cont = jnp.concatenate([~f2[1:], np.array([False])])
    csum = mc + jnp.where(
        next_cont, jnp.concatenate([mc[1:], np.array([0], mc.dtype)]), 0
    )
    # compact run starts, carrying (mh, ml, csum) through the sort
    key2 = jnp.where(f2, seg2, _I32_MAX)
    _, mhs, mls, mcs = jax.lax.sort((key2, mh, ml, csum), num_keys=1)
    rr = jnp.arange(cap, dtype=jnp.int32)
    in2 = rr < n_uniq
    # KMC -cs saturation; also keeps cross-collapse sums in int32 range
    uct = jnp.where(in2, jnp.minimum(mcs[:cap], counter_max), 0).astype(
        jnp.int32
    )
    uhi = jnp.where(in2, mhs[:cap], SENT32)
    ulo = jnp.where(in2, mls[:cap], SENT32)
    n_uniq = n_uniq + jnp.where(buf_uniq_overflowed, cap + 1, 0)
    return uhi, ulo, uct, n_uniq


_collapse_jit = jax.jit(_collapse)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _histogram(ct, n_uniq, max_cov, counter_max):
    # n_uniq must be a device scalar (a Python int would bake into the
    # compiled program and recompile per value). Histogram = sort +
    # bin-edge search: ~20x faster than bincount's scatter-add on TPU.
    idx = jnp.arange(ct.shape[0], dtype=jnp.int32)
    c = jnp.clip(jnp.minimum(ct, counter_max), 0, max_cov)
    c = jnp.where(idx < n_uniq, c, 0).astype(jnp.int32)
    cs = jax.lax.sort(c)
    edges = jnp.searchsorted(cs, jnp.arange(max_cov + 2, dtype=jnp.int32))
    hist = (edges[1:] - edges[:-1]).astype(jnp.int64)
    return hist.at[0].set(0)


def _pow2(n: int, floor: int = 1) -> int:
    return 1 << max(n - 1, floor - 1, 0).bit_length()


def _pad_tier(n: int, floor: int) -> int:
    """Quarter-power-of-two tiers: the smallest {1, 1.25, 1.5, 1.75} x 2^j
    >= n. Bounds both compile count (4 tiers per octave) and sort padding
    waste (<25%)."""
    n = max(n, floor)
    p = 1 << (n - 1).bit_length()
    for num in (5, 6, 7):
        t = (p // 8) * num
        if t >= n:
            return t
    return p


class KmerCounter:
    """Streaming canonical k-mer counter with a device-resident table.

    add_reads/add_kmers append instances to the device buffer in O(n)
    contiguous writes with no host synchronization; all reduction work
    happens in rare whole-buffer collapses (see module docstring).
    """

    # pad tiers for partial-buffer collapses: bounded compile count
    _MIN_PAD = 1 << 18

    def __init__(
        self,
        k: int,
        counter_max: int = DEFAULT_COUNTER_MAX,
        initial_capacity: int = 1 << 20,
        buffer_capacity: int | None = None,
    ):
        if not 1 <= k <= 31:
            raise ValueError("k must be in [1, 31] for single-word packing")
        if buffer_capacity is None:
            # accelerators: a 32M-instance buffer (256 MB of device
            # memory) quarters the collapse count vs 8M — measured
            # 8.1 s -> 5.6 s on the bench5m ingest (each collapse costs
            # a host sync over the tunnel; fewer, bigger sorts win).
            # CPU (tests) keeps the smaller footprint.
            buffer_capacity = (
                8 << 20 if jax.default_backend() == "cpu" else 32 << 20
            )
        self.k = k
        self.counter_max = counter_max
        cap = _pow2(initial_capacity)
        self._cap = cap
        self._thi = jnp.full((cap,), SENT32, dtype=jnp.uint32)
        self._tlo = jnp.full((cap,), SENT32, dtype=jnp.uint32)
        self._tct = jnp.zeros((cap,), dtype=jnp.int32)
        self._buf_cap = _pow2(buffer_capacity, self._MIN_PAD)
        self._bhi = jnp.full((self._buf_cap,), SENT32, dtype=jnp.uint32)
        self._blo = jnp.full((self._buf_cap,), SENT32, dtype=jnp.uint32)
        self._fill = 0  # host-tracked; sentinel-padded beyond
        self._n_live = 0  # valid only when _fill == 0
        self._n_valid_dev = jnp.zeros((), dtype=jnp.int64)
        self._total_host = 0

    # -- properties ------------------------------------------------------

    @property
    def capacity(self) -> int:
        return self._cap

    @property
    def total_kmers(self) -> int:
        """Total (valid) k-mer instances processed. Syncs the device."""
        return self._total_host + int(self._n_valid_dev)

    @property
    def num_unique(self) -> int:
        self.flush()
        return self._n_live

    # -- ingestion -------------------------------------------------------

    def add_reads(self, codes: np.ndarray):
        """Count all canonical k-mers of a [B, L] uint8 code batch."""
        shape = codes.shape
        n = shape[0] * (shape[1] - self.k + 1)
        # host batches travel nibble-packed to remote accelerators:
        # the tunnel moves ~35 MB/s, so halving the bytes halves the
        # dominant ingest cost; unpacking is one device vector op
        packed = (
            isinstance(codes, np.ndarray)
            and shape[1] % 2 == 0
            and jax.default_backend() != "cpu"
        )
        if n > self._buf_cap:
            hi, lo, nv = _extract(jnp.asarray(codes), self.k)
            self._n_valid_dev = self._n_valid_dev + nv
            self._push(hi, lo)
            return
        if self._fill + n > self._buf_cap:
            self.flush()
        use_pallas = _extract_backend(shape, self.k)
        if packed:
            # 2-bit transfer (4 codes/byte, half the nibble bytes) when
            # every row's invalid codes form a suffix — then validity is
            # just a per-row length. Mid-read Ns (rare) take the nibble
            # path, which carries the invalid marker in-band.
            invalid = codes > 3
            if not (invalid[:, :-1] & ~invalid[:, 1:]).any():
                lens = (shape[1] - invalid.sum(axis=1)).astype(np.int32)
                self._bhi, self._blo, self._n_valid_dev = (
                    _extract_append_2bit(
                        self._bhi, self._blo, self._n_valid_dev,
                        jnp.asarray(_pack_2bit_host(codes)),
                        jnp.asarray(lens),
                        jnp.int32(self._fill), self.k, shape[1],
                        use_pallas,
                    )
                )
                self._fill += n
                return
        dev = jnp.asarray(_pack_nibbles_host(codes) if packed else codes)
        # fast path: fused pack+canon+append, one dispatch per batch;
        # on TPU the extraction inside is the Pallas kernel
        step = _extract_append_pallas if use_pallas else _extract_append
        self._bhi, self._blo, self._n_valid_dev = step(
            self._bhi, self._blo, self._n_valid_dev, dev,
            jnp.int32(self._fill), self.k, packed,
        )
        self._fill += n

    def add_kmers(self, canon, valid=None):
        canon = jnp.asarray(canon, dtype=jnp.uint64).ravel()
        if valid is None:
            valid = jnp.ones(canon.shape, bool)
        else:
            valid = jnp.asarray(valid).ravel()
        hi, lo, nv = _split_u64(canon, valid)
        self._n_valid_dev = self._n_valid_dev + nv
        self._push(hi, lo)

    def _push(self, hi, lo):
        n = int(hi.shape[0])
        if n > self._buf_cap:
            # single batch larger than the whole buffer: rare; chunk it
            for off in range(0, n, self._buf_cap):
                self._push(hi[off : off + self._buf_cap],
                           lo[off : off + self._buf_cap])
            return
        if self._fill + n > self._buf_cap:
            self.flush()
        self._bhi, self._blo = _append(
            self._bhi, self._blo, hi, lo, jnp.int32(self._fill)
        )
        self._fill += n

    # -- collapse --------------------------------------------------------

    def flush(self):
        """Collapse the instance buffer into the unique table."""
        if self._fill == 0:
            return
        pad = min(_pad_tier(self._fill, self._MIN_PAD), self._buf_cap)
        bhi = self._bhi[:pad] if pad < self._buf_cap else self._bhi
        blo = self._blo[:pad] if pad < self._buf_cap else self._blo
        while True:
            uhi, ulo, uct, n_uniq = _collapse_jit(
                self._thi, self._tlo, self._tct, bhi, blo,
                jnp.int32(self.counter_max),
            )
            n = int(n_uniq)  # the one host sync per collapse
            if n <= self._cap:
                self._thi, self._tlo, self._tct = uhi, ulo, uct
                self._n_live = n
                break
            # grow: true unique count exceeded capacity — replay buffer
            self._cap = _pow2(n + n // 8)
            grow = self._cap - self._thi.shape[0]
            self._thi = jnp.concatenate(
                [self._thi, jnp.full((grow,), SENT32, dtype=jnp.uint32)]
            )
            self._tlo = jnp.concatenate(
                [self._tlo, jnp.full((grow,), SENT32, dtype=jnp.uint32)]
            )
            self._tct = jnp.concatenate(
                [self._tct, jnp.zeros((grow,), dtype=jnp.int32)]
            )
        # reset the buffer (sentinel-fill so stale keys never resurface)
        self._bhi = jnp.full((self._buf_cap,), SENT32, dtype=jnp.uint32)
        self._blo = jnp.full((self._buf_cap,), SENT32, dtype=jnp.uint32)
        self._fill = 0
        self._total_host += int(self._n_valid_dev)
        self._n_valid_dev = jnp.zeros((), dtype=jnp.int64)

    # -- finalization / views ---------------------------------------------

    def arrays(self):
        """(sorted unique canonical k-mers u64, saturated counts int64)
        trimmed to live size, as HOST numpy arrays.

        Transfer compression (the tunnel moves ~25 MB/s D2H and the
        fetch dominated 50 Mbp finalization at 30 s): the SORTED keys
        travel as first-key + uint32 gaps (reconstructed by one host
        cumsum) when no gap overflows 32 bits — a scalar overflow-count
        fetch decides, falling back to raw u64 keys (gaps average
        2^(2k)/n, so real tables never fall back); counts travel as
        uint16 when counter_max fits (default cap 10000 does). Halves
        the finalize bytes vs the former u64+int32."""
        self.flush()
        n = self._n_live
        km_hi = self._thi[:n]
        km_lo = self._tlo[:n]
        if n > (1 << 16) and jax.default_backend() != "cpu":
            d32, nover, first = _delta_compress(km_hi, km_lo)
            if int(nover) == 0:
                gaps = np.asarray(d32).astype(np.uint64)
                km = np.empty(n, dtype=np.uint64)
                km[0] = np.uint64(int(first))
                np.cumsum(gaps[1:], out=km[1:])
                km[1:] += km[0]
            else:
                km = np.asarray(_join_u64(km_hi, km_lo))
        else:
            km = np.asarray(_join_u64(km_hi, km_lo))
        if self.counter_max < (1 << 16):
            ct = np.asarray(
                jnp.minimum(self._tct[:n], self.counter_max).astype(
                    jnp.uint16
                )
            )
        else:
            ct = np.asarray(
                jnp.minimum(self._tct[:n], self.counter_max).astype(
                    jnp.int32
                )
            )
        return km, ct.astype(np.int64)

    def histogram(self, max_cov: int | None = None) -> np.ndarray:
        """KMC-style histogram: hist[c] = number of distinct k-mers with
        (saturated) count c, for c in 1..max_cov. Index 0 unused.

        Matches `kmc_tools transform db histogram` consumed by cutoffL/H
        (script/pipeline/2.kmc_db:14, src/Main.cpp:200-277).
        """
        self.flush()
        if max_cov is None:
            max_cov = self.counter_max
        return np.asarray(
            _histogram(
                self._tct, jnp.int32(self._n_live), int(max_cov),
                self.counter_max,
            )
        )

    def write_histogram(self, path: str, max_cov: int = 10000):
        """Text histogram file: "<cov>\\t<count>" per line, cov = 1..max_cov."""
        hist = self.histogram(max_cov)
        with open(path, "w") as f:
            for cov in range(1, max_cov + 1):
                f.write(f"{cov}\t{int(hist[cov]) if cov < len(hist) else 0}\n")
