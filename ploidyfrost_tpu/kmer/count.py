"""Device-resident k-mer counting (replaces the KMC counter + database).

The reference pipeline shells out to `kmc -ci1 -cs10000 -k25`
(script/pipeline/2.kmc_db:12) to produce an on-disk database that is then
probed one k-mer at a time via prefix-LUT + binary search
(KMC/kmc_api/kmc_file.cpp). TPU-native replacement:

    reads -> 2-bit pack -> canonical k-mers -> sort -> segment-reduce

The count table lives in HBM as a sorted (kmers: uint64, counts: int64)
pair padded to a fixed power-of-two capacity with SENTINEL keys, so every
merge step has static shapes: one compiled program is reused for the
whole stream. Capacity overflow is *detected* on device and the host
doubles the table and replays the batch — never a silent drop.

Lookups (the CheckKmer replacement) are batched `searchsorted` gathers —
thousands of probes per device call instead of one binary search per
k-mer per call.

Multi-chip: shard the k-mer space by hash (see parallel/sharded.py);
each shard runs this same merge locally after an all_to_all exchange,
histograms merge with psum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .pack import batch_kmers

SENTINEL = jnp.uint64(0xFFFFFFFFFFFFFFFF)
# KMC counter saturation: -cs10000 (script/pipeline/2.kmc_db:12). Counts are
# capped at this value both in the reference database and here.
DEFAULT_COUNTER_MAX = 10000


@functools.partial(jax.jit, static_argnums=(4,), donate_argnums=(0, 1))
def _merge_batch(table_km, table_ct, canon, valid, capacity):
    """Merge a batch of canonical k-mers into the fixed-capacity table.

    table_km/table_ct: [capacity] sorted, SENTINEL-padded.
    canon/valid:       any shape, flattened.
    Returns (table_km, table_ct, n_live, overflow).
    """
    km_new = jnp.where(valid.ravel(), canon.ravel(), SENTINEL)
    ct_new = jnp.where(valid.ravel(), 1, 0).astype(jnp.int64)
    km = jnp.concatenate([table_km, km_new])
    ct = jnp.concatenate([table_ct, ct_new])
    order = jnp.argsort(km)
    km = km[order]
    ct = ct[order]
    first = jnp.concatenate([jnp.array([True]), km[1:] != km[:-1]])
    seg = jnp.cumsum(first) - 1
    out_ct = jax.ops.segment_sum(ct, seg, num_segments=capacity)
    out_km = jnp.full((capacity,), SENTINEL, dtype=jnp.uint64)
    out_km = out_km.at[seg].set(km, mode="drop")
    out_ct = jnp.where(out_km == SENTINEL, 0, out_ct)
    n_live = jnp.sum(out_km != SENTINEL)
    # overflow: some non-sentinel key landed at/after `capacity`
    overflow = jnp.any((seg >= capacity) & (km != SENTINEL))
    return out_km, out_ct, n_live, overflow


@functools.partial(jax.jit, static_argnums=(2,))
def _grow(km, ct, capacity):
    out_km = jnp.full((capacity,), SENTINEL, dtype=jnp.uint64)
    out_ct = jnp.zeros((capacity,), dtype=jnp.int64)
    n = min(capacity, km.shape[0])
    return out_km.at[:n].set(km[:n]), out_ct.at[:n].set(ct[:n])


@functools.partial(jax.jit, static_argnums=(2, 3))
def _histogram(km, ct, max_cov, counter_max):
    live = km != SENTINEL
    c = jnp.clip(jnp.minimum(ct, counter_max), 0, max_cov)
    c = jnp.where(live, c, 0).astype(jnp.int32)
    return jnp.bincount(c, length=max_cov + 1).at[0].set(0)


class KmerCounter:
    """Streaming canonical k-mer counter with a device-resident table."""

    def __init__(
        self,
        k: int,
        counter_max: int = DEFAULT_COUNTER_MAX,
        initial_capacity: int = 1 << 16,
    ):
        if not 1 <= k <= 31:
            raise ValueError("k must be in [1, 31] for single-word packing")
        self.k = k
        self.counter_max = counter_max
        cap = 1 << (initial_capacity - 1).bit_length()
        self._km = jnp.full((cap,), SENTINEL, dtype=jnp.uint64)
        self._ct = jnp.zeros((cap,), dtype=jnp.int64)
        self._n_live = 0
        self.total_kmers = 0  # total (valid) k-mer instances processed

    @property
    def capacity(self) -> int:
        return int(self._km.shape[0])

    # -- ingestion -----------------------------------------------------

    def add_reads(self, codes: np.ndarray):
        """Count all canonical k-mers of a [B, L] uint8 code batch."""
        canon, valid = batch_kmers(jnp.asarray(codes), self.k)
        self._ingest(canon, valid)

    def add_kmers(self, canon, valid=None):
        canon = jnp.asarray(canon, dtype=jnp.uint64).ravel()
        if valid is None:
            valid = jnp.ones(canon.shape, bool)
        else:
            valid = jnp.asarray(valid).ravel()
        self._ingest(canon, valid)

    def _ingest(self, canon, valid):
        batch_n = int(valid.sum())
        self.total_kmers += batch_n
        # grow BEFORE merging so the (donating) merge can never overflow:
        # worst case every batch k-mer is new, so live <= n_live + batch_n.
        need = self._n_live + batch_n
        if need > self.capacity:
            cap = self.capacity
            while cap < need:
                cap *= 2
            self._km, self._ct = _grow(self._km, self._ct, cap)
        km, ct, n_live, overflow = _merge_batch(
            self._km, self._ct, canon, valid, self.capacity
        )
        assert not bool(overflow), "unreachable: capacity pre-grown"
        self._km, self._ct, self._n_live = km, ct, int(n_live)

    # -- finalization / views -------------------------------------------

    @property
    def num_unique(self) -> int:
        return self._n_live

    def arrays(self):
        """(sorted unique canonical k-mers, counts) trimmed to live size."""
        n = self.num_unique
        ct = jnp.minimum(self._ct[:n], self.counter_max)
        return self._km[:n], ct

    def histogram(self, max_cov: int | None = None) -> np.ndarray:
        """KMC-style histogram: hist[c] = number of distinct k-mers with
        (saturated) count c, for c in 1..max_cov. Index 0 unused.

        Matches `kmc_tools transform db histogram` consumed by cutoffL/H
        (script/pipeline/2.kmc_db:14, src/Main.cpp:200-277).
        """
        if max_cov is None:
            max_cov = self.counter_max
        return np.asarray(
            _histogram(self._km, self._ct, int(max_cov), self.counter_max)
        )

    def write_histogram(self, path: str, max_cov: int = 10000):
        """Text histogram file: "<cov>\\t<count>" per line, cov = 1..max_cov."""
        hist = self.histogram(max_cov)
        with open(path, "w") as f:
            for cov in range(1, max_cov + 1):
                f.write(f"{cov}\t{int(hist[cov]) if cov < len(hist) else 0}\n")
