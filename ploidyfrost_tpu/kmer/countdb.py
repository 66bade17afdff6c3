"""Batched random-access k-mer count lookups (replaces KMC kmc_api).

The reference probes its on-disk KMC database one k-mer at a time:
CKmerAPI::from_string + CKMCFile::IsKmer/CheckKmer per k-mer of every
unitig and window string (src/CDBG.cpp:29-120, KMC/kmc_api/kmc_file.cpp).
Here the whole table is a sorted device array and probes are batched
`searchsorted` gathers — one device call covers every k-mer of every
branch of every bubble in an analysis phase.

Lookups are strand-symmetric: queries are canonicalized before the
search, which reproduces the reference's `IsKmer(km) ? km : reverse(km)`
dance (src/CDBG.cpp:38-42) for canonically-counted databases
(GetBothStrands() == true).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .count import SENTINEL, KmerCounter
from .pack import canonical_kmers, encode_bases, sequence_kmers


@functools.partial(jax.jit, static_argnums=(3,))
def _lookup(table_km, table_ct, queries, k):
    canon = canonical_kmers(queries, k)
    idx = jnp.searchsorted(table_km, canon)
    idx = jnp.clip(idx, 0, table_km.shape[0] - 1)
    hit = table_km[idx] == canon
    counts = jnp.where(hit, table_ct[idx], 0)
    return counts, hit


class KmerCountDB:
    """Sorted device-resident (k-mer -> count) table with batched probes."""

    def __init__(self, kmers: jnp.ndarray, counts: jnp.ndarray, k: int):
        self.k = k
        self._km = jnp.asarray(kmers, dtype=jnp.uint64)
        self._ct = jnp.asarray(counts, dtype=jnp.int64)

    @classmethod
    def from_counter(cls, counter: KmerCounter, min_count: int = 1):
        km, ct = counter.arrays()
        if min_count > 1:
            keep = ct >= min_count
            km = km[keep]
            ct = ct[keep]
        return cls(km, ct, counter.k)

    def __len__(self):
        return int(self._km.shape[0])

    def lookup(self, queries: jnp.ndarray):
        """counts, found  for a flat batch of packed (any-strand) k-mers."""
        q = jnp.asarray(queries, dtype=jnp.uint64).ravel()
        counts, hit = _lookup(self._km, self._ct, q, self.k)
        return np.asarray(counts), np.asarray(hit)

    def lookup_strings(self, strings: list[str]):
        """Per-string k-mer counts: returns list of int arrays, one per
        string, with the count of every k-mer window (replaces
        CDBG::readCov's per-window loop, src/CDBG.cpp:29-60)."""
        if not strings:
            return []
        spans = []
        all_kmers = []
        for s in strings:
            codes = jnp.asarray(encode_bases(s))[None, :]
            km, valid = sequence_kmers(codes, self.k)
            if not bool(valid.all()):
                raise ValueError(f"invalid base in query string {s!r}")
            spans.append(km.shape[-1])
            all_kmers.append(np.asarray(km[0]))
        flat = jnp.asarray(np.concatenate(all_kmers))
        counts, hit = self.lookup(flat)
        if not hit.all():
            missing = int(np.argmin(hit))
            raise KeyError(
                f"k-mer not found in count table (query #{missing})"
            )
        out = []
        off = 0
        for n in spans:
            out.append(counts[off : off + n])
            off += n
        return out
