"""Pallas TPU kernel: fused canonical k-mer extraction.

Replaces the jnp chain pack.batch_kmers + u64 split (count._extract) on
the counting hot path. The roles match bifrost/src/Kmer.hpp:4-120
(2-bit pack + twin/rep canonicalization) and RepHash.hpp:49-90 (the
per-window rolling scan) — but as ONE VPU kernel that never touches a
64-bit integer:

  * TPU has no native u64; XLA emulates each u64 op as multiple u32
    ops. This kernel builds the k-mer's (hi, lo) u32 halves directly —
    each base's 2-bit contribution lands in a statically-known word at
    a statically-known shift (k <= 31 so a contribution never straddles
    the word boundary).
  * The reverse complement is accumulated in the same unrolled loop
    (complement code = 3 - c, placed at the mirrored position) instead
    of the 12-op bit-reversal network revcomp_kmers runs afterwards.
  * Validity (window contains a non-ACGT code) is an unrolled OR —
    no cumsum pass.
  * Canonical = min(fwd, rc) compared as (hi, lo) pairs, then invalid
    lanes are overwritten with the 0xFFFFFFFF sentinel pair that the
    sort-collapse counting table expects (count.py SENTINEL).

Layout: the kernel runs TRANSPOSED — reads positions along SUBLANES
([L, B_tile] blocks, batch along lanes) and slides the k-window with
sublane slices. The natural [B, L] orientation (window sliding along
lanes) miscompiles on the current Mosaic toolchain once L spans more
than one vector register: lane-offset slice + OR-accumulate chains
produce wrong bits (verified by a minimal repro; sublane slides are
correct at every tested shape). The two XLA transposes at the boundary
are cheap compared to the u64 emulation the kernel removes.

Production dispatch lives in count.KmerCounter.add_reads: on the TPU
backend (and tile-compatible batch shapes) the counter's fused
extract+append step runs this kernel; other backends use the jnp u64
path. The unit tests additionally run the kernel in interpreter mode
on CPU for parity, and tests/test_pallas_extract.py has a real-backend
parity test that runs when the session's backend is a TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SENT32 = np.uint32(0xFFFFFFFF)


# measured VMEM footprint ~80 bytes per (lane, position) cell at k=25
# (c32 + 4 accumulators + bad + double-buffered outputs); the scoped
# VMEM limit is 16 MB — budget 12 MB to leave headroom
_VMEM_BYTES_PER_CELL = 80
_VMEM_BUDGET = 12_000_000


def _lane_tile(B: int, L: int) -> int | None:
    """Batch tile along the 128-wide lane dimension, or None when no
    tile both divides B and fits the VMEM budget."""
    for t in (512, 256, 128):
        if B % t == 0 and t * L * _VMEM_BYTES_PER_CELL <= _VMEM_BUDGET:
            return t
    if B <= 128 and B * L * _VMEM_BYTES_PER_CELL <= _VMEM_BUDGET:
        return B  # small test batches
    return None


def supported(B: int, L: int, k: int) -> bool:
    """True when the kernel can run this shape (tile-divisible batch
    within the VMEM budget). count.KmerCounter gates its dispatch on
    this, falling back to the jnp u64 path otherwise."""
    return 0 < k <= 31 and L >= k and _lane_tile(B, L) is not None


@functools.lru_cache(maxsize=16)
def _build(B: int, L: int, k: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = L - k + 1
    TB = _lane_tile(B, L)
    if TB is None:
        raise ValueError(
            f"no lane tile for B={B} L={L} within the VMEM budget"
        )

    def kernel(codes_ref, hi_ref, lo_ref):
        c32 = codes_ref[:].astype(jnp.uint32)  # [L, TB]
        fhi = jnp.zeros((n, TB), jnp.uint32)
        flo = jnp.zeros((n, TB), jnp.uint32)
        rhi = jnp.zeros((n, TB), jnp.uint32)
        rlo = jnp.zeros((n, TB), jnp.uint32)
        bad = jnp.zeros((n, TB), jnp.bool_)
        for j in range(k):
            cj = jax.lax.slice_in_dim(c32, j, j + n, axis=0)
            base = cj & np.uint32(3)
            comp = base ^ np.uint32(3)
            bad = bad | (cj >= np.uint32(4))
            # forward: base j sits at bit position 2*(k-1-j)
            p = 2 * (k - 1 - j)
            if p >= 32:
                fhi = fhi | (base << np.uint32(p - 32))
            else:
                flo = flo | (base << np.uint32(p))
            # reverse complement: complement sits at bit position 2*j
            q = 2 * j
            if q >= 32:
                rhi = rhi | (comp << np.uint32(q - 32))
            else:
                rlo = rlo | (comp << np.uint32(q))
        take_f = (fhi < rhi) | ((fhi == rhi) & (flo <= rlo))
        hi = jnp.where(take_f, fhi, rhi)
        lo = jnp.where(take_f, flo, rlo)
        hi_ref[:] = jnp.where(bad, SENT32, hi)
        lo_ref[:] = jnp.where(bad, SENT32, lo)

    grid = (B // TB,)
    out_shape = (
        jax.ShapeDtypeStruct((n, B), jnp.uint32),
        jax.ShapeDtypeStruct((n, B), jnp.uint32),
    )
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (L, TB), lambda i: (np.int32(0), i), memory_space=pltpu.VMEM
            )
        ],
        out_specs=(
            pl.BlockSpec(
                (n, TB), lambda i: (np.int32(0), i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n, TB), lambda i: (np.int32(0), i), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=out_shape,
        interpret=interpret,
    )
    return call


def kernel_call(codes, k: int, interpret: bool = False):
    """[B, L] uint8 codes -> ([B, n] hi, [B, n] lo) u32 — traceable
    inside an outer jit (the counter's fused extract+append step). The
    valid-lane count is derivable as sum(hi != SENT32): for k <= 31 a
    real canonical k-mer's high word is < 2^30, so the sentinel never
    collides."""
    B, L = codes.shape
    if not 0 < k <= 31 or L < k:
        raise ValueError(f"need 0 < k <= 31 and L >= k, got k={k} L={L}")
    hi_t, lo_t = _build(B, L, k, interpret)(codes.T)
    return hi_t.T, lo_t.T


@functools.lru_cache(maxsize=16)
def _jit_extract(B: int, L: int, k: int, interpret: bool):
    def run(codes):
        hi, lo = kernel_call(codes, k, interpret)
        hi = hi.ravel()
        lo = lo.ravel()
        return hi, lo, jnp.sum(hi != SENT32, dtype=jnp.int64)

    return jax.jit(run)


def extract_canonical(codes, k: int, interpret: bool = False):
    """[B, L] uint8 codes -> (hi, lo [B*(L-k+1)] u32 with sentinel on
    invalid windows, n_valid). Drop-in for count._extract's body."""
    B, L = codes.shape
    if not 0 < k <= 31 or L < k:
        raise ValueError(f"need 0 < k <= 31 and L >= k, got k={k} L={L}")
    return _jit_extract(B, L, k, interpret)(codes)
