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

Grid: one program per row-tile of the [B, L] batch; everything lives in
VMEM. Output layout matches count._extract: hi/lo flattened [B * (L-k+1)].

On non-TPU backends (tests force CPU) callers should use the jnp path;
`extract_canonical` dispatches on jax.default_backend() and the unit
tests run the kernel in interpreter mode for parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SENT32 = np.uint32(0xFFFFFFFF)


def _row_tile(B: int) -> int:
    # keep the [TB, L] block plus ~10 [TB, n] u32 temporaries under a
    # few MB of VMEM; 256 rows x 512 cols of u8 + temps ~ 6MB
    for t in (256, 128, 64, 32, 16, 8):
        if B % t == 0:
            return t
    return B


@functools.lru_cache(maxsize=16)
def _build(B: int, L: int, k: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = L - k + 1
    TB = _row_tile(B)

    def kernel(codes_ref, hi_ref, lo_ref, cnt_ref):
        c32 = codes_ref[:].astype(jnp.uint32)  # [TB, L]
        fhi = jnp.zeros((TB, n), jnp.uint32)
        flo = jnp.zeros((TB, n), jnp.uint32)
        rhi = jnp.zeros((TB, n), jnp.uint32)
        rlo = jnp.zeros((TB, n), jnp.uint32)
        bad = jnp.zeros((TB, n), jnp.bool_)
        for j in range(k):
            cj = jax.lax.slice_in_dim(c32, j, j + n, axis=1)
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
        cnt_ref[0, 0] = jnp.sum((~bad).astype(jnp.int32))

    grid = (B // TB,)
    out_shape = (
        jax.ShapeDtypeStruct((B, n), jnp.uint32),
        jax.ShapeDtypeStruct((B, n), jnp.uint32),
        jax.ShapeDtypeStruct((B // TB, 1), jnp.int32),
    )
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((TB, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=out_shape,
        interpret=interpret,
    )

    def run(codes):
        hi, lo, cnt = call(codes)
        return (
            hi.ravel(),
            lo.ravel(),
            jnp.sum(cnt, dtype=jnp.int64),
        )

    return jax.jit(run)


def extract_canonical(codes, k: int, interpret: bool = False):
    """[B, L] uint8 codes -> (hi, lo [B*(L-k+1)] u32 with sentinel on
    invalid windows, n_valid). Drop-in for count._extract's body."""
    B, L = codes.shape
    if not 0 < k <= 31 or L < k:
        raise ValueError(f"need 0 < k <= 31 and L >= k, got k={k} L={L}")
    return _build(B, L, k, interpret)(codes)
