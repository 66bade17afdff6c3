"""Multi-chip sharding of the k-mer count table and the EM model.

The reference's only parallelism is pthreads + mutexes in one address
space (src/CDBG.cpp:1726-1777, SURVEY §2e). The TPU-native design uses a
2-axis device mesh:

    data  — read batches are data-parallel (every device ingests its own
            slice of the read stream),
    shard — the k-mer hash space is model-parallel: each `shard` column
            owns a slice of the canonical k-mer space; the count table
            for that slice is replicated across the `data` axis.

One count step:
  1. each device packs + canonicalizes its local reads,
  2. k-mers route to their owning shard with an all_to_all over `shard`
     (fixed per-destination quotas; overflow is *detected* and surfaced,
     never silently dropped),
  3. each device sorts + segment-reduces its received k-mers,
  4. partial tables merge across `data` with an all_gather + local merge,
  5. the coverage histogram is a psum over everything.

Collectives ride ICI inside a slice; there are no locks anywhere —
conflict resolution is positional (sort + segment ops), exactly the
bulk-synchronous replacement for MinimizerIndex's striped spin locks
(bifrost/src/MinimizerIndex.hpp:176-184).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kmer.count import SENTINEL
from ..kmer.pack import batch_kmers


def make_mesh(n_data: int, n_shard: int, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: n_data * n_shard]).reshape(n_data, n_shard)
    return Mesh(devices, axis_names=("data", "shard"))


def _mix64(x: jnp.ndarray) -> jnp.ndarray:
    """splitmix64 finalizer — decorrelates the shard id from the k-mer's
    lexicographic prefix so shards stay balanced."""
    u = jnp.uint64
    x = (x ^ (x >> u(30))) * u(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> u(27))) * u(0x94D049BB133111EB)
    return x ^ (x >> u(31))


def hash_shard(kmers: jnp.ndarray, n_shard: int) -> jnp.ndarray:
    return (_mix64(kmers) % jnp.uint64(n_shard)).astype(jnp.int32)


def build_sharded_count_step(mesh: Mesh, k: int, table_cap: int, quota: int):
    """Returns a jitted step: (codes, table_km, table_ct) -> updated tables
    + histogram-ready overflow flag.

    codes:     [B, L] uint8, sharded over ('data', None) — each data row
               (all shard columns see the same rows? no: sharded over both
               axes' product via ('data','shard') on the batch dim).
    table_km:  [n_shard_axis_local ...] actually [cap] per device,
               replicated over data, sharded over shard: full logical
               shape [n_shard * cap] partitioned on axis 0.
    """
    n_data = mesh.shape["data"]
    n_shard = mesh.shape["shard"]

    def step(codes, table_km, table_ct):
        # ---- per-device: pack & canonicalize local reads -------------
        canon, valid = batch_kmers(codes, k)
        canon = canon.ravel()
        valid = valid.ravel()
        km = jnp.where(valid, canon, SENTINEL)
        n_local_instances = jnp.sum(valid)

        # ---- route to owning shard over the `shard` axis -------------
        owner = jnp.where(km != SENTINEL, hash_shard(km, n_shard), n_shard)
        order = jnp.argsort(owner)
        km_sorted = km[order]
        owner_sorted = owner[order]
        # position of each k-mer within its destination bin
        seg_start = jnp.searchsorted(owner_sorted, jnp.arange(n_shard + 1))
        bin_sizes = seg_start[1:] - seg_start[:-1]
        overflow = jnp.any(bin_sizes[:n_shard] > quota)
        # scatter into [n_shard, quota] send buffer (overflow clipped but
        # flagged above so the host can re-run with a larger quota)
        pos_in_bin = jnp.arange(km.shape[0]) - seg_start[jnp.clip(owner_sorted, 0, n_shard)]
        send = jnp.full((n_shard, quota), SENTINEL, dtype=jnp.uint64)
        dest_ok = (owner_sorted < n_shard) & (pos_in_bin < quota)
        # masked entries get an out-of-range row and are dropped
        send = send.at[
            jnp.where(dest_ok, owner_sorted, n_shard),
            jnp.where(dest_ok, pos_in_bin, 0),
        ].set(km_sorted, mode="drop")
        recv = jax.lax.all_to_all(
            send, axis_name="shard", split_axis=0, concat_axis=0, tiled=False
        )
        # recv: [n_shard, quota] — k-mers this shard owns, from every peer
        mine = recv.reshape(-1)

        # ---- merge across the data axis ------------------------------
        gathered = jax.lax.all_gather(mine, axis_name="data", tiled=True)

        # ---- local sort + segment-reduce + merge with resident table -
        allkm = jnp.concatenate([table_km, gathered])
        allct = jnp.concatenate(
            [table_ct, jnp.where(gathered != SENTINEL, 1, 0).astype(jnp.int64)]
        )
        order2 = jnp.argsort(allkm)
        allkm = allkm[order2]
        allct = allct[order2]
        first = jnp.concatenate([np.array([True]), allkm[1:] != allkm[:-1]])
        seg = jnp.cumsum(first) - 1
        merged_ct = jax.ops.segment_sum(allct, seg, num_segments=table_cap)
        merged_km = jnp.full((table_cap,), SENTINEL, dtype=jnp.uint64)
        merged_km = merged_km.at[seg].set(allkm, mode="drop")
        merged_ct = jnp.where(merged_km == SENTINEL, 0, merged_ct)
        table_overflow = jnp.any(seg >= table_cap)

        # ---- global histogram (psum over both axes) -------------------
        live = merged_km != SENTINEL
        hist = jnp.bincount(
            jnp.where(live, jnp.clip(merged_ct, 0, 255), 0).astype(jnp.int32),
            length=256,
        )
        hist = hist.at[0].set(0)
        # each shard column's table is replicated over data; dividing by
        # n_data after a full psum keeps one copy per shard
        hist = jax.lax.psum(hist, axis_name="shard")
        hist = jax.lax.psum(hist, axis_name="data") // n_data
        n_instances = jax.lax.psum(
            jax.lax.psum(n_local_instances, "shard"), "data"
        )
        return (
            merged_km,
            merged_ct,
            hist,
            overflow | table_overflow,
            n_instances,
        )

    from jax import shard_map

    step_sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(
            P(("data", "shard")),  # batch dim split across every device
            P("shard"),            # table sharded over k-mer space
            P("shard"),
        ),
        out_specs=(
            P("shard"),
            P("shard"),
            P(),       # histogram replicated
            P(),       # overflow flag replicated
            P(),
        ),
        check_vma=False,
    )
    return jax.jit(step_sharded)


def init_sharded_table(mesh: Mesh, table_cap: int):
    """Empty sharded table: logical [n_shard * cap] sorted-with-sentinels."""
    n_shard = mesh.shape["shard"]
    km = jnp.full((n_shard * table_cap,), SENTINEL, dtype=jnp.uint64)
    ct = jnp.zeros((n_shard * table_cap,), dtype=jnp.int64)
    s = NamedSharding(mesh, P("shard"))
    return jax.device_put(km, s), jax.device_put(ct, s)


def build_sharded_em_step(mesh: Mesh):
    """EM over data-sharded allele frequencies: local partial sums, psum
    across the mesh, identical update + rejection guard on every device.

    Semantics match src/GmmModel.cpp:275-334 (frozen means, guard) — the
    psum just changes *where* the N-point reductions happen.
    """
    from jax import shard_map
    from ..model.gmm import DBL_MIN

    def step(af, mask, means, weights, variances, m_thre, n_thre):
        g = means.shape[0]
        d = af[:, None] - means[None, :]
        p = (
            1.0 / jnp.sqrt(2.0 * jnp.pi * variances)[None, :]
            * jnp.exp(-(d * d) / (2.0 * variances)[None, :])
        )
        part = weights[None, :] * p
        part = jnp.where(part == 0.0, DBL_MIN, part)
        rowsum = jnp.sum(part, axis=1, keepdims=True)
        resp = part / rowsum * mask[:, None]
        gauss_sum = jax.lax.psum(jnp.sum(resp, axis=0), ("data", "shard"))
        var_sum = jax.lax.psum(jnp.sum(resp * d * d, axis=0), ("data", "shard"))
        total = jnp.sum(gauss_sum)
        new_vars = var_sum / gauss_sum
        new_vars = jnp.where(new_vars == 0.0, DBL_MIN, new_vars)
        new_weights = gauss_sum / total
        max_w = jnp.max(new_weights)
        interior = jnp.logical_and(
            max_w != new_weights[0], max_w != new_weights[g - 1]
        )
        min_w = jnp.min(new_weights)
        reject = jnp.logical_and(
            interior,
            jnp.logical_or(min_w < 1.0 / g / m_thre, min_w < max_w / g / n_thre),
        )
        out_vars = jnp.where(reject, variances, new_vars)
        out_weights = jnp.where(reject, weights, new_weights)
        ll = jax.lax.psum(
            jnp.sum(
                jnp.log(
                    jnp.maximum(
                        jnp.sum(out_weights[None, :] * (
                            1.0 / jnp.sqrt(2.0 * jnp.pi * out_vars)[None, :]
                            * jnp.exp(-(d * d) / (2.0 * out_vars)[None, :])
                        ), axis=1),
                        DBL_MIN,
                    )
                )
                * mask
            ),
            ("data", "shard"),
        )
        return out_vars, out_weights, ll

    step_sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(
            P(("data", "shard")),
            P(("data", "shard")),
            P(),
            P(),
            P(),
            P(),
            P(),
        ),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(step_sharded)
