"""Multi-chip sharding of the k-mer count table and the EM model.

The reference's only parallelism is pthreads + mutexes in one address
space (src/CDBG.cpp:1726-1777, SURVEY §2e). The TPU-native design uses a
2-axis device mesh:

    data  — read batches are data-parallel (every device ingests its own
            slice of the read stream),
    shard — together with `data`, addresses the k-mer hash space: the
            count table is sharded over the FULL flattened mesh; device
            (a, s) owns hash subspace {h : h mod D == a*n_shard + s}.

One count step:
  1. each device packs + canonicalizes its local reads,
  2. k-mers route to their owner in TWO all_to_all hops — over `shard`
     by owner mod n_shard, then over `data` by owner div n_shard — with
     fixed per-destination quotas (overflow *detected* and surfaced for
     a host grow-and-replay, never silently dropped). Send buffers are
     built with gathers from the owner-sorted stream, not scatters;
  3. each device merges its received k-mers into its resident table
     slice with the same sort-collapse used by the single-chip counter
     (kmer/count.py:_collapse — sorts + run-length compaction, no
     scatter/segment_sum, which measure 10-100x slower than sort);
  4. the coverage histogram is local (every key is owned by exactly one
     device) + one psum over both axes.

Collectives ride ICI inside a slice; there are no locks anywhere —
conflict resolution is positional (sort + run-length ops), exactly the
bulk-synchronous replacement for MinimizerIndex's striped spin locks
(bifrost/src/MinimizerIndex.hpp:176-184).
"""

from __future__ import annotations

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


def balanced_mesh(n_devices: int, devices=None) -> Mesh:
    """Most-square (data, shard) factorization of n_devices — works for
    ANY device count, not just powers of two (n_devices=6 -> 3x2). Prime
    counts degrade to data-only (n x 1), which is still a valid mesh."""
    n_shard = 1
    for d in range(2, int(n_devices**0.5) + 1):
        if n_devices % d == 0:
            n_shard = d
    if n_devices > 1 and n_shard == 1 and n_devices % 2 == 0:
        n_shard = 2
    return make_mesh(n_devices // n_shard, n_shard, devices)


def _mix64(x: jnp.ndarray) -> jnp.ndarray:
    """splitmix64 finalizer — decorrelates the shard id from the k-mer's
    lexicographic prefix so shards stay balanced."""
    u = jnp.uint64
    x = (x ^ (x >> u(30))) * u(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> u(27))) * u(0x94D049BB133111EB)
    return x ^ (x >> u(31))


def hash_shard(kmers: jnp.ndarray, n_shard: int) -> jnp.ndarray:
    return (_mix64(kmers) % jnp.uint64(n_shard)).astype(jnp.int32)


def _route(km, dest, n_dest, quota, axis_name):
    """One all_to_all hop: group the local stream by destination and
    exchange fixed-quota bins. Send buffers are GATHERED from the
    dest-sorted stream (no scatters). Returns (received stream flattened,
    bin-overflow flag). Sentinel entries have dest == n_dest and are
    parked past every real bin."""
    dest_s, km_s = jax.lax.sort((dest, km), num_keys=1)
    seg_start = jnp.searchsorted(dest_s, jnp.arange(n_dest + 1, dtype=dest.dtype))
    bin_sizes = seg_start[1:] - seg_start[:-1]
    overflow = jnp.any(bin_sizes > quota)
    b = jnp.arange(n_dest, dtype=jnp.int32)[:, None]
    j = jnp.arange(quota, dtype=jnp.int32)[None, :]
    src = seg_start[b] + j
    valid = j < bin_sizes[b]
    send = jnp.where(
        valid, km_s[jnp.minimum(src, km_s.shape[0] - 1)], SENTINEL
    )  # [n_dest, quota]
    recv = jax.lax.all_to_all(
        send, axis_name=axis_name, split_axis=0, concat_axis=0, tiled=False
    )
    return recv.reshape(-1), overflow


def build_sharded_count_step(
    mesh: Mesh, k: int, table_cap: int, quota: int, quota2: int | None = None
):
    """Returns a jitted step: (codes, table_km, table_ct) ->
    (table_km, table_ct, hist, overflow, n_instances).

    codes: [B, L] uint8 read batch, split over the flattened mesh on the
    batch dim. table_km/table_ct: logical [D * cap] arrays sharded over
    the flattened mesh — device (a, s) owns the slice for hash subspace
    a * n_shard + s, so no two devices hold the same key and nothing is
    replicated or redundantly recomputed.

    `quota` / `quota2` are the per-destination-bin capacities of the two
    all_to_all hops. They bound both the exchanged bytes and the sort
    sizes downstream of each hop, so TIGHT quotas (sized from the
    expected VALID k-mers per device, not the padded window count — see
    ShardedKmerCounter) are the difference between exchanging real data
    and exchanging sentinel padding. quota2 defaults to the legacy
    quota * n_shard.

    On overflow (routing quota or table capacity) the step's outputs are
    NOT trustworthy; the host wrapper (ShardedKmerCounter) grows and
    replays the same batch — mirroring the single-chip grow-and-replay
    (kmer/count.py:321-341)."""
    n_data = mesh.shape["data"]
    n_shard = mesh.shape["shard"]
    D = n_data * n_shard
    if quota2 is None:
        quota2 = quota * n_shard

    from ..kmer.count import _collapse

    def step(codes, table_km, table_ct):
        # ---- per-device: pack & canonicalize local reads -------------
        canon, valid = batch_kmers(codes, k)
        canon = canon.ravel()
        valid = valid.ravel()
        km = jnp.where(valid, canon, SENTINEL)
        n_local_instances = jnp.sum(valid)

        # owner = a * n_shard + s over the flattened mesh
        owner = jnp.where(
            km != SENTINEL, hash_shard(km, D), np.int32(D)
        )
        # ---- hop 1: route by s over `shard` --------------------------
        s_dest = jnp.where(
            owner < D, owner % n_shard, np.int32(n_shard)
        ).astype(jnp.int32)
        km1, ovf1 = _route(km, s_dest, n_shard, quota, "shard")
        # ---- hop 2: route by a over `data` ---------------------------
        owner1 = jnp.where(
            km1 != SENTINEL, hash_shard(km1, D), np.int32(D)
        )
        a_dest = jnp.where(
            owner1 < D, owner1 // n_shard, np.int32(n_data)
        ).astype(jnp.int32)
        km2, ovf2 = _route(km1, a_dest, n_data, quota2, "data")

        # ---- local sort-collapse merge with the resident slice -------
        hi = (km2 >> jnp.uint64(32)).astype(jnp.uint32)
        lo = km2.astype(jnp.uint32)
        thi = (table_km >> jnp.uint64(32)).astype(jnp.uint32)
        tlo = table_km.astype(jnp.uint32)
        uhi, ulo, uct, n_uniq = _collapse(
            thi, tlo, table_ct.astype(jnp.int32), hi, lo, 10000
        )
        merged_km = (uhi.astype(jnp.uint64) << jnp.uint64(32)) | ulo.astype(
            jnp.uint64
        )
        merged_km = jnp.where(uhi == 0xFFFFFFFF, SENTINEL, merged_km)
        table_overflow = n_uniq > table_cap

        # ---- global histogram: local (keys owned uniquely) + psum ----
        c = jnp.clip(uct, 0, 255).astype(jnp.int32)
        cs = jax.lax.sort(c)
        edges = jnp.searchsorted(cs, jnp.arange(257, dtype=jnp.int32))
        hist = (edges[1:] - edges[:-1]).astype(jnp.int64).at[0].set(0)
        hist = jax.lax.psum(jax.lax.psum(hist, "shard"), "data")
        n_instances = jax.lax.psum(
            jax.lax.psum(n_local_instances, "shard"), "data"
        )
        overflow = jax.lax.psum(
            jax.lax.psum(
                (ovf1 | ovf2 | table_overflow).astype(jnp.int32), "shard"
            ),
            "data",
        ) > 0
        return (
            merged_km,
            uct.astype(jnp.int64),
            hist,
            overflow,
            n_instances,
        )

    from jax import shard_map

    step_sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(
            P(("data", "shard")),  # batch dim split across every device
            P(("data", "shard")),  # table sharded over the full mesh
            P(("data", "shard")),
        ),
        out_specs=(
            P(("data", "shard")),
            P(("data", "shard")),
            P(),       # histogram replicated
            P(),       # overflow flag replicated
            P(),
        ),
        check_vma=False,
    )
    return jax.jit(step_sharded)


class ShardedKmerCounter:
    """KmerCounter-compatible streaming counter over a device mesh.

    The CLI's mesh path (parallel/mesh.py, `--devices`) counts through
    this class: same surface as kmer.count.KmerCounter (add_reads /
    arrays / histogram / write_histogram / total_kmers / num_unique) so
    the pipeline entry points are mesh-agnostic. One add_reads = one
    sharded count step (two-hop all_to_all route + per-shard
    sort-collapse merge + psum histogram); overflow triggers
    grow-and-RESUME: the valid pre-batch table carries into a larger
    table (per-shard hash ownership is cap-independent, so expansion is
    per-shard sentinel padding ON DEVICE) and only the failing batch
    replays. The new capacity is projected from the observed
    distinct-rate (the exact-counting analog of the reference's
    KmerStream F0 sizing, SURVEY §2b row 20) so a growth cascade
    normally ends in ONE step.

    Deterministic and mesh-shape invariant: the merged global table
    depends only on the k-mer multiset (tests/test_mesh_invariance.py).
    """

    def __init__(
        self,
        mesh: Mesh,
        k: int,
        counter_max: int = 10000,
        initial_capacity: int = 1 << 20,
        quota: int | None = None,
        expected_instances: int | None = None,
    ):
        self.mesh = mesh
        self.k = k
        self.counter_max = counter_max
        self.D = mesh.shape["data"] * mesh.shape["shard"]
        # per-shard capacity; `initial_capacity` is the GLOBAL table
        # size, mirroring KmerCounter's meaning
        self._cap = _pow2(max(64, initial_capacity // self.D))
        self._quota = quota
        self._quota2 = None
        self._step = None
        self._km, self._ct = init_sharded_table(mesh, self._cap)
        self._hist = None
        self._n_total = 0
        self._done_inst = 0
        # optional total-instance hint for the growth projection bound
        self._inst_hint = expected_instances
        self._finalized = None  # cached arrays() result (one collective)

    def _pick_quotas(self, codes) -> None:
        """Size the two routing quotas from the FIRST batch's actual
        valid-k-mer count (reads are usually much shorter than the
        window width, so padded slots overstate the real volume by
        3-4x). 2x headroom over the balanced-hash expectation; overflow
        still grows and replays, so a tight start is safe.

        `codes` may be a host batch or a (multi-host) global device
        array; either way the count — and therefore the quota and the
        compiled step — is identical on every process."""
        import jax

        if self._quota is not None:
            if self._quota2 is None:
                self._quota2 = self._quota * self.mesh.shape["shard"]
            return
        v = int(
            jax.jit(
                lambda c: jnp.sum(batch_kmers(c, self.k)[1], dtype=jnp.int64)
            )(codes)
        )
        per_dev = max(1, (2 * v) // self.D)
        self._quota = max(
            4096, -(-per_dev // self.mesh.shape["shard"])
        )
        self._quota2 = max(4096, -(-per_dev // self.mesh.shape["data"]))

    # -- ingestion -------------------------------------------------------

    def _global_batch(self, codes):
        """Host batch -> (batch array for the step, global instance
        count). Every process passes the SAME global batch (the CLI
        feeders read the same files on a shared filesystem); padding to
        a device-count multiple is identical everywhere, so the padded
        global batch — and every downstream table — is byte-identical
        to the single-process run. Multi-host, each process then
        device_puts only ITS contiguous row slice (its addressable
        shards of the global data-parallel batch)."""
        import jax

        b = np.asarray(codes, dtype=np.uint8)
        if b.shape[0] % self.D:
            # pad the batch dim to a multiple of the device count with
            # invalid rows (code 0xF > 3 -> every window invalid)
            pad = self.D - b.shape[0] % self.D
            b = np.concatenate(
                [b, np.full((pad, b.shape[1]), 0x0F, np.uint8)]
            )
        n_inst = b.shape[0] * (b.shape[1] - self.k + 1)
        nproc = jax.process_count()
        if nproc == 1:
            return b, n_inst
        local_rows = b.shape[0] // nproc
        pid = jax.process_index()
        from jax.sharding import NamedSharding

        s = NamedSharding(self.mesh, P(("data", "shard")))
        g = jax.make_array_from_process_local_data(
            s,
            np.ascontiguousarray(
                b[pid * local_rows : (pid + 1) * local_rows]
            ),
            global_shape=(b.shape[0], b.shape[1]),
        )
        return g, n_inst

    def add_reads(self, codes) -> None:
        b, n_inst = self._global_batch(codes)
        if self._quota is None or self._quota2 is None:
            self._pick_quotas(b)
        if self._step is None:
            self._step = build_sharded_count_step(
                self.mesh, self.k, self._cap, self._quota, self._quota2
            )
        self._finalized = None
        while True:
            nkm, nct, nhist, overflow, ni = self._step(b, self._km, self._ct)
            if not bool(overflow):
                self._km, self._ct, self._hist = nkm, nct, nhist
                self._n_total += int(ni)
                self._done_inst += n_inst
                return
            self._grow(n_inst)

    def _grow(self, batch_inst: int) -> None:
        # distinct-rate projection, bounded by the trivial
        # distinct <= instances ceiling
        target = self._inst_hint or (self._done_inst + batch_inst) * 2
        if self._done_inst:
            rate = (self.D * self._cap) / self._done_inst
            projected = int(rate * target * 1.5 / self.D) + self._quota
        else:
            projected = 2 * self._cap
        bound = target // self.D + self._quota + 64
        new_cap = max(2 * self._cap, min(_pow2(projected), _pow2(bound)))
        self._km, self._ct = _expand_tables(
            self.mesh, self._km, self._ct, self._cap, new_cap
        )
        self._cap = new_cap
        self._quota *= 2
        self._quota2 *= 2
        self._step = build_sharded_count_step(
            self.mesh, self.k, self._cap, self._quota, self._quota2
        )

    # -- finalization / views --------------------------------------------

    @property
    def total_kmers(self) -> int:
        return self._n_total

    @property
    def num_unique(self) -> int:
        km, _ = self.arrays()
        return len(km)

    def arrays(self):
        """(sorted unique canonical k-mers u64, saturated counts int64),
        streamed off-device ONE SHARD AT A TIME (each shard is fetched,
        filtered, then released before the next — peak extra host memory
        is one shard's slice, not the padded global table).

        Multi-host: every process first collects its LOCAL shards, then
        the per-process (k-mer, count) sets are exchanged with one
        ragged host all-gather — each key lives on exactly one device,
        so the union is exact and every process returns the same global
        sorted table. The result is CACHED until the next add_reads:
        collectives must be entered by every process the same number of
        times, so repeated finalization reads (histogram + arrays) must
        not re-gather."""
        import jax

        cached = getattr(self, "_finalized", None)
        if cached is not None:
            return cached
        kms, cts = [], []
        kshards = sorted(self._km.addressable_shards, key=lambda s: s.index)
        cshards = sorted(self._ct.addressable_shards, key=lambda s: s.index)
        for ks, cs in zip(kshards, cshards):
            km = np.asarray(ks.data).ravel()
            live = km != SENTINEL
            kms.append(km[live])
            cts.append(np.asarray(cs.data).ravel()[live])
        km = np.concatenate(kms) if kms else np.empty(0, np.uint64)
        ct = np.concatenate(cts) if cts else np.empty(0, np.int64)
        if jax.process_count() > 1:
            km, ct = _ragged_allgather_pairs(km, ct)
        order = np.argsort(km)
        self._finalized = (km[order], np.minimum(ct[order], self.counter_max))
        return self._finalized

    def histogram(self, max_cov: int | None = None) -> np.ndarray:
        """hist[c] = number of distinct k-mers with saturated count c.
        The step's running psum histogram covers c <= 255; larger
        max_cov recomputes from the final counts."""
        if max_cov is None:
            max_cov = self.counter_max
        if max_cov <= 255 and self._hist is not None:
            return np.asarray(self._hist)[: max_cov + 1]
        _, ct = self.arrays()
        c = np.clip(ct, 0, max_cov).astype(np.int64)
        hist = np.bincount(c, minlength=max_cov + 1)
        hist[0] = 0
        return hist

    def write_histogram(self, path: str, max_cov: int = 10000) -> None:
        hist = self.histogram(max_cov)
        with open(path, "w") as f:
            for cov in range(1, max_cov + 1):
                f.write(f"{cov}\t{int(hist[cov]) if cov < len(hist) else 0}\n")


def sharded_count(mesh: Mesh, k: int, code_batches, table_cap=4096, quota=None):
    """Count canonical k-mers of `code_batches` over the mesh (see
    ShardedKmerCounter). Returns (kmers sorted u64, counts int64,
    hist int64[256], n_instances)."""
    counter = ShardedKmerCounter(
        mesh, k, initial_capacity=table_cap * mesh.devices.size, quota=quota
    )
    for b in code_batches:
        counter.add_reads(b)
    km, ct = counter.arrays()
    hist = (
        np.asarray(counter._hist)
        if counter._hist is not None
        else np.zeros(256, np.int64)
    )
    return km, ct, hist, counter.total_kmers


def _pow2(n: int) -> int:
    return 1 << max(int(n) - 1, 1).bit_length()


def _ragged_allgather_pairs(km: np.ndarray, ct: np.ndarray):
    """All-gather per-process ragged (k-mer, count) arrays across hosts:
    pad every process's slice to the psum'd maximum length with
    sentinels, one tiled process_allgather, drop the padding."""
    from jax.experimental import multihost_utils

    lens = multihost_utils.process_allgather(
        np.array([len(km)], dtype=np.int64), tiled=True
    )
    n_max = int(np.asarray(lens).max())
    pk = np.full(n_max, SENTINEL, dtype=np.uint64)
    pc = np.zeros(n_max, dtype=np.int64)
    pk[: len(km)] = km
    pc[: len(ct)] = ct
    all_km = multihost_utils.process_allgather(pk, tiled=True)
    all_ct = multihost_utils.process_allgather(pc, tiled=True)
    live = all_km != SENTINEL
    return all_km[live], all_ct[live]


def _expand_tables(mesh: Mesh, km, ct, old_cap: int, new_cap: int):
    """Grow each shard's table region from old_cap to new_cap slots ON
    DEVICE, preserving contents (sorted entries first, sentinel padding
    after — the layout the merge step maintains). Shard ownership is
    hash % n_devices, independent of capacity, so no re-routing and no
    host round-trip (round-3 finding: the old np.asarray expansion was
    a host-memory cliff at the 122 M-k-mer scale)."""
    pad = new_cap - old_cap

    def grow(kml, ctl):
        return (
            jnp.concatenate([kml, jnp.full((pad,), SENTINEL, jnp.uint64)]),
            jnp.concatenate([ctl, jnp.zeros((pad,), jnp.int64)]),
        )

    from jax import shard_map

    spec = P(("data", "shard"))
    fn = shard_map(
        grow, mesh=mesh, in_specs=(spec, spec), out_specs=(spec, spec),
        check_vma=False,
    )
    return jax.jit(fn)(km, ct)


def init_sharded_table(mesh: Mesh, table_cap: int):
    """Empty count table: logical [D * cap] sharded over the full mesh,
    sentinel-filled (sentinels sort last in the collapse). Created
    INSIDE jit so it works identically on a single process and on a
    process-spanning (multi-host) mesh, where device_put of host data
    onto non-addressable devices is not possible."""
    D = mesh.shape["data"] * mesh.shape["shard"]
    s = NamedSharding(mesh, P(("data", "shard")))

    def make():
        return (
            jnp.full((D * table_cap,), SENTINEL, dtype=jnp.uint64),
            jnp.zeros((D * table_cap,), dtype=jnp.int64),
        )

    return jax.jit(make, out_shardings=(s, s))()


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


def build_sharded_ll_step(mesh: Mesh):
    """Log-likelihood of data-sharded allele frequencies under the
    current (replicated) GMM params: local partial sum + psum. The
    initial-ll companion of build_sharded_em_step for the host-side
    emIterate loop (src/GmmModel.cpp:379-394)."""
    from jax import shard_map

    from ..model.gmm import DBL_MIN

    def step(af, mask, means, weights, variances):
        d = af[:, None] - means[None, :]
        p = (
            1.0 / jnp.sqrt(2.0 * jnp.pi * variances)[None, :]
            * jnp.exp(-(d * d) / (2.0 * variances)[None, :])
        )
        s = jnp.sum(weights[None, :] * p, axis=1)
        s = jnp.where(s == 0.0, DBL_MIN, s)
        return jax.lax.psum(jnp.sum(jnp.log(s) * mask), ("data", "shard"))

    step_sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(("data", "shard")), P(("data", "shard")), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(step_sharded)


def build_sharded_search_step(mesh: Mesh, gather: bool = False):
    """Multi-chip superbubble search: the per-seed bounded DFS
    (bubble/batched.search_one) shard_mapped over the FLATTENED mesh.

    Seeds are embarrassingly parallel (the search reads only the CSR
    adjacency, never shared state — src/CDBG.cpp:2643-2823 via the
    batched kernel's docstring), so the seed axis splits across every
    device; the successor table is replicated. Outputs keep the seed
    sharding, so fetching them to the host IS the all-gather — the host
    replay (bubble/batched._replay_fast) then runs unchanged, keeping
    mesh-shape byte-invariance (tests/test_mesh_invariance.py).

    Maps the reference's pthread work distribution
    (findSuperBubble_multithread_ptr, src/CDBG.cpp:1707-1871) onto the
    data-parallel mesh axis per SURVEY §2e row 1.
    """
    from jax import shard_map

    from ..bubble.batched import MAX_SEEN, MAX_STACK, MAX_STEPS, _search_batched

    batched = _search_batched(MAX_SEEN, MAX_STACK, MAX_STEPS)
    axes = ("data", "shard")
    if gather:
        # multi-HOST runs: all_gather the per-seed outputs inside the
        # program so every process holds the FULL result arrays (a
        # sharded output is not fully addressable across processes, so
        # the host replay could not fetch it). tiled=True concatenates
        # in flattened (data, shard) order — the same order the input
        # seeds were partitioned in, so seed order is preserved.
        def gathered(seeds, succ_node):
            outs = batched(seeds, succ_node)
            return tuple(
                jax.lax.all_gather(o, axes, axis=0, tiled=True)
                for o in outs
            )

        step = shard_map(
            gathered,
            mesh=mesh,
            in_specs=(P(axes), P(None, None, None)),
            out_specs=(P(), P(), P(), P(None, None), P()),
            check_vma=False,
        )
        return jax.jit(step)
    step = shard_map(
        batched,
        mesh=mesh,
        in_specs=(P(axes), P(None, None, None)),
        out_specs=(P(axes), P(axes), P(axes), P(axes, None), P(axes)),
        check_vma=False,
    )
    return jax.jit(step)
