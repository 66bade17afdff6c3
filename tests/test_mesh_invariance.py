"""Mesh-shape invariance of the END-TO-END pipeline (SURVEY §4 item 4).

The reference has no distributed tests; the multi-chip contract here is
that every output table is BYTE-IDENTICAL whether the k-mer counting
stage ran on 1 device, a 2x1 mesh, or the full 4x2 / 8-device mesh.
The sharded counter's merged table is deterministic (sort-collapse), so
graph construction, bubble search, site extraction, and the model see
identical inputs regardless of mesh shape.
"""

import os

import jax
import numpy as np
import pytest

from ploidyfrost_tpu.kmer.count import KmerCounter
from ploidyfrost_tpu.kmer.pack import INVALID_BASE, encode_bases
from ploidyfrost_tpu.parallel.sharded import balanced_mesh, make_mesh, sharded_count

K = 15

TABLES = [
    "super_bubble",
    "alignseq",
    "bicov",
    "bifre",
    "allele_frequency",
]


def _reads(rng, genome, n, length):
    starts = rng.integers(0, len(genome) - length, n)
    batch = np.stack([genome[s : s + length] for s in starts])
    return batch.astype(np.uint8)


def _make_batches():
    rng = np.random.default_rng(99)
    G = 20_000
    g1 = rng.integers(0, 4, G).astype(np.uint8)
    g2 = g1.copy()
    snp = rng.random(G) < 0.004
    g2[snp] = (g2[snp] + rng.integers(1, 4, snp.sum())) % 4
    batches = []
    for hap in (g1, g2):
        for _ in range(2):
            batches.append(_reads(rng, hap, 256, 80))
    return batches


def _run_pipeline(km, ct, outdir, outpre, mesh=None):
    """graph -> bubbles -> sites -> tables from a (kmers, counts) table.
    With `mesh`, the superbubble search runs shard_mapped over it."""
    from ploidyfrost_tpu.bubble.batched import find_superbubbles_device
    from ploidyfrost_tpu.bubble.superbubble import write_superbubble_file
    from ploidyfrost_tpu.graph.construct import build_graph_from_kmers
    from ploidyfrost_tpu.kmer.countdb import KmerCountDB
    from ploidyfrost_tpu.pipeline import unitig_coverage, window_coverage
    from ploidyfrost_tpu.sites.emit import analyze_bubbles, write_outputs

    cwd = os.getcwd()
    os.makedirs(outdir, exist_ok=True)
    os.chdir(outdir)
    try:
        g = build_graph_from_kmers(km[ct >= 3], K)
        db = KmerCountDB(km, ct, K)
        state, bubbles = find_superbubbles_device(g, 8, mesh=mesh)
        os.makedirs("PloidyFrost_output", exist_ok=True)
        write_superbubble_file(g, bubbles, outpre)
        ucov, umin = unitig_coverage(db, g)
        em, ws = analyze_bubbles(g, state, ucov, umin, 2, 1000)
        wcov = window_coverage(db, ws, 2, 1000)
        write_outputs(em, wcov, outpre)
    finally:
        os.chdir(cwd)


@pytest.mark.parametrize("shape", [(1, 1), (2, 1), (4, 2)])
def test_pipeline_outputs_mesh_invariant(tmp_path, shape):
    """Outputs from an N-device sharded count == single-chip outputs."""
    n_data, n_shard = shape
    if len(jax.devices()) < n_data * n_shard:
        pytest.skip("needs 8 virtual devices")
    batches = _make_batches()

    # single-chip oracle table
    ref = KmerCounter(K)
    for b in batches:
        ref.add_reads(b)
    km1, ct1 = ref.arrays()
    km1 = np.asarray(km1, dtype=np.uint64)
    ct1 = np.asarray(ct1, dtype=np.int64)

    mesh = make_mesh(n_data, n_shard)
    km2, ct2, hist, n_inst = sharded_count(mesh, K, batches)
    np.testing.assert_array_equal(km1, km2)
    np.testing.assert_array_equal(ct1, ct2)
    assert n_inst == ref.total_kmers

    _run_pipeline(km1, ct1, str(tmp_path / "single"), "o")
    # sharded search over the same mesh: byte-identical tables required
    _run_pipeline(km2, ct2, str(tmp_path / "mesh"), "o", mesh=mesh)
    for t in TABLES:
        a = (tmp_path / "single" / "PloidyFrost_output" / f"o_{t}.txt").read_bytes()
        b = (tmp_path / "mesh" / "PloidyFrost_output" / f"o_{t}.txt").read_bytes()
        assert a == b, f"{t} differs between single-chip and {shape} mesh"
    assert len((tmp_path / "single" / "PloidyFrost_output" / "o_super_bubble.txt").read_bytes()) > 0


def test_sharded_count_grow_and_replay():
    """Starting with a tiny table capacity must grow + replay, not drop."""
    if len(jax.devices()) < 4:
        pytest.skip("needs devices")
    batches = _make_batches()[:2]
    ref = KmerCounter(K)
    for b in batches:
        ref.add_reads(b)
    km1, ct1 = ref.arrays()
    mesh = balanced_mesh(4)
    km2, ct2, _, _ = sharded_count(mesh, K, batches, table_cap=64, quota=64)
    np.testing.assert_array_equal(np.asarray(km1, dtype=np.uint64), km2)
    np.testing.assert_array_equal(np.asarray(ct1, dtype=np.int64), ct2)


def test_balanced_mesh_non_power_of_two():
    """balanced_mesh must exercise both axes for composite counts
    (VERDICT weak #6: 6 devices -> 3x2, not 6x1)."""
    devs = jax.devices()
    if len(devs) < 6:
        pytest.skip("needs 6 devices")
    mesh = balanced_mesh(6)
    assert dict(mesh.shape) == {"data": 3, "shard": 2}
    batches = _make_batches()[:1]
    km, ct, hist, n = sharded_count(mesh, K, batches)
    ref = KmerCounter(K)
    ref.add_reads(batches[0])
    km1, ct1 = ref.arrays()
    np.testing.assert_array_equal(np.asarray(km1, dtype=np.uint64), km)


def test_sharded_arrays_streams_per_shard():
    """ShardedKmerCounter.arrays() must fetch ONE shard at a time
    (VERDICT r3 #8): peak host allocation during finalization stays
    within the live result plus ~1.5 shard slices, NOT the padded
    [D * cap] global table (which carries sentinel padding on top)."""
    import tracemalloc

    from ploidyfrost_tpu.parallel.sharded import ShardedKmerCounter

    mesh = balanced_mesh(8)
    rng = np.random.default_rng(3)
    counter = ShardedKmerCounter(mesh, K, initial_capacity=1 << 21)
    for _ in range(3):
        counter.add_reads(rng.integers(0, 4, size=(2048, 96)).astype(np.uint8))
    # force shards to device-complete before measuring host behavior
    import jax

    jax.block_until_ready(counter._km)
    D = counter.D
    padded_bytes = D * counter._cap * (8 + 8)  # u64 keys + i64 counts
    shard_bytes = counter._cap * (8 + 8)
    tracemalloc.start()
    km, ct = counter.arrays()
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    live_bytes = km.nbytes + ct.nbytes
    # sorted output + argsort scratch + at most ~1.5 shards in flight;
    # the padded whole-table fetch would exceed this by construction
    budget = 3 * live_bytes + 2 * shard_bytes + (1 << 20)
    assert peak < budget, (peak, budget, padded_bytes)
    assert len(km) == counter.num_unique
    assert (np.diff(km.astype(np.uint64).view(np.uint64)) > 0).all()
