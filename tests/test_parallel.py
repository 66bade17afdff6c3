"""Sharded count-table tests on the virtual 8-device CPU mesh.

Mesh-shape invariance is the distributed test the reference never had
(SURVEY §4): results must match the single-device KmerCounter exactly.
"""

import jax
import numpy as np
import pytest

from ploidyfrost_tpu.kmer.count import SENTINEL, KmerCounter
from ploidyfrost_tpu.kmer.pack import INVALID_BASE, decode_kmers, encode_bases
from ploidyfrost_tpu.parallel.sharded import (
    build_sharded_count_step,
    build_sharded_em_step,
    init_sharded_table,
    make_mesh,
)


def _random_batch(rng, n_reads, length):
    reads = ["".join(rng.choice(list("ACGT"), size=length)) for _ in range(n_reads)]
    batch = np.full((n_reads, length), INVALID_BASE, np.uint8)
    for i, r in enumerate(reads):
        batch[i, : len(r)] = encode_bases(r)
    return reads, batch


@pytest.mark.parametrize("n_data,n_shard", [(2, 4), (1, 8), (4, 2)])
def test_sharded_count_matches_single_device(n_data, n_shard):
    if len(jax.devices()) < n_data * n_shard:
        pytest.skip("needs 8 devices")
    k = 7
    rng = np.random.default_rng(11)
    reads, batch = _random_batch(rng, 64, 50)

    mesh = make_mesh(n_data, n_shard)
    cap = 4096
    quota = batch.shape[0] * (batch.shape[1] - k + 1) // (n_data * n_shard)
    step = build_sharded_count_step(mesh, k, cap, quota)
    km, ct = init_sharded_table(mesh, cap)
    km, ct, hist, overflow, n_inst = step(batch, km, ct)
    assert not bool(overflow)

    ref = KmerCounter(k)
    ref.add_reads(batch)
    ref_km, ref_ct = ref.arrays()
    assert int(n_inst) == ref.total_kmers

    got = {}
    km_np, ct_np = np.asarray(km), np.asarray(ct)
    live = km_np != np.uint64(SENTINEL)
    for s, c in zip(decode_kmers(km_np[live], k), ct_np[live].tolist()):
        got[s] = got.get(s, 0) + c
    expect = dict(zip(decode_kmers(np.asarray(ref_km), k), np.asarray(ref_ct).tolist()))
    assert got == expect

    ref_hist = ref.histogram(255)
    np.testing.assert_array_equal(np.asarray(hist)[: len(ref_hist)], ref_hist)


def test_sharded_count_incremental_batches():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    k = 5
    rng = np.random.default_rng(3)
    mesh = make_mesh(2, 4)
    cap = 8192
    step = None
    km, ct = init_sharded_table(mesh, cap)
    ref = KmerCounter(k)
    for _ in range(3):
        reads, batch = _random_batch(rng, 32, 40)
        if step is None:
            quota = batch.shape[0] * (batch.shape[1] - k + 1) // 8
            step = build_sharded_count_step(mesh, k, cap, quota)
        km, ct, hist, overflow, _ = step(batch, km, ct)
        assert not bool(overflow)
        ref.add_reads(batch)
    km_np, ct_np = np.asarray(km), np.asarray(ct)
    live = km_np != np.uint64(SENTINEL)
    got = dict(zip(decode_kmers(km_np[live], k), ct_np[live].tolist()))
    ref_km, ref_ct = ref.arrays()
    expect = dict(zip(decode_kmers(np.asarray(ref_km), k), np.asarray(ref_ct).tolist()))
    assert got == expect


def test_sharded_em_matches_local():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from ploidyfrost_tpu.model.gmm import GmmModel

    rng = np.random.default_rng(5)
    n = 1024  # divisible by 8
    data = np.clip(rng.normal(0.5, 0.1, n), 0.01, 0.99)
    mesh = make_mesh(2, 4)
    step = build_sharded_em_step(mesh)
    m = GmmModel()
    m.read_data(data)
    m.resize(3)
    means = m.means.copy()
    w = m.weights.copy()
    v = m.vars.copy()
    mask = np.ones(n)
    for _ in range(3):
        v_s, w_s, ll = step(data, mask, means, w, v, 5.0, 2.0)
        m.em_step()
        np.testing.assert_allclose(np.asarray(w_s), m.weights, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(v_s), m.vars, rtol=1e-12)
        w, v = np.asarray(w_s), np.asarray(v_s)
