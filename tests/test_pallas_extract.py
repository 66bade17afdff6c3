"""Pallas canonical-extraction kernel parity vs the jnp path.

Runs the kernel in interpreter mode (tests force the CPU backend); the
compiled TPU path is exercised by bench.py and the CLI on hardware.
"""

import numpy as np
import pytest

from ploidyfrost_tpu.kmer.count import _extract
from ploidyfrost_tpu.kmer.pallas_extract import extract_canonical


@pytest.mark.parametrize("k", [5, 16, 17, 25, 31])
def test_parity_random(k):
    rng = np.random.default_rng(k)
    codes = rng.integers(0, 5, size=(16, 64)).astype(np.uint8)  # incl. N
    h1, l1, n1 = (np.asarray(x) for x in _extract(codes, k))
    h2, l2, n2 = (np.asarray(x) for x in extract_canonical(codes, k, interpret=True))
    np.testing.assert_array_equal(h1, h2)
    np.testing.assert_array_equal(l1, l2)
    assert int(n1) == int(n2)


def test_all_invalid_rows():
    codes = np.full((8, 40), 4, dtype=np.uint8)
    h, l, n = extract_canonical(codes, 25, interpret=True)
    assert int(n) == 0
    assert (np.asarray(h) == 0xFFFFFFFF).all()
    assert (np.asarray(l) == 0xFFFFFFFF).all()


def test_odd_batch_rows():
    # batch not divisible by the preferred tile: falls back to smaller tile
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=(24, 51)).astype(np.uint8)
    h1, l1, n1 = (np.asarray(x) for x in _extract(codes, 25))
    h2, l2, n2 = (np.asarray(x) for x in extract_canonical(codes, 25, interpret=True))
    np.testing.assert_array_equal(h1, h2)
    np.testing.assert_array_equal(l1, l2)
    assert int(n1) == int(n2)


def test_counter_dispatch_gate():
    """add_reads routes through the Pallas step only on a real TPU
    backend with tile-compatible batches."""
    from ploidyfrost_tpu.kmer.count import _extract_backend
    from ploidyfrost_tpu.kmer.pallas_extract import supported

    assert _extract_backend((16383, 151), 25) is False  # odd batch
    assert supported(16384, 151, 25) is True
    assert supported(4096, 512, 25) is True  # drops to the 256 tile
    assert supported(128, 4000, 25) is False  # exceeds the VMEM budget
    # on the CPU test backend the gate must be off regardless
    import jax

    if jax.default_backend() != "tpu":
        assert _extract_backend((16384, 151), 25) is False


def test_real_tpu_parity():
    """Real-hardware (non-interpret) kernel parity — runs only when the
    session backend is a TPU; guards against Mosaic lowering bugs like
    the lane-slide miscompile this kernel works around."""
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend in this session")
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 5, size=(1024, 151)).astype(np.uint8)
    h1, l1, n1 = (np.asarray(x) for x in _extract(codes, 25))
    h2, l2, n2 = (np.asarray(x) for x in extract_canonical(codes, 25))
    np.testing.assert_array_equal(h1, h2)
    np.testing.assert_array_equal(l1, l2)
    assert int(n1) == int(n2)
