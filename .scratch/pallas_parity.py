"""Real-TPU Pallas extraction parity artifact (VERDICT r3 weak #6).

Asserts k-mer-for-k-mer equality of the fused Pallas extraction kernel
against the XLA u64 path ON THE REAL TPU, across shapes and edge cases,
and writes PALLAS_PARITY_r04.txt at the repo root.
"""
import sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/.axon_site")
import numpy as np
import jax
import jax.numpy as jnp

from ploidyfrost_tpu.kmer.count import SENT32, _extract_append, _extract_append_pallas
from ploidyfrost_tpu.kmer.pallas_extract import supported

dev = jax.devices()[0]
assert "TPU" in str(dev), f"not a TPU: {dev}"
rng = np.random.default_rng(0)
lines = [f"device: {dev}", f"jax {jax.__version__}"]
checked = 0
for (B, L, k) in ((16384, 160, 25), (4096, 512, 25), (512, 151, 31), (4096, 160, 15)):
    if not supported(B, L, k):
        lines.append(f"B={B} L={L} k={k}: kernel shape unsupported, skipped")
        continue
    codes = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    # edge cases: Ns sprinkled, padded tails, all-invalid rows
    codes[rng.random((B, L)) < 0.001] = 4
    codes[1, :] = 4
    codes[2, L // 2 :] = 4
    cap = B * (L - k + 1)

    def run(step):
        bhi = jnp.full((cap,), SENT32, dtype=jnp.uint32)
        blo = jnp.full((cap,), SENT32, dtype=jnp.uint32)
        nv = jnp.zeros((), dtype=jnp.int64)
        out = step(bhi, blo, nv, jnp.asarray(codes), jnp.int32(0), k, False)
        return [np.asarray(x) for x in jax.block_until_ready(out)]

    a = run(_extract_append)
    b = run(_extract_append_pallas)
    same_hi = (a[0] == b[0]).all()
    same_lo = (a[1] == b[1]).all()
    same_nv = int(a[2]) == int(b[2])
    ok = bool(same_hi and same_lo and same_nv)
    lines.append(
        f"B={B} L={L} k={k}: {cap} windows, valid={int(a[2])}, "
        f"hi_equal={bool(same_hi)} lo_equal={bool(same_lo)} nv_equal={same_nv}"
    )
    assert ok, f"PALLAS MISMATCH at B={B} L={L} k={k}"
    checked += cap

lines.append(f"TOTAL windows compared element-for-element: {checked}")
lines.append("RESULT: PASS — Pallas extraction is bit-identical to the XLA path on TPU")
with open("/root/repo/PALLAS_PARITY_r04.txt", "w") as f:
    f.write("\n".join(lines) + "\n")
print("\n".join(lines))
