"""Probe: tunnel h2d/d2h bandwidth + XLA TPU sort throughput at
construction-relevant sizes."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

dev = jax.devices()[0]
print("backend:", dev)

# warm first transfer
np.asarray(jax.block_until_ready(jnp.zeros((1,), jnp.int32)))

for mb in (64, 256, 1024):
    n = mb * (1 << 20) // 4
    x = np.arange(n, dtype=np.uint32)
    t0 = time.perf_counter()
    d = jax.device_put(x, dev)
    jax.block_until_ready(d)
    t1 = time.perf_counter()
    h = np.asarray(d)
    t2 = time.perf_counter()
    print(f"{mb} MB: h2d {mb/(t1-t0):.0f} MB/s  d2h {mb/(t2-t1):.0f} MB/s", flush=True)

# sort throughput: 4-operand u32 sort at 2^27 (~134M)
for logn in (24, 27):
    n = 1 << logn
    rng = np.random.default_rng(0)
    ops = [jax.device_put(rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32), dev) for _ in range(4)]
    f = jax.jit(lambda a, b, c, d: jax.lax.sort((a, b, c, d), num_keys=2))
    jax.block_until_ready(f(*ops))  # compile
    t0 = time.perf_counter()
    out = f(*ops)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"sort 4xu32 n=2^{logn}: {dt:.2f}s ({dt/n*1e9:.2f} ns/elt)", flush=True)
