"""Multi-host counting worker (spawned by test_multihost.py).

One OS process = one "host": PLOIDYFROST_COORDINATOR et al. drive
jax.distributed.initialize through parallel.mesh.maybe_distributed_init,
the mesh spans both processes (2 procs x 4 CPU devices = 8), and the
sharded counter runs with cross-process collectives (Gloo — the CPU
stand-in for DCN). Process 0 writes the histogram + sorted table; the
parent compares them byte-for-byte against a single-process 8-device
run of the identical batches.

Usage: python tests/mh_worker.py <reads.npz> <out_prefix>
"""

import sys

import numpy as np


def main() -> int:
    reads_npz, outpre = sys.argv[1], sys.argv[2]
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from ploidyfrost_tpu.parallel.mesh import maybe_distributed_init
    from ploidyfrost_tpu.parallel.sharded import (
        ShardedKmerCounter,
        balanced_mesh,
    )

    assert maybe_distributed_init(), "worker requires coordinator env"
    import jax

    mesh = balanced_mesh(len(jax.devices()))
    z = np.load(reads_npz)
    k = int(z["k"])
    counter = ShardedKmerCounter(mesh, k, initial_capacity=1 << 14)
    for name in sorted(n for n in z.files if n.startswith("batch")):
        counter.add_reads(z[name])
    km, ct = counter.arrays()
    if jax.process_index() == 0:
        counter.write_histogram(outpre + ".hist.txt", max_cov=1000)
        np.savez(outpre + ".kmers.npz", kmers=km, counts=ct, k=k)
    # every process must reach finalization before the coordinator exits
    jax.experimental.multihost_utils.sync_global_devices("done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
