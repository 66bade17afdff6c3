import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
from ploidyfrost_tpu.io.fastx import read_batches
from ploidyfrost_tpu.io.trim import TrimConfig

fq = "/root/repo/.scratch/bench/reads5m.fq"
if not os.path.exists(fq):
    rng = np.random.default_rng(7)
    G = 5_000_000
    g1 = rng.integers(0, 4, G).astype(np.uint8)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    L = 150
    n = 25 * G // L
    with open(fq, "w") as f:
        starts = rng.integers(0, G - L, n)
        quals = (33 + rng.integers(28, 41, (n, L))).astype(np.uint8)
        # 20% of reads get a low-quality tail (what trimming is for)
        tail = rng.random(n) < 0.2
        tl = rng.integers(5, 40, n)
        for i in np.flatnonzero(tail):
            quals[i, L - tl[i]:] = 33 + rng.integers(2, 12, tl[i])
        for i, s in enumerate(starts):
            f.write(f"@r{i}\n{bases[g1[s:s+L]].tobytes().decode()}\n+\n{quals[i].tobytes().decode()}\n")
    print("generated", flush=True)

for label, trim in (("untrimmed", None), ("trimmed", TrimConfig())):
    for rep in range(2):
        t0 = time.time()
        nb = 0
        for b in read_batches([fq], 25, trim=trim):
            nb += 1
        print(f"{label} rep{rep}: {time.time()-t0:.1f}s ({nb} batches)", flush=True)
