"""Reads for the construction benchmark: diploid genome (seed 7, same
recipe as bench5m), 150bp reads at 25x total, FASTA."""
import sys
import numpy as np

G = int(sys.argv[1]); out = sys.argv[2]; depth = int(sys.argv[3]) if len(sys.argv)>3 else 25
rng = np.random.default_rng(7)
g1 = rng.integers(0, 4, G).astype(np.uint8)
g2 = g1.copy()
snp = rng.random(G) < 0.01
g2[snp] = (g2[snp] + rng.integers(1, 4, snp.sum())) % 4
bases = np.frombuffer(b"ACGT", dtype=np.uint8)
L = 150
n_per_hap = depth * G // (2 * L)
with open(out, "w") as f:
    n = 0
    for hap in (g1, g2):
        starts = rng.integers(0, G - L, n_per_hap)
        for s in starts:
            n += 1
            f.write(f">r{n}\n" + bases[hap[s:s+L]].tobytes().decode() + "\n")
print(f"{n} reads, {n*L/1e6:.0f} Mbp")
