"""Measure the reference binary on the bench2m-colored dataset.

Generates the EXACT dataset bench.py's colored_inputs produces (seed
11, 3 samples, 2 Mbp shared genome), serializes it through our KMC1 +
.bfg_colors + DA-tagged GFA writers, runs the reference PloidyFrost
(-g -f -d -C -t 1), and reports its phase timings — the
BASELINE_COLORED_PER_S anchor recorded in BASELINE.md.
"""
import os, re, subprocess, sys, tempfile, time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("PLOIDYFROST_DEVICES", "1")
import numpy as np

REFBIN = "/root/repo/.refbuild/PloidyFrost"

import bench
from ploidyfrost_tpu.io.bfg import write_bfg_colors
from ploidyfrost_tpu.io.kmc import write_kmc_db

with tempfile.TemporaryDirectory() as td:
    g, colors, paths, cutoffs = bench.colored_inputs(td)
    print(f"{len(g)} unitigs, {colors.n_colors} colors", flush=True)
    os.chdir(td)
    da = write_bfg_colors("ref.bfg_colors", g, colors)
    g.write_gfa("ref.gfa", da_ids=da)
    with open("list.txt", "w") as f:
        for i, p in enumerate(paths):
            z = np.load(p)
            write_kmc_db(f"c{i}db", z["kmers"], z["counts"], 25)
            f.write(f"c{i}db\n")
    with open("cov.txt", "w") as f:
        for lo, up in cutoffs:
            f.write(f"{lo}\t{up}\n")
    t0 = time.time()
    r = subprocess.run(
        [REFBIN, "-g", "ref.gfa", "-f", "ref.bfg_colors", "-d", "list.txt",
         "-C", "cov.txt", "-t", "1", "-o", "refc"],
        capture_output=True, text=True, timeout=3600,
    )
    wall = time.time() - t0
    print(r.stdout[-3000:])
    print(r.stderr[-2000:])
    print(f"rc={r.returncode} total wall: {wall:.1f}s", flush=True)
    # bubbles + sites: same accounting as our stats["allele"] (the
    # reference prints the identical allele-class histogram line)
    nb = sum(1 for _ in open("PloidyFrost_output/refc_super_bubble.txt")) - 1
    m = re.search(
        r"Alleles in SuperBubbles\s*:\s*2 :(\d+)\s*3 :(\d+)\s*4 :(\d+)\s*5 :(\d+)",
        r.stdout,
    )
    ns = sum(int(x) for x in m.groups()) if m else -1
    print(f"bubbles={nb} sites={ns}")
