import os, sys, time, tempfile
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/.axon_site")
import numpy as np
import bench
from ploidyfrost_tpu.bubble.batched import find_superbubbles_device
from ploidyfrost_tpu.bubble.superbubble import write_superbubble_file
from ploidyfrost_tpu.kmer.countdb import KmerCountDB
from ploidyfrost_tpu.sites.emit_colored import (
    analyze_bubbles_colored, unitig_coverage_colored,
    window_coverage_colored, write_outputs_colored,
)
from ploidyfrost_tpu.util.jaxcache import warm_backend_async, wait_warm
warm_backend_async(search=True)

with tempfile.TemporaryDirectory() as wd:
    t0 = time.time()
    g, colors, paths, cutoffs = bench.colored_inputs(wd)
    print(f"gen: {time.time()-t0:.1f}s {len(g)} unitigs", flush=True)
    dbs = []
    for p in paths:
        z = np.load(p)
        dbs.append(KmerCountDB(z["kmers"], z["counts"], bench.K))
    os.chdir(wd)
    os.makedirs("PloidyFrost_output", exist_ok=True)
    wait_warm()
    for rep in range(2):
        t0 = time.time()
        state, bubbles = find_superbubbles_device(g, 8, colors)
        t1 = time.time()
        write_superbubble_file(g, bubbles, "b")
        t2 = time.time()
        umean, uok = unitig_coverage_colored(dbs, g, cutoffs)
        t3 = time.time()
        emissions, ws, wc = analyze_bubbles_colored(g, colors, state, umean, uok)
        t4 = time.time()
        wcov = window_coverage_colored(dbs, ws, cutoffs)
        t5 = time.time()
        stats = write_outputs_colored(emissions, wcov, wc, colors.n_colors, "b")
        t6 = time.time()
        print(f"rep{rep}: search {t1-t0:.1f} write_sb {t2-t1:.1f} ucov {t3-t2:.1f} "
              f"analyze {t4-t3:.1f} wcov {t5-t4:.1f} write {t6-t5:.1f} total {t6-t0:.1f}", flush=True)
