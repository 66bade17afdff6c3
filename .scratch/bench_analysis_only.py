import sys, tempfile
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/.axon_site")
import bench
from ploidyfrost_tpu.util.jaxcache import warm_backend_async
warm_backend_async(search=True)
bench.N_RUNS = 5
with tempfile.TemporaryDirectory() as wd:
    wall, thr = bench.bench_analysis(wd)
    print(wall); print(thr)
