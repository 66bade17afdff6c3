import os, sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
os.environ.setdefault("PLOIDYFROST_DEVICES", "1")
import jax; jax.config.update("jax_platforms", "cpu")
from test_golden_indel import make_indel_reads, prepare_inputs
d = "/tmp/indel_mine"
os.makedirs(d, exist_ok=True)
os.chdir(d)
if not os.path.exists("reads.fa"):
    make_indel_reads("reads.fa")
_, _, lower, upper = prepare_inputs(d)
print("cutoffs", lower, upper)
from ploidyfrost_tpu.cli import Options
from ploidyfrost_tpu.pipeline import run_analysis
opt = Options(); opt.graphfile = "mygraph.gfa"; opt.db = "mydb.npz"
opt.outprefix = "gold"; opt.coverage_lower = lower; opt.coverage_upper = upper
assert run_analysis(opt) == 0
