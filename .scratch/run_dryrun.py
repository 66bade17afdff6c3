import os, sys, time
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")
from __graft_entry__ import dryrun_multichip
t0=time.time()
dryrun_multichip(8)
print(f"total {time.time()-t0:.1f}s")
