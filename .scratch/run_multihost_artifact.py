"""Produce MULTIHOST_r05.json: run the 2-process x 4-device distributed
counting drill (tests/mh_worker.py) against a single-process 8-device
run and record byte-parity of table + histogram."""
import json, os, socket, subprocess, sys, tempfile, time
sys.path.insert(0, "/root/repo")
import numpy as np

def free_port():
    s = socket.socket(); s.bind(("127.0.0.1", 0)); p = s.getsockname()[1]; s.close(); return p

with tempfile.TemporaryDirectory() as td:
    rng = np.random.default_rng(17); G = 400_000
    genome = rng.integers(0, 4, G).astype(np.uint8)
    batches = {f"batch{i}": np.stack([genome[s:s+100] for s in rng.integers(0, G-100, 4096)]) for i in range(4)}
    reads = os.path.join(td, "reads.npz"); np.savez(reads, k=25, **batches)
    # single-process
    env1 = dict(os.environ, PYTHONPATH="/root/repo")
    env1["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    code = ("import jax,sys,numpy as np; jax.config.update('jax_platforms','cpu');"
            "sys.path.insert(0,'/root/repo');"
            "from ploidyfrost_tpu.parallel.sharded import ShardedKmerCounter, balanced_mesh;"
            "z=np.load(sys.argv[1]); m=balanced_mesh(8);"
            "c=ShardedKmerCounter(m,int(z['k']),initial_capacity=1<<14);"
            "[c.add_reads(z[n]) for n in sorted(x for x in z.files if x.startswith('batch'))];"
            "km,ct=c.arrays(); c.write_histogram(sys.argv[2]+'.hist.txt',max_cov=1000);"
            "np.savez(sys.argv[2]+'.kmers.npz',kmers=km,counts=ct,k=int(z['k']))")
    t0=time.time()
    r = subprocess.run([sys.executable,"-c",code,reads,os.path.join(td,"single")],env=env1,capture_output=True,timeout=420)
    assert r.returncode==0, r.stderr.decode()
    t_single=time.time()-t0
    port = free_port(); t0=time.time(); procs=[]
    for pid in range(2):
        env = dict(os.environ, PYTHONPATH="/root/repo",
                   PLOIDYFROST_COORDINATOR=f"127.0.0.1:{port}",
                   PLOIDYFROST_NUM_PROCESSES="2", PLOIDYFROST_PROCESS_ID=str(pid),
                   PLOIDYFROST_LOCAL_DEVICES="4")
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen([sys.executable,"/root/repo/tests/mh_worker.py",reads,os.path.join(td,"multi")],env=env,stdout=subprocess.PIPE,stderr=subprocess.STDOUT))
    outs=[p.communicate(timeout=420)[0] for p in procs]
    assert all(p.returncode==0 for p in procs), b"\n".join(outs).decode(errors="replace")
    t_multi=time.time()-t0
    z1=np.load(os.path.join(td,"single.kmers.npz")); z2=np.load(os.path.join(td,"multi.kmers.npz"))
    table_ok = bool(np.array_equal(z1["kmers"],z2["kmers"]) and np.array_equal(z1["counts"],z2["counts"]))
    hist_ok = open(os.path.join(td,"single.hist.txt"),"rb").read()==open(os.path.join(td,"multi.hist.txt"),"rb").read()
    rec = {"round": 5, "ok": table_ok and hist_ok, "processes": 2,
           "devices_per_process": 4, "global_devices": 8,
           "backend": "cpu (Gloo cross-process collectives standing in for DCN)",
           "distinct_kmers": int(len(z1["kmers"])),
           "table_byte_identical": table_ok, "histogram_byte_identical": hist_ok,
           "wall_s": {"single_process": round(t_single,1), "two_process": round(t_multi,1)},
           "entry": "jax.distributed via parallel/mesh.maybe_distributed_init (PLOIDYFROST_COORDINATOR env); CLI `count` path covered by tests/test_multihost.py::test_cli_count_two_processes"}
    print(json.dumps(rec, indent=1))
    with open("/root/repo/MULTIHOST_r05.json","w") as f: json.dump(rec,f,indent=1)
