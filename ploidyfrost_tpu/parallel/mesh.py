"""User-facing mesh selection: the `--devices[=N]` CLI flag.

The reference exposes its parallelism as `-t <threads>` on every driver
entry point (src/Main.cpp:124, plumbed through src/CDBG.cpp:1707-2642).
Our parallel axis is the device mesh, and this module is the single
switch that routes the CLI's compute stages (counting, superbubble
search, EM) through the sharded implementations in parallel/sharded.py.

Resolution order:

  * ``--devices=N`` — use the first N of jax.devices() as a
    balanced (data, shard) mesh; N must not exceed the device count.
    ``--devices=1`` forces the single-device path.
  * ``--devices`` (bare) or no flag — AUTO: all visible devices when
    there is more than one, else the single-device path. So a pod
    slice parallelizes out of the box, and a single chip never pays
    shard_map overhead.

`set_mesh_spec` is called once by cli.main() after stripping the flag
(and by tests / the driver dryrun); `resolve_mesh` is consulted by the
pipeline stages. The mesh is cached: every stage of one invocation uses
the same mesh object.
"""

from __future__ import annotations

_spec: int | str | None = None  # None = not yet resolved (env/auto)
_cached = False
_mesh = None
_dist_initialized = False


def maybe_distributed_init() -> bool:
    """Multi-HOST initialization (SURVEY §5: JAX collectives over ICI
    within a slice, DCN across hosts). Env-driven, one call per process:

        PLOIDYFROST_COORDINATOR   host:port of process 0
        PLOIDYFROST_NUM_PROCESSES total process count
        PLOIDYFROST_PROCESS_ID    this process's rank
        PLOIDYFROST_LOCAL_DEVICES (optional) per-process CPU device
                                  count — CPU-mesh testing of the
                                  multi-host path without N real hosts

    When PLOIDYFROST_COORDINATOR is unset this is a no-op (single
    process). After it runs, jax.devices() is the GLOBAL device list
    and resolve_mesh() builds a process-spanning mesh; cross-host
    collectives ride the distributed backend (Gloo on CPU, DCN on TPU
    pods). Returns True when running multi-process."""
    global _dist_initialized
    import os

    coord = os.environ.get("PLOIDYFROST_COORDINATOR")
    if not coord:
        return False
    if _dist_initialized:
        return True
    import jax

    local = os.environ.get("PLOIDYFROST_LOCAL_DEVICES")
    if local:
        # CPU-backend drill: force platform before backend init (the
        # axon plugin otherwise wins regardless of JAX_PLATFORMS)
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", int(local))
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(os.environ["PLOIDYFROST_NUM_PROCESSES"]),
        process_id=int(os.environ["PLOIDYFROST_PROCESS_ID"]),
    )
    _dist_initialized = True
    return True


def set_mesh_spec(spec: int | str | None) -> None:
    """spec: int device count, "auto", or None. None defers to the
    PLOIDYFROST_DEVICES env var (int or "auto"), defaulting to auto —
    so the flag wins, then the environment, then auto-detection."""
    global _spec, _cached, _mesh
    if spec is None:
        import os

        env = os.environ.get("PLOIDYFROST_DEVICES", "auto")
        spec = env if env == "auto" else int(env)
    _spec = spec
    _cached = False
    _mesh = None


def is_primary() -> bool:
    """True on the artifact-writing process (process 0, or always in
    single-process mode). Multi-host CLI runs share a filesystem; every
    process computes the identical finalized tables, but only the
    primary writes them."""
    maybe_distributed_init()
    import jax

    return jax.process_index() == 0


def extract_devices_flag(argv: list[str]):
    """Strip ``--devices[=N]`` from argv; return (argv, spec)."""
    out: list[str] = []
    spec: int | str | None = None
    for a in argv:
        if a == "--devices":
            spec = "auto"
        elif a.startswith("--devices="):
            v = a[len("--devices=") :]
            try:
                spec = int(v)
            except ValueError:
                raise SystemExit(
                    f"Error: --devices expects an integer, got '{v}'"
                ) from None
            if spec < 1:
                raise SystemExit("Error: --devices must be >= 1")
        else:
            out.append(a)
    return out, spec


def resolve_mesh():
    """The mesh for this invocation, or None for the single-device path.

    Caches the answer (building a Mesh initializes the backend)."""
    global _cached, _mesh
    if _spec is None:
        set_mesh_spec(None)
    if _cached:
        return _mesh
    _cached = True
    maybe_distributed_init()
    import jax

    from .sharded import balanced_mesh

    n_avail = len(jax.devices())
    if _spec == "auto":
        n = n_avail if n_avail > 1 else 1
    else:
        n = int(_spec)
        if n > n_avail:
            raise SystemExit(
                f"Error: --devices={n} but only {n_avail} devices visible"
            )
    _mesh = balanced_mesh(n) if n > 1 else None
    return _mesh


def make_counter(k: int, **kw):
    """A KmerCounter (single device) or ShardedKmerCounter (mesh) with
    the same surface — the pipeline entry points stay mesh-agnostic.

    PLOIDYFROST_TABLE_INIT overrides the initial global table capacity
    (power-of-two slots); the driver dryrun shrinks it to force the
    grow-and-resume path at modest dataset sizes."""
    import os

    env_cap = os.environ.get("PLOIDYFROST_TABLE_INIT")
    if env_cap and "initial_capacity" not in kw:
        kw["initial_capacity"] = int(env_cap)
    mesh = resolve_mesh()
    if mesh is not None:
        from .sharded import ShardedKmerCounter

        return ShardedKmerCounter(mesh, k, **kw)
    import jax

    from ..kmer.count import KmerCounter

    if jax.default_backend() != "cpu":
        # accelerator HBM is plentiful: a big instance buffer amortizes
        # collapses (the whole-genome ingest then collapses ~5 times
        # instead of ~50) and a genome-scale initial table skips the
        # early growth-replay ladder
        kw.setdefault("initial_capacity", 8 << 20)
        kw.setdefault("buffer_capacity", 192 << 20)
    return KmerCounter(k, **kw)
