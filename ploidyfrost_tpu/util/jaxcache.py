"""Persistent JAX compilation cache for the device kernels.

The search and NW kernels are compiled once per (tier, chunk) shape;
on TPU backends the first compile is the expensive step (remote compile
at the production tier). Enabling jax's persistent cache makes every
warm process start instant. Opt out with PLOIDYFROST_JAX_CACHE=0.
"""

from __future__ import annotations

import atexit
import os
import threading
import time

_done = False
_warmed = False
_warm_lock = threading.Lock()
_warm_thread: threading.Thread | None = None
_shutdown = threading.Event()
_started = threading.Event()


@atexit.register
def _join_warm_at_exit() -> None:
    """A daemon thread killed mid-backend-init aborts the process
    (pthread cancellation through C++ frames -> SIGABRT at interpreter
    teardown). Signal shutdown; if the thread never reached jax it
    exits at the grace gate instantly. Mid-init the join is BOUNDED:
    the tunnel's first transfer can take minutes, and a short-lived CLI
    invocation must not hang at exit for that long — after the bound we
    accept the (rare) teardown abort of an already-failing process."""
    _shutdown.set()
    t = _warm_thread
    if t is None or not t.is_alive():
        return
    t.join(1.5 if not _started.is_set() else 10.0)


def warm_transfer() -> None:
    """One 4-byte device->host round-trip, once per process.

    On the axon TPU tunnel the FIRST device->host transfer of a process
    is pathologically slow — measured anywhere from 0.1 s to ~4 min,
    independent of transfer size or preceding host work (a tunnel-side
    one-time setup cost). Every device code path funnels through this
    before its first real result fetch, and the pipeline entry points
    run it in a background thread (warm_backend_async) so the cost
    overlaps the host-side build phases. This — not kernel compile —
    was the round-2 'compile stall': the search kernel compiled in ~2 s
    but its first result fetch hung."""
    global _warmed
    with _warm_lock:
        if _warmed:
            return
        _warmed = True
        try:
            import jax
            import jax.numpy as jnp
            import numpy as np

            np.asarray(jax.block_until_ready(jnp.zeros((1,), jnp.int32)))
        except Exception:
            pass


def warm_backend_async(search: bool = False) -> None:
    """Start backend init + first-transfer warmup in a daemon thread.

    Call at the top of every pipeline entry point that will eventually
    touch the device: the tunnel's one-time setup (GIL-released IO
    wait) then overlaps the host-side counting/graph-build phases
    instead of stalling the first device kernel. With ``search=True``
    (the analysis entry points only) the thread also pre-executes the
    superbubble search program at its standard accelerator tiers, so
    the analysis phase starts with the jit cache hot (trace +
    persistent-cache load + executable upload cost ~1.5 s that would
    otherwise land on the first search). Checks the shutdown flag
    between steps so an early process exit waits out at most one
    step."""
    global _warm_thread
    if _warm_thread is not None:
        return

    def _go():
        # grace gate: short-lived processes (arg errors, --help) exit
        # before the thread ever touches jax, so the atexit join below
        # returns immediately instead of waiting out a backend init
        for _ in range(10):
            time.sleep(0.1)
            if _shutdown.is_set():
                return
        _started.set()
        enable_compilation_cache()
        if not search or _shutdown.is_set():
            return
        try:
            import jax

            if jax.default_backend() == "cpu":
                return
            import jax.numpy as jnp

            from ..bubble.batched import (
                MAX_CHUNK,
                MAX_SEEN,
                MAX_STACK,
                MAX_STEPS,
                _build_search,
            )

            fn = _build_search(MAX_SEEN, MAX_STACK, MAX_STEPS)
            table = jnp.full((1 << 17, 2, 4), -1, jnp.int32)
            for chunk_w in (1 << 14, MAX_CHUNK):
                if _shutdown.is_set():
                    return
                jax.block_until_ready(
                    fn(jnp.zeros((chunk_w,), jnp.int32), table)
                )
        except Exception:
            pass  # warmup is best-effort, never load-bearing

    _warm_thread = threading.Thread(
        target=_go, daemon=True, name="pf-tpu-warm"
    )
    _warm_thread.start()


def wait_warm(timeout: float | None = None) -> None:
    """Block until the background warmup finishes (no-op if it never
    started). bench.py joins before its timed sections so measurements
    exclude the one-time environment setup, mirroring how the reference
    was measured (its binary compile is likewise excluded)."""
    if _warm_thread is not None:
        _warm_thread.join(timeout)


def enable_compilation_cache() -> None:
    global _done
    if _done:
        warm_transfer()
        return
    _done = True
    loc = os.environ.get("PLOIDYFROST_JAX_CACHE", "")
    if loc == "0":
        return
    if not loc:
        loc = os.path.join(
            os.path.expanduser("~"), ".cache", "ploidyfrost_jax"
        )
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", -1
        )
    except Exception:
        pass  # older jax or read-only home: run without the cache
    warm_transfer()
