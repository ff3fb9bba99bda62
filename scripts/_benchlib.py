"""Shared TPU measurement helpers for the profiling scripts.

One home for the remote-tunnel methodology (persistent compile cache
setup; scalar-fetch-forced completion with noop-latency subtraction —
``block_until_ready`` does not wait under the tunnel) so
profile_components.py and bench_refiners.py cannot drift. bench.py stays
deliberately self-contained: it is the file the round driver executes
and must keep working from any cwd with zero intra-repo imports beyond
the package.
"""

from __future__ import annotations

import os
import time


def setup_cache() -> None:
    """Enable the persistent compile cache (config.update, NOT just the
    env var — the env-var path is silently inert on this backend)."""
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser("~/.jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def make_noop():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def noop(x):
        return x + 1.0

    float(noop(jnp.float32(0.0)))        # compile
    return lambda: float(noop(jnp.float32(0.0)))


def measure_latency(noop, reps: int = 3) -> float:
    """Dispatch+fetch round-trip of a trivial kernel (subtract this)."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        noop()
        best = min(best, time.perf_counter() - t0)
    return best


def measure_best(fetch, reps: int, latency: float = 0.0) -> float:
    """Best-of-N wall time of ``fetch()`` (a call that forces completion
    by fetching a scalar), minus the measured tunnel latency."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch()
        best = min(best, time.perf_counter() - t0)
    return max(best - latency, 0.0)
