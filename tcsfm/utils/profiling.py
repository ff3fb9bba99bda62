"""Profiling and numerical-debugging hooks (SURVEY.md §5.1-5.2).

The reference has only wall-clock prints (train_mono.py:146,196); here:
  * ``trace(logdir)`` — jax.profiler context for TensorBoard-viewable
    device traces of any region (training steps, PFT windows, eval).
  * ``enable_nan_debugging()`` — opt-in jax NaN checking (the TPU-world
    sanitizer analogue; deterministic PRNG threading is structural in
    this codebase, so there is no torch-style nondeterminism to guard).
  * ``time_region`` — host-side timing that forces completion through a
    scalar fetch (``block_until_ready`` is a no-op under remote-tunnel
    runtimes — measured; see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging() -> None:
    import jax

    jax.config.update("jax_debug_nans", True)


@contextlib.contextmanager
def time_region(name: str, result_holder: Optional[dict] = None
                ) -> Iterator[None]:
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if result_holder is not None:
            result_holder[name] = dt
        print(f"[tcsfm.profiling] {name}: {dt * 1000:.2f} ms")


def force_completion(tree) -> float:
    """Force device completion by fetching a scalar reduction; returns it."""
    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(tree)
    total = 0.0
    for leaf in leaves:
        total += float(jnp.sum(leaf))
    return total
