"""Device mesh and sharding helpers — the framework's only "comm backend".

The reference is single-GPU with no distributed layer (SURVEY.md §2.3);
here scaling is native: one ``jax.sharding.Mesh`` with a ``data`` axis
(window/batch parallelism — the dominant axis for this workload, since the
CNNs are small and replicated). Everything routes through ``jax.jit`` with
``NamedSharding`` constraints; XLA inserts the ICI collectives (gradient
psum, eval all-gathers) automatically — there is no NCCL/MPI analogue to
manage.

Batch conventions:
  * target-like arrays [B, ...] shard on axis 0;
  * source-major arrays [S, B, ...] shard on axis 1;
  * parameters/optimizer state are replicated.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_DISTRIBUTED_STARTED = False


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Start the JAX multi-process runtime (coordination service) when a
    multi-host launch is configured; no-op otherwise.

    The reference has no distributed layer at all (SURVEY.md §5.8); this
    is the TPU-native N-host entry point. Configuration comes from
    explicit args or the standard env vars (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID`` — also set by TPU pod
    launchers automatically). Single-process runs (no coordinator
    configured, num_processes in (None, 1)) return False and leave the
    runtime untouched, so every code path that calls this degrades
    gracefully to the one-host case the tests exercise.

    Returns True iff ``jax.distributed.initialize`` was called.
    """
    global _DISTRIBUTED_STARTED
    if _DISTRIBUTED_STARTED:
        return True
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and (num_processes or 1) <= 1:
        return False  # single-process: nothing to start
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)
    _DISTRIBUTED_STARTED = True
    return True


def process_info() -> Tuple[int, int]:
    """(process_index, process_count) of this host."""
    return jax.process_index(), jax.process_count()

# keys whose batch dim is axis 1 (source-major packing)
_SOURCE_MAJOR = (
    "source_imgs", "source_imgs_aug", "gt_lie_alg", "gt_lie_alg_aug",
    "vo_lie_alg", "vo_lie_alg_aug", "dt",
)


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    """Build a 1-D (or reshaped) mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = np.asarray(devs[:n_devices])
    if len(axis_names) > 1:
        # fold into a grid: trailing axes get size 1 unless specified
        devs = devs.reshape((n_devices,) + (1,) * (len(axis_names) - 1))
    return Mesh(devs, axis_names)


def batch_sharding(mesh: Mesh, axis: int = 0,
                   data_axis: str = "data") -> NamedSharding:
    spec = [None] * (axis + 1)
    spec[axis] = data_axis
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Dict[str, np.ndarray],
                data_axis: str = "data") -> Dict[str, jax.Array]:
    """Device-put a host batch with the canonical shardings."""
    out = {}
    for k, v in batch.items():
        axis = 1 if k in _SOURCE_MAJOR else 0
        if v.ndim <= axis:
            out[k] = jax.device_put(v, replicated(mesh))
        else:
            out[k] = jax.device_put(v, batch_sharding(mesh, axis, data_axis))
    return out


def shard_process_local_batch(mesh: Mesh, batch: Dict[str, np.ndarray],
                              data_axis: str = "data") -> Dict[str, jax.Array]:
    """Assemble global sharded arrays from each host's *local* slice.

    Multi-host counterpart of :func:`shard_batch`: every process passes
    only its own batch rows (1/process_count of the global batch, from a
    process-sliced ``BatchLoader``) and gets back globally-addressable
    jax.Arrays via ``jax.make_array_from_process_local_data``. In a
    single-process run this is the identity case (local == global) —
    the path the CPU tests and ``dryrun_multichip`` exercise.

    Replicated entries (scalars / sub-batch-rank arrays) must be
    identical across processes; they are device_put replicated.
    """
    out: Dict[str, jax.Array] = {}
    for k, v in batch.items():
        axis = 1 if k in _SOURCE_MAJOR else 0
        if v.ndim <= axis:
            out[k] = jax.device_put(v, replicated(mesh))
        else:
            sharding = batch_sharding(mesh, axis, data_axis)
            global_shape = (v.shape[:axis]
                            + (v.shape[axis] * jax.process_count(),)
                            + v.shape[axis + 1:])
            out[k] = jax.make_array_from_process_local_data(
                sharding, np.ascontiguousarray(v), global_shape)
    return out


def batch_spec(key: str, ndim: int, data_axis: str = "data") -> P:
    axis = 1 if key in _SOURCE_MAJOR else 0
    if ndim <= axis:
        return P()
    spec = [None] * ndim
    spec[axis] = data_axis
    return P(*spec)
