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

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

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


def batch_spec(key: str, ndim: int, data_axis: str = "data") -> P:
    axis = 1 if key in _SOURCE_MAJOR else 0
    if ndim <= axis:
        return P()
    spec = [None] * ndim
    spec[axis] = data_axis
    return P(*spec)
