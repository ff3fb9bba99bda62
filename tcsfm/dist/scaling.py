"""Scaling-efficiency harness: frames/s of the DP training step vs device
count (BASELINE.json north star: >=80% efficiency 1 chip -> N hosts).

The reference has nothing to measure here (single GPU, SURVEY.md §2.3).
This harness runs the full jitted train step — depth net → coupled solver
→ loss → grads → Adam — on meshes of increasing size with a fixed
per-device batch (weak scaling), through the *multi-host code path*
(process-sliced loader rows + ``shard_process_local_batch``), so the same
function measures a virtual CPU mesh today and a real pod later.

On a virtual CPU mesh (``--xla_force_host_platform_device_count``) the
absolute numbers are meaningless — all "devices" share host cores — so
tests assert plumbing (runs, finite, batch scales), not efficiency; on
real hardware the efficiency column is the deliverable.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

from tcsfm.config import Config
from tcsfm.dist.mesh import (initialize_distributed, make_mesh,
                             shard_process_local_batch)


def _example_batch(b, s, h, w, seed=0):
    rng = np.random.RandomState(seed)
    K = np.array([[0.6 * w, 0, w / 2], [0, 0.6 * w, h / 2.5], [0, 0, 1]],
                 np.float32)
    return {
        "target_img": rng.rand(b, h, w, 3).astype(np.float32),
        "target_img_aug": rng.rand(b, h, w, 3).astype(np.float32),
        "source_imgs": rng.rand(s, b, h, w, 3).astype(np.float32),
        "source_imgs_aug": rng.rand(s, b, h, w, 3).astype(np.float32),
        "intrinsics": np.broadcast_to(K, (b, 3, 3)).copy(),
        "intrinsics_aug": np.broadcast_to(K, (b, 3, 3)).copy(),
        "gt_lie_alg": np.zeros((s, b, 6), np.float32),
        "gt_lie_alg_aug": np.zeros((s, b, 6), np.float32),
        "vo_lie_alg": np.zeros((s, b, 6), np.float32),
        "vo_lie_alg_aug": np.zeros((s, b, 6), np.float32),
        "dt": np.full((s, b), 0.1, np.float32),
    }


def measure_scaling(device_counts: Optional[Sequence[int]] = None,
                    batch_per_device: int = 2,
                    image_hw=(32, 64), iterations: int = 2,
                    timed_steps: int = 3, sources: int = 2,
                    compute_dtype: str = "float32",
                    verbose: bool = True) -> List[Dict]:
    """Weak-scaling curve of the DP train step.

    Returns one dict per mesh size: {n_devices, global_batch, frames_per_s,
    efficiency} where efficiency = (f/s at n) / (n * f/s at counts[0]).
    """
    from tcsfm.train.trainer import create_train_state, make_train_step

    initialize_distributed()  # no-op single-process; starts runtime on pods
    n_avail = len(jax.devices())
    if device_counts is None:
        device_counts = [n for n in (1, 2, 4, 8, 16) if n <= n_avail]
    h, w = image_hw

    rows: List[Dict] = []
    base_fps = None
    for n in device_counts:
        assert n <= n_avail, f"{n} devices requested, {n_avail} available"
        b_global = batch_per_device * n
        # each process feeds its local rows; single-process == all rows
        b_local = b_global // jax.process_count()
        cfg = Config(iterations=iterations, num_scales=1,
                     minibatch=b_global, compute_dtype=compute_dtype,
                     mesh_shape=(n,))
        state, depth_model, pose_model = create_train_state(
            cfg, jax.random.PRNGKey(0), steps_per_epoch=100)
        mesh = make_mesh(n)
        step = make_train_step(cfg, depth_model, pose_model)
        batch = shard_process_local_batch(
            mesh, _example_batch(b_local, sources, h, w))

        state, losses = step(state, batch)      # compile + warmup
        float(losses["total"])                  # force completion
        t0 = time.perf_counter()
        for _ in range(timed_steps):
            state, losses = step(state, batch)
        total = float(losses["total"])          # fetch forces the chain
        dt = (time.perf_counter() - t0) / timed_steps
        assert np.isfinite(total), f"non-finite loss at n={n}"

        fps = b_global / dt
        if base_fps is None:
            base_fps = fps / device_counts[0]
        eff = fps / (n * base_fps)
        rows.append({"n_devices": n, "global_batch": b_global,
                     "step_ms": dt * 1e3, "frames_per_s": fps,
                     "efficiency": eff})
        if verbose:
            print(f"n={n:3d}  batch={b_global:3d}  {dt*1e3:7.1f} ms/step  "
                  f"{fps:8.1f} f/s  eff={eff:.2f}", flush=True)
    return rows


if __name__ == "__main__":
    measure_scaling()
