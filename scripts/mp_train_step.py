#!/usr/bin/env python
"""Multi-PROCESS launch of the data-parallel training step on CPU devices.

Executes the real multi-host code path — ``jax.distributed.initialize``
with a coordinator, process-sliced batch rows, global-array assembly via
``shard_process_local_batch``, cross-process collectives in the jitted
train step — with N local processes standing in for N hosts
(``--xla_force_host_platform_device_count`` gives each process its own
CPU "chips"). The reference has no distributed layer at all
(SURVEY.md §2.3/§5.8); this is the launch-shaped proof that the
scaffolding in tcsfm/dist/mesh.py works with process_count > 1, not just
in its 1-process degenerate case.

Usage (parent — spawns children + a 1-process reference and asserts loss
parity):

    python scripts/mp_train_step.py --procs 2 --devices_per_proc 2

Exit code 0 iff every process ran the step and the multi-process loss
matches the single-process loss on the identical global batch.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys

import numpy as np

# repo root importable when run as scripts/mp_train_step.py
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GLOBAL_SEED = 0
H, W, S = 32, 64, 2


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _slice_local(batch, pid: int, pcnt: int):
    """This process's contiguous rows of the global batch — the same
    slicing a process-sliced BatchLoader yields (data/loader.py)."""
    from tcsfm.dist.mesh import _SOURCE_MAJOR

    out = {}
    for k, v in batch.items():
        axis = 1 if k in _SOURCE_MAJOR else 0
        bl = v.shape[axis] // pcnt
        idx = [slice(None)] * v.ndim
        idx[axis] = slice(pid * bl, (pid + 1) * bl)
        out[k] = np.ascontiguousarray(v[tuple(idx)])
    return out


def run_step(global_batch_size: int) -> float:
    """One DP train step over ALL global devices; returns the loss.

    Works for any process_count: each process feeds its local slice
    through ``shard_process_local_batch`` (identity when pcnt == 1).
    """
    import jax

    # the environment's sitecustomize registers the TPU-tunnel plugin at
    # interpreter start, so JAX_PLATFORMS in the env is too late —
    # config.update is the reliable switch (same note as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

    from tcsfm.config import Config
    from tcsfm.dist.mesh import (initialize_distributed, make_mesh,
                                 process_info, replicated,
                                 shard_process_local_batch)
    from tcsfm.dist.scaling import _example_batch
    from tcsfm.train.trainer import create_train_state, make_train_step

    initialize_distributed()        # env-configured; no-op for 1 process
    pid, pcnt = process_info()
    n_dev = len(jax.devices())

    cfg = Config(iterations=2, num_scales=1, minibatch=global_batch_size,
                 compute_dtype="float32", mesh_shape=(n_dev,))
    state, depth_model, pose_model = create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=10)
    mesh = make_mesh(n_dev)

    # params/opt state replicate across every process's devices; going
    # through numpy keeps device_put valid for a multi-process sharding
    state = jax.device_put(
        jax.tree_util.tree_map(np.asarray, state), replicated(mesh))

    gb = _example_batch(global_batch_size, S, H, W, seed=GLOBAL_SEED)
    batch = shard_process_local_batch(mesh, _slice_local(gb, pid, pcnt))

    step = make_train_step(cfg, depth_model, pose_model)
    _, losses = step(state, batch)
    return float(losses["total"])


def child_main(args) -> None:
    loss = run_step(args.global_batch)
    import jax
    print(json.dumps({"process_id": jax.process_index(),
                      "process_count": jax.process_count(),
                      "n_global_devices": len(jax.devices()),
                      "loss": loss}), flush=True)


def parent_main(args) -> int:
    port = _free_port()
    env_base = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": (f"--xla_force_host_platform_device_count="
                      f"{args.devices_per_proc}"),
        "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
        "JAX_NUM_PROCESSES": str(args.procs),
    }
    procs = []
    for pid in range(args.procs):
        env = {**env_base, "JAX_PROCESS_ID": str(pid)}
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child",
             "--global_batch", str(args.global_batch)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))))

    results = {}
    ok = True
    for pid, proc in enumerate(procs):
        try:
            out, err = proc.communicate(timeout=args.timeout)
        except subprocess.TimeoutExpired:
            proc.kill()
            out, err = proc.communicate()
            print(f"process {pid} TIMED OUT\n{err[-2000:]}", file=sys.stderr)
            ok = False
            continue
        if proc.returncode != 0:
            print(f"process {pid} rc={proc.returncode}\n{err[-2000:]}",
                  file=sys.stderr)
            ok = False
            continue
        line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
        results[pid] = json.loads(line)
    if not ok:
        return 1

    losses = [results[p]["loss"] for p in range(args.procs)]
    n_global = results[0]["n_global_devices"]
    assert results[0]["process_count"] == args.procs, results
    assert n_global == args.procs * args.devices_per_proc, results
    assert all(np.isfinite(l) for l in losses), losses
    # the loss is a global collective result: every process must agree
    assert max(losses) - min(losses) <= 1e-12, losses

    # 1-process reference on the SAME global batch over the SAME number of
    # devices (identical partitioning => identical reduction structure)
    env_ref = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": (f"--xla_force_host_platform_device_count={n_global}"),
    }
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID"):
        env_ref.pop(var, None)
    ref = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child",
         "--global_batch", str(args.global_batch)],
        env=env_ref, capture_output=True, text=True, timeout=args.timeout,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if ref.returncode != 0:
        print(f"reference run rc={ref.returncode}\n{ref.stderr[-2000:]}",
              file=sys.stderr)
        return 1
    line = [ln for ln in ref.stdout.splitlines() if ln.startswith("{")][-1]
    ref_loss = json.loads(line)["loss"]

    delta = abs(losses[0] - ref_loss) / max(abs(ref_loss), 1e-12)
    print(json.dumps({
        "procs": args.procs, "devices_per_proc": args.devices_per_proc,
        "mp_loss": losses[0], "ref_loss": ref_loss, "rel_delta": delta,
    }))
    # cross-process collectives lower to a different reduction tree than
    # the single-process partitioner, so f32 sums differ in the last few
    # ulps through the deep fwd+bwd chain (measured ~1.6e-5 rel); 1e-4
    # still catches any real sharding/assembly bug (wrong rows, dropped
    # shard, double-counted batch all shift the loss by >1e-2)
    if delta > 1e-4:
        print(f"LOSS MISMATCH: {losses[0]} vs {ref_loss}", file=sys.stderr)
        return 1
    print("multi-process train step OK")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--procs", type=int, default=2)
    p.add_argument("--devices_per_proc", type=int, default=2)
    p.add_argument("--global_batch", type=int, default=4)
    p.add_argument("--timeout", type=int, default=600)
    p.add_argument("--child", action="store_true")
    args = p.parse_args(argv)
    if args.child:
        child_main(args)
        return 0
    return parent_main(args)


if __name__ == "__main__":
    sys.exit(main())
