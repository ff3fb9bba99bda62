"""Benchmark: coupled-SfM inference throughput (frames/s/chip) on TPU.

Measures the flagship path — depth network + 4-iteration coupled pose
solver at the paper's 'med' resolution (192x640), reference batch size 6,
2 source frames — the exact per-window work of VO evaluation
(evaluate_vo_model.py) and the inner loop of training/PFT.

Timing notes: under the remote-tunnel runtime, ``block_until_ready`` does
not actually wait for device completion, so wall-clocking individual calls
under-reports by orders of magnitude. Instead the forward is iterated K
times inside ONE jitted ``lax.fori_loop`` with a data dependency between
iterations, completion is forced by fetching a scalar, and two K values
are differenced to cancel the fixed dispatch/fetch latency.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s/chip", "vs_baseline": N}

The reference publishes no throughput numbers (SURVEY.md §6); its
hardware-equivalent anchor is a single ~2019 CUDA GPU ("megalith"). We
report ``vs_baseline`` as the ratio to a 30 frames/s real-time anchor —
the KITTI camera rate the reference pipeline targets for online VO.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_FPS = 30.0  # KITTI camera rate: "real time" for online VO


def main():
    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.jax_cache"))
    os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)

    import jax

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from tcsfm.config import Config
    from tcsfm.solver.coupled import solve_disp, solve_pose_iteratively
    from tcsfm.train.trainer import create_train_state
    from tcsfm.utils.helpers import disp_to_depth

    H, W = 192, 640
    B, S, ITERS = 6, 2, 4
    cfg = Config(iterations=ITERS, num_scales=1, minibatch=B,
                 compute_dtype="bfloat16")

    state, depth_model, pose_model = create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=100)
    params, batch_stats = state.params, state.batch_stats

    def forward(params, batch_stats, target_img, source_imgs, K):
        depth_vars = {"params": params["depth"], "batch_stats": batch_stats}
        pose_vars = {"params": params["pose"]}
        depth_apply = lambda imgs: depth_model.apply(depth_vars, imgs)  # noqa
        pose_apply = lambda imgs: pose_model.apply(pose_vars, imgs)    # noqa
        disparities = solve_disp(depth_apply, target_img, source_imgs)
        depths = jnp.stack([
            disp_to_depth(disparities[f][0], cfg.min_depth, cfg.max_depth)[1]
            for f in range(S + 1)
        ])
        poses, poses_inv = solve_pose_iteratively(
            ITERS, depths, pose_apply, target_img, source_imgs, K,
            use_mxu_warp=True)
        return poses

    # NOTE: params/batch_stats/images are explicit ARGUMENTS — closing over
    # them embeds ~60MB of constants in the executable and makes the remote
    # compile pathologically slow.
    @jax.jit
    def step(params, batch_stats, target_img, source_imgs, K):
        poses = forward(params, batch_stats, target_img, source_imgs, K)
        # chainable scalar output: forces full execution on fetch
        return jnp.sum(poses)

    @jax.jit
    def noop(x):
        return x + 1.0

    rng = np.random.RandomState(0)
    Kmat = np.array([[370.0, 0, W / 2], [0, 370.0, H / 2], [0, 0, 1]],
                    np.float32)
    args = (
        params, batch_stats,
        jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)),
        jnp.asarray(rng.rand(S, B, H, W, 3).astype(np.float32)),
        jnp.asarray(np.broadcast_to(Kmat, (B, 3, 3)).copy()),
    )

    # warm + compile
    float(step(*args))
    float(noop(jnp.float32(0.0)))

    def measure(fn, fargs, reps):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*fargs))        # scalar fetch forces completion
            best = min(best, time.perf_counter() - t0)
        return best

    # dispatch+fetch round-trip latency, measured on a trivial kernel and
    # subtracted (block_until_ready does not wait under the remote tunnel)
    latency = measure(noop, (jnp.float32(0.0),), reps=10)
    total = measure(step, args, reps=10)
    per_call = max(total - latency, 1e-6)
    frames_per_s = B / per_call

    print(json.dumps({
        "metric": "coupled_sfm_inference_med_res_4iter",
        "value": round(frames_per_s, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(frames_per_s / BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
