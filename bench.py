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
    import jax
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

    def forward(target_img, source_imgs, K):
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

    def timed_loop(n_iter):
        @jax.jit
        def run(target_img, source_imgs, K):
            def body(i, carry):
                tgt, acc = carry
                poses = forward(tgt, source_imgs, K)
                # data dependency: next iteration's input depends on this
                # iteration's output, so XLA cannot elide or reorder work
                tgt = tgt + jnp.sum(poses) * 1e-9
                return tgt, acc + jnp.sum(poses)

            _, acc = jax.lax.fori_loop(
                0, n_iter, body, (target_img, jnp.float32(0.0)))
            return acc
        return run

    rng = np.random.RandomState(0)
    Kmat = np.array([[370.0, 0, W / 2], [0, 370.0, H / 2], [0, 0, 1]],
                    np.float32)
    args = (
        jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)),
        jnp.asarray(rng.rand(S, B, H, W, 3).astype(np.float32)),
        jnp.asarray(np.broadcast_to(Kmat, (B, 3, 3)).copy()),
    )

    def measure(n_iter, reps=3):
        run = timed_loop(n_iter)
        float(run(*args))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(*args))  # scalar fetch forces completion
            best = min(best, time.perf_counter() - t0)
        return best

    k_small, k_large = 5, 55
    t_small = measure(k_small)
    t_large = measure(k_large)
    per_call = (t_large - t_small) / (k_large - k_small)
    frames_per_s = B / per_call

    print(json.dumps({
        "metric": "coupled_sfm_inference_med_res_4iter",
        "value": round(frames_per_s, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(frames_per_s / BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
