"""Component-level TPU timing: encoder / depth net / pose net / warp /
full forward / train step, at the benchmark shapes (med res 192x640,
batch 6, S=2, 4 iters).

Timing uses the same scalar-fetch-forced methodology as bench.py (the
remote tunnel's ``block_until_ready`` does not wait); the trivial-kernel
dispatch/fetch latency is measured and subtracted.

Usage:  python scripts/profile_components.py [--reps 6] [--only depth]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=6)
    p.add_argument("--only", type=str, default="",
                   help="substring filter on benchmark names")
    p.add_argument("--no_remat", action="store_true",
                   help="train step without coupled-iteration remat")
    args = p.parse_args()

    from _benchlib import make_noop, measure_best, measure_latency, setup_cache

    setup_cache()

    import jax
    import jax.numpy as jnp

    from tcsfm.config import Config
    from tcsfm.solver.coupled import solve_disp, solve_pose_iteratively
    from tcsfm.train.trainer import create_train_state, make_train_step
    from tcsfm.utils.helpers import disp_to_depth

    H, W, B, S, ITERS = 192, 640, 6, 2, 4
    cfg = Config(iterations=ITERS, num_scales=1, minibatch=B,
                 compute_dtype="bfloat16", use_mxu_warp=True,
                 remat_coupled=not args.no_remat)
    state, depth_model, pose_model = create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=100)
    params, batch_stats = state.params, state.batch_stats

    rng = np.random.RandomState(0)
    Kmat = np.array([[370.0, 0, W / 2], [0, 370.0, H / 2], [0, 0, 1]],
                    np.float32)
    tgt = jnp.asarray(rng.randint(0, 256, (B, H, W, 3))
                      .astype(np.float32) / 255.0)
    srcs = jnp.asarray(rng.randint(0, 256, (S, B, H, W, 3))
                       .astype(np.float32) / 255.0)
    K = jnp.asarray(np.broadcast_to(Kmat, (B, 3, 3)).copy())
    all_imgs = jnp.concatenate([tgt, srcs.reshape(S * B, H, W, 3)], 0)
    pose_in = jnp.concatenate(
        [jnp.tile(tgt, (2 * S, 1, 1, 1)),
         jnp.concatenate([srcs, srcs], 0).reshape(2 * S * B, H, W, 3)], -1)

    noop = make_noop()

    def timeit(name, fn, *fargs):
        if args.only and args.only not in name:
            return
        float(fn(*fargs))                       # compile + warm
        lat = measure_latency(noop)
        best = measure_best(lambda: float(fn(*fargs)), args.reps, lat)
        print(f"{name:34s} {best * 1e3:8.2f} ms", flush=True)

    # --- encoder only ------------------------------------------------------
    @jax.jit
    def encoder(params, batch_stats, x):
        dvars = {"params": params["depth"], "batch_stats": batch_stats}
        feats = depth_model.apply(dvars, x, method=depth_model.encode)
        return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)

    # --- full depth net (encode + decode, 18 images) ------------------------
    @jax.jit
    def depth_full(params, batch_stats, x):
        dvars = {"params": params["depth"], "batch_stats": batch_stats}
        return jnp.sum(depth_model.apply(dvars, x)[0].astype(jnp.float32))

    # --- pose net (2SB packed pairs) ----------------------------------------
    @jax.jit
    def pose_full(params, x):
        return jnp.sum(pose_model.apply({"params": params["pose"]}, x))

    # --- full coupled forward ----------------------------------------------
    @functools.partial(jax.jit, static_argnames=("mxu_exact",))
    def forward(params, batch_stats, tgt, srcs, K, mxu_exact="uint8"):
        dvars = {"params": params["depth"], "batch_stats": batch_stats}
        pvars = {"params": params["pose"]}
        from tcsfm.models.depth import make_depth_apply

        depth_apply = make_depth_apply(depth_model, dvars)
        pose_apply = lambda im: pose_model.apply(pvars, im)   # noqa: E731
        disps = solve_disp(depth_apply, tgt, srcs)
        depths = jnp.stack([
            disp_to_depth(disps[f][0], cfg.min_depth, cfg.max_depth)[1]
            for f in range(S + 1)
        ])
        poses, _ = solve_pose_iteratively(
            ITERS, depths, pose_apply, tgt, srcs, K,
            use_mxu_warp=True, mxu_exact=mxu_exact)
        return jnp.sum(poses)

    # --- train step ---------------------------------------------------------
    train_step_fn = make_train_step(cfg, depth_model, pose_model)
    batch = {
        "target_img": tgt, "target_img_aug": tgt,
        "source_imgs": srcs, "source_imgs_aug": srcs,
        "intrinsics": K, "intrinsics_aug": K,
        "gt_lie_alg": jnp.zeros((S, B, 6), jnp.float32),
        "gt_lie_alg_aug": jnp.zeros((S, B, 6), jnp.float32),
        "vo_lie_alg": jnp.zeros((S, B, 6), jnp.float32),
        "vo_lie_alg_aug": jnp.zeros((S, B, 6), jnp.float32),
        "dt": jnp.full((S, B), 0.1, jnp.float32),
    }

    def train_once():
        nonlocal state
        new_state, losses = train_step_fn(state, batch)
        state = new_state
        return losses["total"]

    timeit("encoder (18 imgs)", encoder, params, batch_stats, all_imgs)
    timeit("depth net full (18 imgs)", depth_full, params, batch_stats,
           all_imgs)
    timeit("pose net (24 pairs)", pose_full, params, pose_in)
    timeit("forward uint8 (B=6)", forward, params, batch_stats, tgt, srcs, K)
    timeit("forward hilo (B=6)",
           lambda *a: forward(*a, mxu_exact=True),
           params, batch_stats, tgt, srcs, K)
    timeit("train step (B=6)", train_once)


if __name__ == "__main__":
    main()
