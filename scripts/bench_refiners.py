"""Benchmark the three sequential refiners per window on TPU.

`run_sequential_pft --refiner {adam,ba,chain}` offers three refinement
backends (reference anchor: optimization_experiments/
run_sequential_optimization.py, which only has the Adam/PFT one):

  adam  — 20-epoch PFT on the depth-encoder subset (paper default);
  ba    — joint 3-frame window BA (both pairs + shared target depth,
          solver/ba.py::window_ba), 10 LM iterations;
  chain — whole-sequence block-tridiagonal BA per 12-frame block with a
          2-level coarse-to-fine pyramid (solver/ba.py::chain_ba).

All at the paper's med resolution (192x640), window batch 4 (the CLI
default). Timing uses bench.py's methodology: scalar-fetch-forced
completion with the dispatch/fetch latency of a trivial kernel
subtracted (block_until_ready does not wait under the remote tunnel).

Prints one JSON line:
  {"adam_ms_per_window": N, "ba_ms_per_window": N,
   "chain_ms_per_window": N, "chain_ms_per_block": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():

    from _benchlib import make_noop, measure_best, measure_latency, setup_cache

    setup_cache()

    import jax

    import jax.numpy as jnp

    from tcsfm.config import Config, PFTOptions
    from tcsfm.solver.ba import chain_ba, window_ba
    from tcsfm.solver.coupled import solve_disp, solve_pose_iteratively
    from tcsfm.solver.pft import PFTOptimizer
    from tcsfm.train.trainer import create_train_state
    from tcsfm.utils.helpers import disp_to_depth

    t0_all = time.monotonic()

    def stage(msg):
        print(f"# [{time.monotonic() - t0_all:6.1f}s] {msg}", flush=True)

    # TCSFM_BA_XLA=1 reproduces the round-3 numbers (XLA gather residual)
    use_mxu_ba = os.environ.get("TCSFM_BA_XLA", "") != "1"

    H, W = 192, 640
    B, S = 4, 2                 # CLI default --window_batch 4
    BLOCK = 12                  # CLI default --chain_block 12
    cfg = Config(iterations=2, num_scales=1, minibatch=B,
                 compute_dtype="bfloat16", use_mxu_warp=True,
                 mxu_exact="uint8")

    stage("init models")
    state, depth_model, pose_model = create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=100)
    params, batch_stats = state.params, state.batch_stats

    rng = np.random.RandomState(0)
    Kmat = np.array([[370.0, 0, W / 2], [0, 370.0, H / 2], [0, 0, 1]],
                    np.float32)
    u8 = lambda *shape: jnp.asarray(                           # noqa: E731
        rng.randint(0, 256, shape).astype(np.float32) / 255.0)
    tgt, srcs = u8(B, H, W, 3), u8(S, B, H, W, 3)
    Kb = jnp.asarray(np.broadcast_to(Kmat, (B, 3, 3)).copy())

    noop = make_noop()
    latency = measure_latency(noop, reps=10)

    def measure(fn, reps):
        # scalar fetch inside fn forces completion; latency subtracted by
        # callers below
        return measure_best(lambda: float(fn()), reps) 

    # --- adam / PFT (20 epochs, encoder mode) ------------------------------
    stage("compile adam (PFT)")
    opts = PFTOptions(epochs=20, num_source_imgs=S)
    pft = PFTOptimizer(cfg, opts, depth_model, pose_model, mode="encoder")
    pft_batch = {"target_img": tgt, "source_imgs": srcs, "intrinsics": Kb}

    def adam_once():
        r = pft.optimize_window_jit(pft_batch, params["depth"],
                                    params["pose"], batch_stats)
        return jnp.sum(r.poses_opt) + jnp.sum(r.disp_opt)
    float(adam_once())
    adam_ms = (measure(adam_once, reps=3) - latency) * 1e3 / B

    # --- ba (joint 3-frame window BA, 10 iters — run_sequential_pft's
    # ba_refine body minus the scale recoveries) ----------------------------
    stage("compile ba (window_ba)")

    @jax.jit
    def ba_once(params, batch_stats, target_img, source_imgs, K):
        dvars = {"params": params["depth"], "batch_stats": batch_stats}
        pvars = {"params": params["pose"]}
        depth_apply = lambda im: depth_model.apply(dvars, im)     # noqa
        pose_apply = lambda im: pose_model.apply(pvars, im)       # noqa
        disps = solve_disp(depth_apply, target_img, source_imgs)
        depths = jnp.stack([
            disp_to_depth(disps[f][0], cfg.min_depth, cfg.max_depth)[1]
            for f in range(S + 1)])
        poses, _ = solve_pose_iteratively(
            cfg.iterations, depths, pose_apply, target_img, source_imgs, K,
            use_mxu_warp=True, mxu_exact=cfg.mxu_exact)
        res = window_ba(poses[0], poses[1], depths[0], target_img,
                        source_imgs[0], source_imgs[1], depths[1], depths[2],
                        K, iters=10, depth_prior_weight=0.1,
                        use_mxu_warp=use_mxu_ba, mxu_exact=cfg.mxu_exact)
        return (jnp.sum(res.pose_prev) + jnp.sum(res.pose_next)
                + jnp.sum(res.depth))
    ba_args = (params, batch_stats, tgt, srcs, Kb)
    float(ba_once(*ba_args))
    ba_ms = (measure(lambda: ba_once(*ba_args), reps=3) - latency) * 1e3 / B

    # --- gn (pose-only damped Gauss-Newton, 10 iters) ----------------------
    stage("compile gn (gauss_newton_pose)")
    from tcsfm.solver.gauss_newton import gauss_newton_pose

    @jax.jit
    def gn_once(params, batch_stats, target_img, source_imgs, K):
        dvars = {"params": params["depth"], "batch_stats": batch_stats}
        pvars = {"params": params["pose"]}
        depth_apply = lambda im: depth_model.apply(dvars, im)     # noqa
        pose_apply = lambda im: pose_model.apply(pvars, im)       # noqa
        disps = solve_disp(depth_apply, target_img, source_imgs)
        depths = jnp.stack([
            disp_to_depth(disps[f][0], cfg.min_depth, cfg.max_depth)[1]
            for f in range(S + 1)])
        poses, _ = solve_pose_iteratively(
            cfg.iterations, depths, pose_apply, target_img, source_imgs, K,
            use_mxu_warp=True, mxu_exact=cfg.mxu_exact)
        res = gauss_newton_pose(poses[1], target_img, source_imgs[1],
                                depths[0], depths[2], K, iters=10,
                                use_mxu_warp=use_mxu_ba,
                                mxu_exact=cfg.mxu_exact)
        return jnp.sum(res.pose)
    float(gn_once(*ba_args))
    gn_ms = (measure(lambda: gn_once(*ba_args), reps=3) - latency) * 1e3 / B

    # --- chain (block-tridiagonal BA per block, 2-level pyramid) -----------
    stage("compile chain (chain_ba)")
    frames = u8(BLOCK, H, W, 3)
    depths_blk = jnp.asarray(
        (0.5 + rng.rand(BLOCK, H, W, 1)).astype(np.float32) * 20.0)
    p_prev = jnp.asarray(0.005 * rng.randn(BLOCK - 2, 6).astype(np.float32))
    p_next = jnp.asarray(0.005 * rng.randn(BLOCK - 2, 6).astype(np.float32))

    solve = jax.jit(lambda f, d, a, b: chain_ba(
        f, d, jnp.asarray(Kmat), a, b, iters=10, depth_prior_weight=0.1,
        pyramid_levels=2, use_mxu_warp=use_mxu_ba, mxu_exact=cfg.mxu_exact))

    def chain_once():
        res = solve(frames, depths_blk, p_prev, p_next)
        return jnp.sum(res.edge_pose) + res.cost[-1]
    float(chain_once())
    chain_block_ms = (measure(chain_once, reps=3) - latency) * 1e3
    chain_ms = chain_block_ms / (BLOCK - 2)   # windows per block

    print(json.dumps({
        "adam_ms_per_window": round(adam_ms, 1),
        "ba_ms_per_window": round(ba_ms, 1),
        "gn_ms_per_window": round(gn_ms, 1),
        "chain_ms_per_window": round(chain_ms, 1),
        "chain_ms_per_block": round(chain_block_ms, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
