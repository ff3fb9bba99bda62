"""Scan-chained decomposition of the benchmark forward (med res, B=6,
S=2, 4 iters) — the tunnel-proof successor to profile_components.py.

profile_components' one-fetch-per-rep methodology subtracts a ~24 ms
dispatch/fetch latency from single measurements; at that latency its
small-component numbers are noise (it reported the encoder at 0.00 ms
and the pose net at 4.75 ms where the chained truth is ~1.4 ms). Every
number here is K scan-chained applications in ONE fetch, so per-fetch
jitter lands at 1/K weight (same methodology as bench.py's headline).

Components:
  depth net (18 imgs)     solve_disp + disp_to_depth
  pose net (24 pairs)     one pose-net application (the solver runs 4)
  solver (given depths)   solve_pose_iteratively alone
  warp round (24 imgs)    one grid_sample_mxu application at solver shapes
  full forward            solve_disp + solver (the bench headline graph)

Usage: python scripts/probe_forward_chain.py [--reps 4 --chain 10]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--chain", type=int, default=10)
    p.add_argument("--mxu_exact", type=str, default="uint8")
    args = p.parse_args()

    from _benchlib import make_noop, measure_best, measure_latency, setup_cache

    setup_cache()

    import jax
    import jax.numpy as jnp

    from tcsfm.config import Config
    from tcsfm.models.depth import make_depth_apply
    from tcsfm.solver.coupled import solve_disp, solve_pose_iteratively
    from tcsfm.train.trainer import create_train_state
    from tcsfm.utils.helpers import disp_to_depth

    H, W, B, S, ITERS = 192, 640, 6, 2, 4
    cfg = Config(iterations=ITERS, num_scales=1, minibatch=B,
                 compute_dtype="bfloat16", use_mxu_warp=True)
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
    Kb = jnp.asarray(np.broadcast_to(Kmat, (B, 3, 3)).copy())

    dvars = {"params": params["depth"], "batch_stats": batch_stats}
    pvars = {"params": params["pose"]}
    depth_apply = make_depth_apply(depth_model, dvars)
    pose_apply = lambda im: pose_model.apply(pvars, im)  # noqa: E731

    noop = make_noop()
    lat = measure_latency(noop)
    print(f"latency {lat * 1e3:.2f} ms")

    def chained(fn, *fargs):
        @jax.jit
        def run(*inner):
            def body(carry, _):
                out = fn(*((inner[0] + carry * 1e-30,) + inner[1:]))
                return carry + jnp.sum(out).astype(jnp.float32), None

            out, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                  length=args.chain)
            return out

        float(run(*fargs))
        ms = measure_best(lambda: float(run(*fargs)), args.reps, lat)
        return ms * 1e3 / args.chain

    def depths_of(tgt, srcs):
        disps = solve_disp(depth_apply, tgt, srcs)
        return jnp.stack([
            disp_to_depth(disps[f][0], cfg.min_depth, cfg.max_depth)[1]
            for f in range(S + 1)
        ])

    ms = chained(depths_of, tgt, srcs)
    print(f"depth net+disp->depth (18)   {ms:8.3f} ms")

    imgs6 = jnp.concatenate(
        [jnp.tile(tgt, (4, 1, 1, 1)), jnp.tile(srcs.reshape(
            (2 * B, H, W, 3)), (2, 1, 1, 1))], axis=-1)   # [24, H, W, 6]
    ms = chained(pose_apply, imgs6)
    print(f"pose net (24 pairs)          {ms:8.3f} ms")

    depths = depths_of(tgt, srcs)

    def solver_only(d):
        poses, _ = solve_pose_iteratively(
            ITERS, d, pose_apply, tgt, srcs, Kb,
            use_mxu_warp=True, mxu_exact=args.mxu_exact)
        return jnp.sum(poses)

    ms = chained(solver_only, depths)
    print(f"solver given depths (4 it)   {ms:8.3f} ms")

    def solver_1it(d):
        poses, _ = solve_pose_iteratively(
            1, d, pose_apply, tgt, srcs, Kb,
            use_mxu_warp=True, mxu_exact=args.mxu_exact)
        return jnp.sum(poses)

    ms = chained(solver_1it, depths)
    print(f"solver 1 iter (no warp)      {ms:8.3f} ms")

    # one warp round at solver shapes: 24 images, pose-inference mode
    # (sample_depth=False, img_grad=False — what iterations 1..3 run)
    from tcsfm.geom.warp import inverse_warp2_mxu

    src24 = jnp.tile(srcs.reshape((2 * B, H, W, 3)), (2, 1, 1, 1))
    d_t = jnp.tile(depths.reshape((3 * B, H, W))[:2 * B], (2, 1, 1))
    d_s = jnp.tile(depths.reshape((3 * B, H, W))[B:], (2, 1, 1))[:4 * B]
    pose24 = jnp.asarray(rng.randn(4 * B, 6).astype(np.float32) * 0.01)
    K24 = jnp.tile(Kb, (4, 1, 1))

    def warp_once(src):
        img_rec, valid, _, _ = inverse_warp2_mxu(
            src, d_t, d_s, pose24, K24, exact=args.mxu_exact,
            sample_depth=False, img_grad=False)
        return jnp.sum(img_rec) + jnp.sum(valid)

    ms = chained(warp_once, src24)
    print(f"warp round (24 imgs)         {ms:8.3f} ms")

    def full(tgt):
        d = depths_of(tgt, srcs)
        poses, _ = solve_pose_iteratively(
            ITERS, d, pose_apply, tgt, srcs, Kb,
            use_mxu_warp=True, mxu_exact=args.mxu_exact)
        return jnp.sum(poses)

    ms = chained(full, tgt)
    print(f"full forward                 {ms:8.3f} ms")


if __name__ == "__main__":
    main()
