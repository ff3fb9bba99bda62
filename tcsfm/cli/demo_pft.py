"""Dataset-free demo: PFT on a synthetic window + loss surfaces.

Equivalent of run_sample_optimization_demo.py (BASELINE config #1): runs a
single-window inference-time optimization and sweeps photometric-error
surfaces around the estimate — no dataset download needed (the window is
generated, not bundled).

Usage: python -m tcsfm.cli.demo_pft [--epochs 20] [--mode encoder]
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--mode", type=str, default="encoder")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--iterations", type=int, default=2)
    p.add_argument("--height", type=int, default=64)
    p.add_argument("--width", type=int, default=96)
    p.add_argument("--out", type=str, default="")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tcsfm.config import Config, PFTOptions
    from tcsfm.data.dataset import SfMWindowDataset, relative_lie_alg
    from tcsfm.data.loader import BatchLoader
    from tcsfm.data.synthetic import make_synthetic_sequence
    from tcsfm.data.transforms import WindowTransform
    from tcsfm.eval.experiments import loss_surface
    from tcsfm.models.depth import DepthNet
    from tcsfm.models.pose import PoseNet
    from tcsfm.solver.pft import PFTOptimizer

    H, W = args.height, args.width
    cfg = Config(iterations=args.iterations, num_scales=1,
                 compute_dtype="float32")
    depth_model = DepthNet(num_scales=1)
    pose_model = PoseNet()
    dvars = depth_model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    pvars = pose_model.init(jax.random.PRNGKey(1), jnp.zeros((1, H, W, 6)))

    seq = make_synthetic_sequence(8, (H, W), seed=4)
    ds = SfMWindowDataset(
        [seq], seq_len=3,
        transform=WindowTransform(jitter=False, flip_prob=None))
    batch = next(iter(BatchLoader(ds, 2, shuffle=False)))
    batch.pop("_valid")
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}

    opts = PFTOptions(epochs=args.epochs, lr=args.lr, avg_final_epochs=5,
                      num_source_imgs=2)
    opt = PFTOptimizer(cfg, opts, depth_model, pose_model, mode=args.mode)
    res = opt.optimize_window(jbatch, dvars["params"], pvars["params"],
                              dvars["batch_stats"])
    losses = np.asarray(res.losses)
    print(f"PFT ({args.mode}, {args.epochs} epochs): "
          f"loss {losses[0]:.5f} -> {losses[-1]:.5f}")

    # loss surface around the GT pose with GT depth (sanity: minimum ~ 0)
    t, s = 1, 2
    xi = relative_lie_alg(seq.gt_poses[t], seq.gt_poses[s])
    tz = abs(float(xi[2])) + 1e-6
    offs = np.linspace(-1.5 * tz, 1.5 * tz, 21).astype(np.float32)
    yaws = np.linspace(-0.008, 0.008, 21).astype(np.float32)
    surf = loss_surface(
        jnp.asarray(seq.images[t][None]), jnp.asarray(seq.images[s][None]),
        jnp.asarray(seq.depths[t][None, ..., None]),
        jnp.asarray(seq.depths[s][None, ..., None]),
        jnp.asarray(xi[None].astype(np.float32)),
        jnp.asarray(seq.intrinsics[t][None]),
        offs, yaws, automask=False,
    )
    t_curve, y_curve = surf["trans"][:, 0], surf["yaw"][:, 0]
    print(f"loss surface: trans argmin at offset "
          f"{offs[np.nanargmin(t_curve)]:+.4f} (0 is GT), "
          f"yaw argmin at {yaws[np.nanargmin(y_curve)]:+.4f}")

    summary = {
        "pft_loss_first": float(losses[0]),
        "pft_loss_last": float(losses[-1]),
        "pft_improved": bool(losses[-1] < losses[0]),
        "surface_trans_argmin_offset": float(offs[np.nanargmin(t_curve)]),
        "surface_yaw_argmin_offset": float(yaws[np.nanargmin(y_curve)]),
    }
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({**summary,
                       "trans_curve": t_curve.tolist(),
                       "yaw_curve": y_curve.tolist()}, f)
    return summary


if __name__ == "__main__":
    main()
