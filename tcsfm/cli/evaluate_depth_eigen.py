"""Eigen depth evaluation CLI (evaluate_depth_eigen.py equivalent).

Monodepth2 protocol: per-image disparity with flip post-processing, resize
to GT, depth = 30/disp, Eigen crop, median scaling, clamp, 7 metrics.
Supports evaluating saved PFT disparities (--pred_disps) like the
reference's load_pred_disps path (:122-126).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_dir", type=str, default="")
    p.add_argument("--data_dir", type=str, default="")
    p.add_argument("--gt_depths", type=str, default="",
                   help="npz from preprocess eigen_gt_depth")
    p.add_argument("--pred_disps", type=str, default="",
                   help="evaluate saved .npy disparities instead of running")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--no_post_process", action="store_true")
    p.add_argument("--no_median_scaling", action="store_true")
    p.add_argument("--save_pred_disps", type=str, default="")
    p.add_argument("--benchmark", type=str, default="eigen")
    args = p.parse_args(argv)

    from tcsfm.eval.depth_metrics import evaluate_eigen

    if args.pred_disps:
        pred_disps = np.load(args.pred_disps)
    else:
        import jax
        import jax.numpy as jnp

        from tcsfm.config import Config
        from tcsfm.data.eigen import EigenDataset
        from tcsfm.train.checkpoint import load_checkpoint
        from tcsfm.train.trainer import create_train_state
        from tcsfm.utils.helpers import disp_to_depth, post_process_disparity

        cfg = Config.load(os.path.join(args.model_dir, "config.json"))
        state, depth_model, _ = create_train_state(
            cfg, jax.random.PRNGKey(0), steps_per_epoch=1)
        state, _, _ = load_checkpoint(args.model_dir, state, load_best=True)
        dvars = {"params": state.params["depth"],
                 "batch_stats": state.batch_stats}

        ds = EigenDataset(args.data_dir, mode="test")

        @jax.jit
        def infer(imgs):
            """Flip-merge post-processed disparity (reference :95-106);
            --no_post_process runs the plain single pass instead."""
            if args.no_post_process:
                disp = depth_model.apply(dvars, imgs)[0][..., 0]
                scaled, _ = disp_to_depth(disp, cfg.min_depth, cfg.max_depth)
                return scaled
            both = jnp.concatenate([imgs, imgs[:, :, ::-1]], 0)
            disp = depth_model.apply(dvars, both)[0][..., 0]
            scaled, _ = disp_to_depth(disp, cfg.min_depth, cfg.max_depth)
            n = imgs.shape[0]
            return post_process_disparity(scaled[:n], scaled[n:, :, ::-1])

        pred_disps = []
        for start in range(0, len(ds), args.batch):
            batch = np.stack([
                ds[i]["target_img"]
                for i in range(start, min(start + args.batch, len(ds)))
            ])
            pred_disps.append(np.asarray(infer(jnp.asarray(batch))))
        pred_disps = np.concatenate(pred_disps)
        if args.save_pred_disps:
            np.save(args.save_pred_disps, pred_disps)

    gt = np.load(args.gt_depths, allow_pickle=True)["data"]
    metrics = evaluate_eigen(
        list(pred_disps), list(gt),
        median_scaling=not args.no_median_scaling,
        benchmark=args.benchmark,
    )
    print(json.dumps({k: round(float(v), 4) for k, v in metrics.items()}))
    return metrics


if __name__ == "__main__":
    main()
