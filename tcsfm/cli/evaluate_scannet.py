"""ScanNet depth + pose evaluation CLI (evaluate_error_scannet.py equivalent).

DeepV2D protocol: 8-iteration coupled inference, flip post-processed depth,
median scale matching, sc-inv log RMSE + rotation/translation pose errors.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_dir", type=str, default="")
    p.add_argument("--data_dir", type=str, default="",
                   help="directory of preprocessed scene npz files")
    p.add_argument("--scenes", nargs="+", required=False, default=[])
    p.add_argument("--iterations", type=int, default=8)   # :30 in the reference
    p.add_argument("--frame_gap", type=int, default=8)
    p.add_argument("--batch", type=int, default=4)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from tcsfm.config import Config
    from tcsfm.data.dataset import SequenceData
    from tcsfm.data.loader import BatchLoader
    from tcsfm.data.scannet import ScanNetTestDataset
    from tcsfm.eval.depth_metrics import (
        compute_depth_errors_scannet, compute_pose_errors_deepv2d,
        compute_scaling_factor,
    )
    from tcsfm.geom.se3 import pose_vec2mat44
    from tcsfm.solver.coupled import solve_disp, solve_pose_iteratively
    from tcsfm.train.checkpoint import load_checkpoint
    from tcsfm.train.trainer import create_train_state
    from tcsfm.utils.helpers import disp_to_depth

    cfg = Config.load(os.path.join(args.model_dir, "config.json"))
    cfg = cfg.replace(iterations=args.iterations)
    state, depth_model, pose_model = create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=1)
    state, _, _ = load_checkpoint(args.model_dir, state, load_best=True)
    dvars = {"params": state.params["depth"], "batch_stats": state.batch_stats}
    pvars = {"params": state.params["pose"]}

    seqs = [SequenceData.from_npz(os.path.join(args.data_dir, f"{s}.npz"))
            for s in args.scenes]
    ds = ScanNetTestDataset(seqs, frame_gap=args.frame_gap)
    loader = BatchLoader(ds, args.batch, shuffle=False, drop_last=False,
                         pad_tail=True)

    @jax.jit
    def infer(target_img, source_imgs, K):
        depth_apply = lambda im: depth_model.apply(dvars, im)  # noqa: E731
        pose_apply = lambda im: pose_model.apply(pvars, im)    # noqa: E731
        disps = solve_disp(depth_apply, target_img, source_imgs)
        depths = jnp.stack([
            disp_to_depth(disps[f][0], cfg.min_depth, cfg.max_depth)[1]
            for f in range(len(disps))
        ])
        poses, poses_inv = solve_pose_iteratively(
            cfg.iterations, depths, pose_apply, target_img, source_imgs, K)
        return depths[0][..., 0], poses

    gt_depths, pr_depths = [], []
    pose_metrics = []
    for batch in loader:
        valid = batch.pop("_valid")
        depth_pred, poses = infer(
            jnp.asarray(batch["target_img"]),
            jnp.asarray(batch["source_imgs"]),
            jnp.asarray(batch["intrinsics"]))
        depth_pred = np.asarray(depth_pred)
        poses = np.asarray(poses)
        n = int(valid.sum())
        for i in range(n):
            if "gt_depth" not in batch:
                continue
            gt_d = batch["gt_depth"][i]
            pr_d = depth_pred[i]
            scale = compute_scaling_factor(gt_d, pr_d)
            pr_depths.append(pr_d * scale)
            gt_depths.append(gt_d)
            if "gt_pose_mats" in batch:
                pred_mats = np.asarray(
                    pose_vec2mat44(jnp.asarray(poses[:, i])))
                for s in range(pred_mats.shape[0]):
                    pose_metrics.append(compute_pose_errors_deepv2d(
                        batch["gt_pose_mats"][i, s], pred_mats[s]))

    out = {}
    if gt_depths:
        out["depth"] = compute_depth_errors_scannet(gt_depths, pr_depths)
    if pose_metrics:
        out["pose"] = {
            k: float(np.mean([m[k] for m in pose_metrics]))
            for k in pose_metrics[0]
        }
    print(json.dumps(out, indent=2, default=float))
    return out


if __name__ == "__main__":
    main()
