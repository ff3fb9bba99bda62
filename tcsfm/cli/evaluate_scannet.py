"""ScanNet depth + pose evaluation CLI (evaluate_error_scannet.py equivalent).

DeepV2D protocol, reference-exact (evaluate_error_scannet.py:25-190):
  * pair inference on (target, source0) with 8 coupled iterations (:30),
  * flip post-processing — the [imgs; flip(imgs)] stack runs the depth net
    once, disparities flip-merge (:78-86) BEFORE the pose solve, and the
    merged disparities feed the coupled iterations as depths = 1/disp,
  * pose metric on the fused pose exp((30·fwd − 30·inv)/2) only (:108,156),
  * depth metric on the target disparity resized to GT, depth = 30/disp,
    median-ratio scaled (:159-166).
"""

from __future__ import annotations

import argparse
import functools
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
    p.add_argument("--no_post_process", action="store_true",
                   help="skip the flip-merge depth post-processing "
                        "(post_process=True is the reference default, :27)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from tcsfm.config import Config
    from tcsfm.data.dataset import SequenceData
    from tcsfm.data.loader import BatchLoader
    from tcsfm.data.scannet import ScanNetTestDataset
    from tcsfm.eval.depth_metrics import (
        _resize_bilinear, compute_depth_errors_scannet,
        compute_pose_errors_deepv2d, compute_scaling_factor,
    )
    from tcsfm.eval.trajectory import np_se3_exp
    from tcsfm.solver.coupled import solve_pose_iteratively
    from tcsfm.train.checkpoint import load_checkpoint
    from tcsfm.train.trainer import create_train_state
    from tcsfm.utils.helpers import disp_to_depth, post_process_disparity

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

    @functools.partial(jax.jit, static_argnames=("post_process",))
    def infer(target_img, source0_img, K, post_process=True):
        """Pair inference with the reference's flip-merge protocol.

        Returns (target scaled disparity [B, H, W], fwd pose [B, 6],
        inv pose [B, 6]).
        """
        b = target_img.shape[0]
        imgs = jnp.concatenate([target_img, source0_img], 0)       # [2B,...]
        if post_process:
            # each image gets two forward passes: as-is and flipped (:78-80)
            imgs = jnp.concatenate([imgs, imgs[:, :, ::-1]], 0)    # [4B,...]
        disp = depth_model.apply(dvars, imgs)[0][..., 0]
        scaled, _ = disp_to_depth(disp, cfg.min_depth, cfg.max_depth)
        if post_process:
            n = 2 * b
            scaled = post_process_disparity(scaled[:n], scaled[n:, :, ::-1])
        # depths = 1/scaled_disp == disp_to_depth's depth (:93)
        depths = (1.0 / scaled)[..., None]
        depths = jnp.stack([depths[:b], depths[b:2 * b]])          # [2,B,H,W,1]
        poses, poses_inv = solve_pose_iteratively(
            cfg.iterations, depths,
            lambda im: pose_model.apply(pvars, im),
            target_img, source0_img[None], K,
            use_mxu_warp=cfg.use_mxu_warp, mxu_exact=cfg.mxu_exact,
            mxu_band_guard=cfg.mxu_band_guard,
            mxu_band=cfg.mxu_band)
        return scaled[:b], poses[0], poses_inv[0]

    gt_depths, pred_disps, pred_mats, gt_mats = [], [], [], []
    for batch in loader:
        valid = batch.pop("_valid")
        disp_t, fwd, inv = infer(
            jnp.asarray(batch["target_img"]),
            jnp.asarray(batch["source_imgs"][0]),
            jnp.asarray(batch["intrinsics"]),
            post_process=not args.no_post_process)
        disp_t = np.asarray(disp_t)
        fwd = np.asarray(fwd, np.float64)
        inv = np.asarray(inv, np.float64)
        # metric scale: ×30 on translations before fusing (:101-103,108)
        fwd[:, 0:3] *= 30.0
        inv[:, 0:3] *= 30.0
        comb = (fwd - inv) / 2.0
        n = int(valid.sum())
        for i in range(n):
            # depth and pose pairs are collected INDEPENDENTLY: a scene
            # with pose GT but no depth GT (or vice versa) keeps its
            # metrics, and mixed availability across batches can't
            # misalign the (gt, pred) pairing
            if "gt_depth" in batch:
                pred_disps.append(disp_t[i])
                gt_depths.append(batch["gt_depth"][i])
            if "gt_pose_mats" in batch:
                pred_mats.append(np_se3_exp(comb[i]))
                gt_mats.append(batch["gt_pose_mats"][i, 0])

    depth_results, pose_results = [], []
    for gt_d, disp in zip(gt_depths, pred_disps):
        gt_h, gt_w = gt_d.shape[:2]
        disp_r = _resize_bilinear(np.asarray(disp, np.float32), gt_h, gt_w)
        pred_depth = 30.0 / disp_r                                 # (:161)
        scale = compute_scaling_factor(gt_d, pred_depth)
        depth_results.append(
            compute_depth_errors_scannet(gt_d, scale * pred_depth))
    for gt_m, pred_m in zip(gt_mats, pred_mats):
        pose_results.append(compute_pose_errors_deepv2d(gt_m, pred_m))

    out = {}
    if depth_results:
        out["depth"] = {k: float(np.mean([m[k] for m in depth_results]))
                        for k in depth_results[0]}
    if pose_results:
        out["pose"] = {k: float(np.mean([m[k] for m in pose_results]))
                       for k in pose_results[0]}
    print(json.dumps(out, indent=2, default=float))
    return out


if __name__ == "__main__":
    main()
