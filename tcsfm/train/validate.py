"""Training-time validation: visual panels + trajectory eval.

Equivalents of test_depth_and_reconstruction (validate.py:11-59) and
test_trajectory (validate.py:105-135): sample windows for TensorBoard
image panels, and integrate full-sequence pose predictions into trajectory
errors during training.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tcsfm.config import Config
from tcsfm.eval.trajectory import compute_trajectory
from tcsfm.geom.warp import inverse_warp2
from tcsfm.solver.coupled import solve_disp, solve_pose, solve_pose_iteratively
from tcsfm.utils.helpers import depth_to_disp, disp_to_depth

METRIC_SCALE = 30.0


def _applies(cfg, depth_model, pose_model, params, batch_stats):
    dvars = {"params": params["depth"], "batch_stats": batch_stats}
    pvars = {"params": params["pose"]}
    return (lambda im: depth_model.apply(dvars, im),
            lambda im: pose_model.apply(pvars, im))


def _maybe_flows(cfg: Config, tgt: jnp.ndarray, src: jnp.ndarray):
    """Classical-flow pose-net channels for the iterations==1 path
    (reference validate.py:34 passes loader-computed cv2 flow; here the
    Farneback pair is computed on-device)."""
    if cfg.flow_type != "classical":
        return None
    from tcsfm.ops.flow import batched_flow_pair
    tgt_b = jnp.broadcast_to(tgt[None], src.shape)
    fwd, back = jax.vmap(batched_flow_pair)(tgt_b, src)
    return (fwd, back)


def depth_and_reconstruction_panels(cfg: Config, depth_model, pose_model,
                                    params, batch_stats, dataset,
                                    n_samples: int = 5,
                                    source_idx: int = 0) -> Dict[str, np.ndarray]:
    """Sample ~n windows and produce the TB visual products
    (validate.py:11-59): reconstruction triplets, disparities, masks."""
    depth_apply, pose_apply = _applies(cfg, depth_model, pose_model, params,
                                       batch_stats)
    idxs = np.arange(0, len(dataset),
                     max(int(len(dataset) / n_samples) - 1, 1))[:n_samples]

    triplets, disps, masks, d_masks, rec_disps = [], [], [], [], []
    for i in idxs:
        s = dataset[int(i)]
        tgt = jnp.asarray(s["target_img_aug"][None])
        src = jnp.asarray(s["source_imgs_aug"][:, None])
        K = jnp.asarray(s["intrinsics_aug"][None])

        disparities = solve_disp(depth_apply, tgt, src)
        depths = jnp.stack([
            disp_to_depth(disparities[f][0], cfg.min_depth, cfg.max_depth)[1]
            for f in range(len(disparities))
        ])
        if cfg.iterations == 1:
            poses, poses_inv = solve_pose(pose_apply, tgt, src,
                                          _maybe_flows(cfg, tgt, src))
        else:
            poses, poses_inv = solve_pose_iteratively(
                cfg.iterations, depths, pose_apply, tgt, src, K)

        src_depth = depths[1 + source_idx]
        rec, valid, proj_depth, comp_depth = inverse_warp2(
            src[source_idx], depths[0], src_depth,
            -poses[source_idx], K)

        diff = jnp.clip(jnp.abs(src[source_idx] - rec), 0, 1)
        auto = (jnp.mean(diff, -1, keepdims=True)
                < jnp.mean(jnp.abs(tgt - src[source_idx]), -1, keepdims=True)
                ).astype(jnp.float32) * valid
        auto = auto * (jnp.mean(rec, -1, keepdims=True) != 0)

        d_loss = jnp.clip(jnp.abs(comp_depth - proj_depth)
                          / (comp_depth + proj_depth), 0, 1)

        triplets.append(np.stack([
            np.asarray(src[source_idx][0]), np.asarray(rec[0]),
            np.asarray(tgt[0]),
        ]))
        disps.append(np.asarray(disparities[0][0][0, ..., 0]))
        masks.append(np.asarray(auto[0, ..., 0]))
        d_masks.append(np.asarray(1.0 - d_loss[0, ..., 0]))
        rec_disps.append(np.asarray(jnp.clip(depth_to_disp(
            proj_depth[0, ..., 0], cfg.min_depth, cfg.max_depth), 0, 1)))

    return {
        "triplets": np.stack(triplets),          # [N, 3, H, W, 3]
        "disparities": np.stack(disps),          # [N, H, W]
        "exp_masks": np.stack(masks),
        "depth_masks": np.stack(d_masks),
        "reconstructed_disps": np.stack(rec_disps),
    }


def trajectory_eval(cfg: Config, depth_model, pose_model, params, batch_stats,
                    dataset, gt_traj: np.ndarray, batch_size: int = 8,
                    use_mxu_warp: bool = False,
                    verbose: bool = True) -> Tuple[np.ndarray, np.ndarray, tuple]:
    """Full test-sequence trajectory during training (validate.py:105-135).

    dataset must yield windows over ONE sequence in order; returns
    (est_poses [N, 6], gt_lie [N, 6], errors).
    """
    from tcsfm.data.loader import BatchLoader

    # params as jit args (closure constants stall remote compiles)
    @jax.jit
    def infer(params, batch_stats, tgt, src, K):
        depth_apply, pose_apply = _applies(cfg, depth_model, pose_model,
                                           params, batch_stats)
        disparities = solve_disp(depth_apply, tgt, src)
        depths = jnp.stack([
            disp_to_depth(disparities[f][0], cfg.min_depth, cfg.max_depth)[1]
            for f in range(len(disparities))
        ])
        if cfg.iterations == 1:
            poses, poses_inv = solve_pose(pose_apply, tgt, src,
                                          _maybe_flows(cfg, tgt, src))
        else:
            poses, poses_inv = solve_pose_iteratively(
                cfg.iterations, depths, pose_apply, tgt, src, K,
                use_mxu_warp=use_mxu_warp, mxu_exact=cfg.mxu_exact,
                mxu_band_guard=cfg.mxu_band_guard,
                mxu_band=cfg.mxu_band)
        return poses[0]

    loader = BatchLoader(dataset, batch_size, shuffle=False, drop_last=False,
                         pad_tail=True)
    est, gts = [], []
    for batch in loader:
        valid = batch.pop("_valid")
        poses = np.asarray(infer(
            params, batch_stats,
            jnp.asarray(batch["target_img"]),
            jnp.asarray(batch["source_imgs"]),
            jnp.asarray(batch["intrinsics"])))
        n = int(valid.sum())
        est.append(poses[:n])
        gts.append(batch["gt_lie_alg"][0][:n])
    est = np.concatenate(est)
    gts = np.concatenate(gts)
    est_scaled = est.copy()
    est_scaled[:, 0:3] *= METRIC_SCALE            # validate.py:127

    _, _, errors, _ = compute_trajectory(
        est_scaled, gt_traj, method="est", compute_seg_err=True,
        verbose=verbose)
    return est_scaled, gts, errors
