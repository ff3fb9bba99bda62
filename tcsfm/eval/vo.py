"""VO evaluation over full sequences (evaluate_vo_model.py equivalent).

Runs pair-wise (target, source) coupled inference along a sequence, fuses
forward/inverse predictions, applies metric scaling (GT mean-norm and/or
DNet ground-plane), and computes trajectory errors.

TPU design: the per-batch work (depth + iterative pose + scale factor) is
one jitted function; windows stream through it at fixed batch size with a
padded tail, so the whole sequence runs without recompiles.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tcsfm.config import Config
from tcsfm.data.dataset import SfMWindowDataset, SequenceData
from tcsfm.data.loader import BatchLoader
from tcsfm.data.transforms import WindowTransform
from tcsfm.eval.scale_recovery import scale_recovery
from tcsfm.eval.trajectory import ResultsLogger, compute_trajectory
from tcsfm.solver.coupled import solve_pose, solve_pose_iteratively
from tcsfm.utils.helpers import disp_to_depth

METRIC_SCALE = 30.0


class VOEvaluator:
    def __init__(self, cfg: Config, depth_model, pose_model, params,
                 batch_stats, dnet_rescaling: bool = True,
                 cam_height: Optional[float] = None,
                 use_mxu_warp: bool = False):
        self.cfg = cfg
        self.dnet = dnet_rescaling
        self.cam_height = cam_height if cam_height is not None else cfg.camera_height
        # params are jit ARGUMENTS, not closures: closed-over pytrees embed
        # ~60MB of constants in the executable and stall remote compiles
        self._params = params
        self._batch_stats = batch_stats

        iterations = cfg.iterations

        from tcsfm.models.depth import make_depth_apply

        @jax.jit
        def infer(params, batch_stats, target_img, source_imgs, K):
            dvars = {"params": params["depth"], "batch_stats": batch_stats}
            pvars = {"params": params["pose"]}
            depth_apply = make_depth_apply(depth_model, dvars)
            pose_apply = lambda im: pose_model.apply(pvars, im)    # noqa: E731

            S, b = source_imgs.shape[0], target_img.shape[0]
            imgs = jnp.concatenate(
                [target_img,
                 source_imgs.reshape((S * b,) + source_imgs.shape[2:])], 0)
            disp_raw = depth_apply(imgs)[0]
            scaled_disp, depth_all = disp_to_depth(
                disp_raw, cfg.min_depth, cfg.max_depth)
            depths = jnp.stack(
                [depth_all[f * b:(f + 1) * b] for f in range(S + 1)])

            if iterations == 1:
                flows = None
                if cfg.flow_type == "classical":
                    # on-device Farneback pair per source (reference computes
                    # this host-side in the loader, kitti_loader_stereo.py:106)
                    from tcsfm.ops.flow import batched_flow_pair
                    tgt_b = jnp.broadcast_to(target_img[None],
                                             source_imgs.shape)
                    fwd, back = jax.vmap(batched_flow_pair)(tgt_b, source_imgs)
                    flows = (fwd, back)
                poses, poses_inv = solve_pose(pose_apply, target_img,
                                              source_imgs, flows)
            else:
                poses, poses_inv = solve_pose_iteratively(
                    iterations, depths, pose_apply, target_img, source_imgs, K,
                    use_mxu_warp=use_mxu_warp, mxu_exact=cfg.mxu_exact,
                    mxu_band_guard=cfg.mxu_band_guard,
                    mxu_band=cfg.mxu_band)

            scale = jnp.ones((b,))
            if self.dnet:
                # metric depth for ground-plane height (evaluate_vo_model.py:107-112)
                metric_depth = METRIC_SCALE * depths[0][..., 0]
                # per-sample scale: vmap over the batch
                scale = jax.vmap(
                    lambda d, k: scale_recovery(d[None], k[None],
                                                self.cam_height)
                )(metric_depth, K)
            return poses, poses_inv, scale

        self._infer = infer

    def run_sequence(self, seq: SequenceData, batch_size: int = 8,
                     verbose: bool = True,
                     logger: Optional[ResultsLogger] = None) -> Dict:
        """Full-sequence VO: pair windows (img_per_sample=2), stride 1."""
        ds = SfMWindowDataset(
            [seq], seq_len=2,
            transform=WindowTransform(jitter=False, flip_prob=None),
        )
        loader = BatchLoader(ds, batch_size, shuffle=False, drop_last=False,
                             pad_tail=True, prefetch=2)

        fwd, inv, gts, scales = [], [], [], []

        def drain(entry):
            n, gt, (poses, poses_inv, scale) = entry
            fwd.append(np.asarray(poses[0])[:n])
            inv.append(np.asarray(poses_inv[0])[:n])
            gts.append(gt[:n])
            scales.append(np.asarray(scale)[:n])

        # bounded async pipeline (depth 2, same pattern as
        # run_sequential_pft): dispatch ahead so host loading overlaps
        # device inference, but drain eagerly — an unbounded pending list
        # keeps every batch's ~25MB input buffers live on device at once
        # (~5GB for KITTI seq 09)
        pending = []
        for batch in loader:
            valid = batch.pop("_valid")
            out = self._infer(
                self._params, self._batch_stats,
                jnp.asarray(batch["target_img"]),
                jnp.asarray(batch["source_imgs"]),
                jnp.asarray(batch["intrinsics"]),
            )
            pending.append((int(valid.sum()), batch["gt_lie_alg"][0], out))
            while len(pending) > 2:
                drain(pending.pop(0))
        for entry in pending:
            drain(entry)

        fwd = np.concatenate(fwd)
        inv = np.concatenate(inv)
        gts = np.concatenate(gts)
        scales = np.concatenate(scales).reshape(-1, 1)

        fwd[:, 0:3] *= METRIC_SCALE
        inv[:, 0:3] *= METRIC_SCALE
        return metrics_from_pose_vecs(seq.name, seq.gt_poses, fwd, inv, gts,
                                      scales, dnet=self.dnet,
                                      verbose=verbose, logger=logger)


def metrics_from_pose_vecs(seq_name: str, gt_traj, fwd: np.ndarray,
                           inv: np.ndarray, gts: np.ndarray,
                           scales: Optional[np.ndarray], dnet: bool = True,
                           verbose: bool = True,
                           logger: Optional[ResultsLogger] = None) -> Dict:
    """Trajectory metrics from (already metric-scaled) fwd/inv pose vecs.

    The shared tail of VO evaluation — fwd/inv fusion, DNet and GT
    scaling variants (evaluate_vo_model.py:140-184) — factored out so
    saved predictions can be re-evaluated without rerunning the networks.
    """
    unscaled = (fwd - inv) / 2.0                  # evaluate_vo_model.py:140

    results = {"fwd_pose_vec": fwd, "inv_pose_vec": inv,
               "gt_pose_vec": gts, "dnet_scale_factor": scales,
               "gt_traj": np.asarray(gt_traj), "est_trajs": {}}
    logger = logger if logger is not None else ResultsLogger()

    est, _, errors, _ = compute_trajectory(
        unscaled, gt_traj, method="unscaled", compute_seg_err=True,
        verbose=verbose)
    logger.log(seq_name, "unscaled", *errors)
    results["errors_unscaled"] = errors
    results["est_trajs"]["unscaled"] = est

    if dnet and scales is not None:
        scaled_dnet = unscaled.copy()
        scaled_dnet[:, 0:3] *= scales
        est, _, errors, _ = compute_trajectory(
            scaled_dnet, gt_traj, method="scaled (dnet)",
            compute_seg_err=True, verbose=verbose)
        logger.log(seq_name, "dnet scaled", *errors)
        results["errors_dnet"] = errors
        results["est_trajs"]["dnet"] = est

    # GT mean-norm scaling (evaluate_vo_model.py:142-145)
    gt_scale = (
        np.mean(np.linalg.norm(gts[:, 0:3], axis=1))
        / max(np.mean(np.linalg.norm(unscaled[:, 0:3], axis=1)), 1e-12)
    )
    scaled_gt = unscaled.copy()
    scaled_gt[:, 0:3] *= gt_scale
    est, _, errors, _ = compute_trajectory(
        scaled_gt, gt_traj, method="scaled (gt)", compute_seg_err=True,
        verbose=verbose)
    logger.log(seq_name, "gt scaled", *errors)
    results["errors_gt_scaled"] = errors
    results["est_trajs"]["gt"] = est
    results["gt_scale"] = gt_scale
    results["logger"] = logger.results
    return results


def save_predictions(path: str, results: Dict) -> None:
    """Persist a run_sequence result for later replay
    (the reference's .mat save at run_sequential_optimization.py:257-267,
    as npz)."""
    np.savez(
        path,
        fwd_pose_vec=results["fwd_pose_vec"],
        inv_pose_vec=results["inv_pose_vec"],
        gt_pose_vec=results["gt_pose_vec"],
        dnet_scale_factor=np.asarray(results["dnet_scale_factor"]),
    )


def evaluate_saved_predictions(path: str, seq: SequenceData,
                               dnet: bool = True,
                               verbose: bool = True,
                               logger: Optional[ResultsLogger] = None) -> Dict:
    """Replay VO metrics from saved predictions without rerunning the
    networks (the reference's load_from_mat path,
    evaluate_vo_model.py:25,137)."""
    d = np.load(path)
    scales = (d["dnet_scale_factor"].reshape(-1, 1)
              if "dnet_scale_factor" in d.files else None)
    return metrics_from_pose_vecs(
        seq.name, seq.gt_poses, d["fwd_pose_vec"], d["inv_pose_vec"],
        d["gt_pose_vec"], scales, dnet=dnet, verbose=verbose, logger=logger)
