"""Self-validating paper experiments as library functions.

These are the reference's de-facto regression tests (SURVEY.md §4):
  * loss surface: photometric error vs translation/yaw offsets around the
    estimate (optimization_experiments/plot_loss_surface.py:11-87) — the
    estimate should sit at the minimum;
  * pose perturbation: inject trans/yaw noise into the coupled iterations;
    multi-iteration models pull the pose back
    (paper_plots_and_data/pose_perturbation_experiment.py);
  * depth scaling: scale depth by a factor; for coupled models the
    translation norm tracks the factor ~linearly
    (paper_plots_and_data/depth_scaling_experiment.py).

All device work is jitted; sweeps are vmapped where shapes allow.
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tcsfm.geom.warp import inverse_warp2
from tcsfm.losses.photometric import ssim_loss
from tcsfm.solver.coupled import solve_pose_iteratively


def photometric_error(target_img, source_img, target_depth, source_depth,
                      pose, K, automask: bool = True) -> jax.Array:
    """Masked SSIM+L1 photometric error for one pose hypothesis
    (optimization_experiments/helpers.py:8-23). Returns [B].

    ``automask=False`` drops the stationarity mask — useful for loss
    surfaces, where the shrinking automask at bad poses creates spurious
    low-error dips.
    """
    img_rec, valid_mask, projected_depth, computed_depth = inverse_warp2(
        source_img, target_depth, source_depth, -pose, K)
    tgt = jax.lax.stop_gradient(target_img)
    diff = jnp.mean(
        0.15 * jnp.clip(jnp.abs(img_rec - tgt), 0, 1)
        + 0.85 * ssim_loss(tgt, img_rec),
        axis=-1, keepdims=True)
    mask = valid_mask
    if automask:
        auto = jnp.mean(
            0.15 * jnp.clip(jnp.abs(source_img - tgt), 0, 1)
            + 0.85 * ssim_loss(tgt, source_img),
            axis=-1, keepdims=True)
        mask = (diff < auto).astype(diff.dtype) * valid_mask
    num = jnp.sum(diff * mask, axis=(1, 2, 3))
    den = jnp.sum(mask, axis=(1, 2, 3))
    # empty mask → NaN, matching the reference's 0/0 at degenerate poses
    return jnp.where(den > 0, num / jnp.maximum(den, 1.0), jnp.nan)


def loss_surface(target_img, source_img, target_depth, source_depth,
                 pose, K, trans_offsets: np.ndarray,
                 yaw_offsets: np.ndarray,
                 automask: bool = True) -> Dict[str, np.ndarray]:
    """Photometric error along tz and yaw offsets around ``pose``.

    Mirrors generate_loss_surface (run_sample_optimization_demo.py:214-217 /
    plot_loss_surface.py): a 1-D sweep per axis, vmapped on device.
    Returns {'trans': [T, B], 'yaw': [Y, B]}.
    """
    @jax.jit
    def sweep_trans(offsets):
        def one(dz):
            p = pose.at[:, 2].add(dz)
            return photometric_error(target_img, source_img, target_depth,
                                     source_depth, p, K, automask=automask)
        return jax.vmap(one)(offsets)

    @jax.jit
    def sweep_yaw(offsets):
        def one(dy):
            p = pose.at[:, 4].add(dy)
            return photometric_error(target_img, source_img, target_depth,
                                     source_depth, p, K, automask=automask)
        return jax.vmap(one)(offsets)

    return {
        "trans": np.asarray(sweep_trans(jnp.asarray(trans_offsets))),
        "yaw": np.asarray(sweep_yaw(jnp.asarray(yaw_offsets))),
    }


def perturbation_response(num_iter: int, depths, pose_apply, target_img,
                          source_imgs, K, trans_pert: float = 0.0,
                          yaw_pert: float = 0.0):
    """Coupled solve with an injected initial-pose perturbation
    (pose_perturbation_experiment.py:146-151). Returns (clean, perturbed)
    final pose stacks [S, B, 6]."""
    S, b = source_imgs.shape[0], target_img.shape[0]
    n = 2 * S * b
    clean, _ = solve_pose_iteratively(
        num_iter, depths, pose_apply, target_img, source_imgs, K)
    pert, _ = solve_pose_iteratively(
        num_iter, depths, pose_apply, target_img, source_imgs, K,
        trans_pert=jnp.full((n,), trans_pert),
        yaw_pert=jnp.full((n,), yaw_pert),
    )
    return clean, pert


def depth_scaling_response(num_iter: int, depths, pose_apply, target_img,
                           source_imgs, K,
                           scales: Sequence[float]) -> np.ndarray:
    """Mean translation norm of the coupled estimate vs depth scale
    (depth_scaling_experiment.py:134). Returns [len(scales)]."""
    out = []
    for s in scales:
        poses, _ = solve_pose_iteratively(
            num_iter, jnp.asarray(depths) * s, pose_apply, target_img,
            source_imgs, K)
        out.append(float(jnp.mean(jnp.linalg.norm(poses[..., 0:3], axis=-1))))
    return np.asarray(out)
