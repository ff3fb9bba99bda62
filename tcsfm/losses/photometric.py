"""Self-supervised SfM loss stack, NHWC, fully jittable.

TPU-native re-design of the reference loss semantics (losses.py:11-194 and
the pose-consistency term at train_mono.py:8-16):

  * SSIM: reflection-pad-1 + 3x3 box filters (losses.py:16-41), expressed
    with ``lax.reduce_window`` so XLA fuses the five pooling passes.
  * edge-aware smoothness with mean-normalized disparity (losses.py:43-61).
  * per-source pairwise photometric loss: L1+SSIM blend, Monodepth2
    auto-masking, SC-SfMLearner depth-consistency weighting, min-fused
    forward reconstruction, 0.3-weighted inverse reconstruction
    (losses.py:75-183).

All reductions keep static shapes; the >10k-valid-pixel guard of
``mean_on_mask`` (losses.py:142-149) is a ``jnp.where``, not Python
control flow, so the whole stack lives under one jit.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

from tcsfm.config import Config
from tcsfm.geom.warp import inverse_warp2, inverse_warp2_mxu
from tcsfm.utils.helpers import disp_to_depth

_C1 = 0.01 ** 2
_C2 = 0.03 ** 2


def _box3(x: jax.Array) -> jax.Array:
    """Reflection-pad(1) + 3x3 mean filter over NHWC (torch AvgPool2d(3,1))."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    s = lax.reduce_window(
        xp, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "VALID"
    )
    return s / 9.0


def ssim_loss(x: jax.Array, y: jax.Array) -> jax.Array:
    """Per-pixel SSIM dissimilarity in [0, 1] (losses.py:11-41).

    Matches the reference ordering exactly: images are reflection-padded
    *before* the statistics pools, i.e. mu/sigma are computed on padded
    images with a VALID 3x3 window.
    """
    mu_x = _box3(x)
    mu_y = _box3(y)
    sigma_x = _box3(x * x) - mu_x * mu_x
    sigma_y = _box3(y * y) - mu_y * mu_y
    sigma_xy = _box3(x * y) - mu_x * mu_y
    n = (2 * mu_x * mu_y + _C1) * (2 * sigma_xy + _C2)
    d = (mu_x * mu_x + mu_y * mu_y + _C1) * (sigma_x + sigma_y + _C2)
    return jnp.clip((1 - n / d) / 2, 0.0, 1.0)


def smooth_loss(disp: jax.Array, img: jax.Array) -> jax.Array:
    """Edge-aware disparity smoothness with mean normalization (losses.py:43-61).

    disp: [B, H, W, 1]; img: [B, H, W, C].
    """
    mean_disp = jnp.mean(disp, axis=(1, 2), keepdims=True)
    d = disp / (mean_disp + 1e-7)

    grad_disp_x = jnp.abs(d[:, :, :-1] - d[:, :, 1:])
    grad_disp_y = jnp.abs(d[:, :-1] - d[:, 1:])
    grad_img_x = jnp.mean(jnp.abs(img[:, :, :-1] - img[:, :, 1:]), -1, keepdims=True)
    grad_img_y = jnp.mean(jnp.abs(img[:, :-1] - img[:, 1:]), -1, keepdims=True)

    return (
        jnp.mean(grad_disp_x * jnp.exp(-grad_img_x))
        + jnp.mean(grad_disp_y * jnp.exp(-grad_img_y))
    )


def pose_consistency_loss(poses: jax.Array, poses_inv: jax.Array) -> jax.Array:
    """mean |pose + pose_inv| over sources (train_mono.py:8-16).

    poses, poses_inv: [S, B, 6] — forward and inverse 6-DoF predictions.
    NOTE: the reference *sums* per-source means then takes .mean() of the
    accumulated [B, 6] tensor; summing the per-source means is identical.
    """
    return jnp.sum(jnp.mean(jnp.abs(poses + poses_inv), axis=(1, 2)))


def mean_on_mask(diff: jax.Array, valid_mask: jax.Array,
                 min_pixels: int = 10000) -> jax.Array:
    """Masked mean with the reference's sparse-mask guard (losses.py:142-149).

    Returns 0 when fewer than ``min_pixels`` pixels are valid — expressed
    with ``where`` so it stays jittable.
    """
    mask = jnp.broadcast_to(valid_mask, diff.shape)
    total = jnp.sum(mask)
    mean_val = jnp.sum(diff * mask) / jnp.maximum(total, 1.0)
    return jnp.where(total > min_pixels, mean_val, 0.0)


def pairwise_loss(cfg: Config, tgt_img, ref_img, tgt_depth, ref_depth, pose, K):
    """One target↔reference photometric term (losses.py:151-183).

    Args mirror compute_pairwise_loss: pose is already negated by the
    caller. Returns (l_reprojection, l_depth, diff_img [B,H,W,1],
    valid_mask [B,H,W,1]).
    """
    if cfg.use_mxu_warp:
        # ref_img is a camera frame (data leaf) → img_grad=False skips its
        # dead d_img; the resampled ref DEPTH keeps full gradients
        warp = functools.partial(inverse_warp2_mxu, exact=cfg.mxu_exact,
                                 guard=cfg.mxu_band_guard, band=cfg.mxu_band,
                                 img_grad=False)
    else:
        warp = inverse_warp2
    warped, valid_mask, projected_depth, computed_depth = warp(
        ref_img, tgt_depth, ref_depth, pose, K
    )

    diff_img = jnp.clip(jnp.abs(tgt_img - warped), 0.0, 1.0)

    if cfg.with_auto_mask:
        auto = (
            jnp.mean(diff_img, -1, keepdims=True)
            < jnp.mean(jnp.abs(tgt_img - ref_img), -1, keepdims=True)
        ).astype(diff_img.dtype)
        valid_mask = auto * valid_mask

    if cfg.l_ssim:
        ssim_map = ssim_loss(tgt_img, warped)
        diff_img = jnp.mean(
            cfg.l1_weight * diff_img + cfg.l_ssim_weight * ssim_map,
            -1, keepdims=True,
        )

    diff_depth = jnp.clip(
        jnp.abs(computed_depth - projected_depth)
        / (computed_depth + projected_depth),
        0.0, 1.0,
    )
    if cfg.with_depth_mask:
        diff_img = diff_img * (1.0 - diff_depth)

    l_depth = mean_on_mask(diff_depth, valid_mask) if cfg.l_depth_consist else 0.0
    l_reprojection = mean_on_mask(diff_img, valid_mask)
    return l_reprojection, l_depth, diff_img, valid_mask


def _grouped_mean_on_mask(diff: jax.Array, mask: jax.Array,
                          min_pixels: int = 10000) -> jax.Array:
    """Per-group masked means with the sparse guard: diff/mask [G, B, H, W, 1]
    → [G] (each group is one (direction, source) pair)."""
    total = jnp.sum(mask, axis=(1, 2, 3, 4))
    val = jnp.sum(diff * mask, axis=(1, 2, 3, 4)) / jnp.maximum(total, 1.0)
    return jnp.where(total > min_pixels, val, 0.0)


def compute_losses(cfg: Config,
                   source_imgs: jax.Array,
                   target_img: jax.Array,
                   poses: jax.Array,
                   poses_inv: jax.Array,
                   disparities: Sequence[Sequence[jax.Array]],
                   K: jax.Array) -> dict:
    """Full multi-scale loss dict (losses.py:75-140).

    TPU note: all 2·S pairwise photometric terms of a scale run as ONE
    packed warp + SSIM batch of 2·S·B (the same batching trick the solver
    uses, train_mono.py:54-64) — per-source results come from reshapes,
    not separate kernel launches. Math is identical to per-pair
    ``pairwise_loss``.

    Args:
      source_imgs: [S, B, H, W, 3] source images (clean stream).
      target_img:  [B, H, W, 3] target image (clean stream).
      poses:       [S, B, 6] final coupled poses (target→source convention
                   of the solver; negated internally for the warp).
      poses_inv:   [S, B, 6] inverse poses.
      disparities: disparities[f][s] = [B, h_s, w_s, 1] sigmoid disparity of
                   frame f (0 = target, 1.. = sources) at scale s.
      K:           [B, 3, 3] intrinsics.

    Returns dict with l_reconstruct_forward / l_reconstruct_inverse /
    l_depth / l_smooth / total — each already divided by num_scales, scale
    terms by 2^scale, mirroring losses.py:92,108,134-138.
    """
    S = source_imgs.shape[0]
    b, h, w, _ = target_img.shape
    num_scales = cfg.num_scales
    if cfg.use_mxu_warp:
        # warped sources are camera frames (data leaves) → img_grad=False
        warp = functools.partial(inverse_warp2_mxu, exact=cfg.mxu_exact,
                                 guard=cfg.mxu_band_guard, band=cfg.mxu_band,
                                 img_grad=False)
    else:
        warp = inverse_warp2

    losses = {
        "l_reconstruct_inverse": 0.0,
        "l_reconstruct_forward": 0.0,
        "l_depth": 0.0,
        "l_smooth": 0.0,
    }

    tgt_scales = disparities[0]
    src_scales = disparities[1:]
    src_flat = source_imgs.reshape((S * b, h, w, 3))
    tgt_rep = jnp.tile(target_img, (S, 1, 1, 1))

    for scale in range(num_scales):
        disp = tgt_scales[scale]
        if disp.shape[1] != h:
            disp = jax.image.resize(disp, (b, h, w, 1), method="nearest")
        _, d = disp_to_depth(disp, cfg.min_depth, cfg.max_depth)

        sdisps = []
        for j in range(S):
            sd = src_scales[j][scale]
            if sd.shape[1] != h:
                sd = jax.image.resize(sd, (b, h, w, 1), method="nearest")
            sdisps.append(sd)
        sdisp_flat = jnp.concatenate(sdisps, axis=0)         # [SB, H, W, 1]
        _, src_d_flat = disp_to_depth(sdisp_flat, cfg.min_depth, cfg.max_depth)

        if cfg.l_smooth:
            losses["l_smooth"] += (
                cfg.l_smooth_weight * smooth_loss(disp, target_img)
            ) / (2 ** scale)
            # per-source smoothness, batched; sum of per-pair means equals
            # the reference's accumulation (losses.py:108)
            for j in range(S):
                losses["l_smooth"] += (
                    cfg.l_smooth_weight * smooth_loss(sdisps[j], source_imgs[j])
                ) / (2 ** scale)

        if not cfg.l_reconstruction:
            continue

        d_rep = jnp.tile(d, (S, 1, 1, 1))
        # pack [fwd (S·B) ; inv (S·B)] exactly like the solver
        tgt_pack = jnp.concatenate([tgt_rep, src_flat], 0)
        ref_pack = jnp.concatenate([src_flat, tgt_rep], 0)
        tgtd_pack = jnp.concatenate([d_rep, src_d_flat], 0)
        refd_pack = jnp.concatenate([src_d_flat, d_rep], 0)
        pose_pack = jnp.concatenate(
            [-poses.reshape(S * b, 6), -poses_inv.reshape(S * b, 6)], 0)
        K_pack = jnp.tile(K, (2 * S, 1, 1))

        warped, valid_mask, projected_depth, computed_depth = warp(
            ref_pack, tgtd_pack, refd_pack, pose_pack, K_pack)

        diff_img = jnp.clip(jnp.abs(tgt_pack - warped), 0.0, 1.0)
        if cfg.with_auto_mask:
            auto = (
                jnp.mean(diff_img, -1, keepdims=True)
                < jnp.mean(jnp.abs(tgt_pack - ref_pack), -1, keepdims=True)
            ).astype(diff_img.dtype)
            valid_mask = auto * valid_mask
        if cfg.l_ssim:
            ssim_map = ssim_loss(tgt_pack, warped)
            diff_img = jnp.mean(
                cfg.l1_weight * diff_img + cfg.l_ssim_weight * ssim_map,
                -1, keepdims=True)
        diff_depth = jnp.clip(
            jnp.abs(computed_depth - projected_depth)
            / (computed_depth + projected_depth), 0.0, 1.0)
        if cfg.with_depth_mask:
            diff_img = diff_img * (1.0 - diff_depth)

        # regroup [2SB, ...] → [2S, B, H, W, 1]
        diff_g = diff_img.reshape((2 * S, b, h, w, 1))
        mask_g = valid_mask.reshape((2 * S, b, h, w, 1))

        if cfg.l_depth_consist:
            dd_g = diff_depth.reshape((2 * S, b, h, w, 1))
            n_groups = 2 * S if cfg.l_inverse else S
            losses["l_depth"] += cfg.l_depth_consist_weight * jnp.sum(
                _grouped_mean_on_mask(dd_g[:n_groups], mask_g[:n_groups]))

        # forward: min over sources, unmasked mean (losses.py:129-132)
        fwd_err = jnp.moveaxis(diff_g[:S], 0, -1)[..., 0, :]  # [B,H,W,S]
        losses["l_reconstruct_forward"] += jnp.mean(jnp.min(fwd_err, axis=-1))

        if cfg.l_inverse:
            losses["l_reconstruct_inverse"] += 0.3 * jnp.sum(
                _grouped_mean_on_mask(diff_g[S:], mask_g[S:]))

    total = 0.0
    for key in list(losses.keys()):
        losses[key] = losses[key] / num_scales
        total = total + losses[key]
    losses["total"] = total
    return losses
