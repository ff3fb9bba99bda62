"""The coupled depth↔pose solver — the central, jittable API of the framework.

TPU-native re-design of the reference's single shared kernel
(train_mono.py:18-132), used identically by training, validation, VO/depth
evaluation, PFT, and the paper experiments (SURVEY.md §1).

Design notes (TPU-first):
  * Sources are a stacked axis [S, B, ...], not a Python list; all
    forward+inverse pairs are packed into ONE pose-net batch of 2·S·B
    (same batching trick as train_mono.py:54-64) so the conv stack runs
    at maximum MXU utilization.
  * The iteration loop is a static Python unroll over ``num_iter`` (a
    compile-time constant, 4 in the paper) — XLA sees one straight-line
    graph and can overlap the warp with the conv stack.
  * Everything is functional: networks are passed as ``apply`` callables
    over parameter pytrees, so the same solver is differentiated through
    end-to-end for training and re-used under ``stop_gradient`` for eval.
"""

from __future__ import annotations

import functools
from typing import Callable, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from tcsfm.geom.warp import inverse_warp2, inverse_warp2_mxu
from tcsfm.losses.photometric import ssim_loss


class CoupledOutputs(NamedTuple):
    """Per-direction error products of the final coupled iteration.

    All leading dims are [S*B] (source-major packing, matching the
    reference's outputs['fwd'/'inv'] at train_mono.py:94-100).
    """

    diff_img: jax.Array        # [S*B, H, W, 1]
    img_rec: jax.Array         # [S*B, H, W, 3]
    valid_mask: jax.Array      # [S*B, H, W, 1]
    weight_mask: jax.Array     # [S*B, H, W, 1]
    poses: jax.Array           # [S*B, num_iter, 6] per-iteration pose chain
    auto_mask_error: jax.Array  # [S*B, H, W, 1]
    auto_mask: jax.Array       # [S*B, H, W, 1]


def solve_disp(depth_apply: Callable, target_img: jax.Array,
               source_imgs: jax.Array) -> List[List[jax.Array]]:
    """Run the depth network once over target + all sources (train_mono.py:123-132).

    Args:
      depth_apply: images [N, H, W, 3] → list of [N, h_s, w_s, 1] disparities.
      target_img:  [B, H, W, 3]; source_imgs: [S, B, H, W, 3].

    Returns:
      disparities[f][s]: frame f (0 = target, 1.. = sources) at scale s.
    """
    S, b = source_imgs.shape[0], target_img.shape[0]
    imgs = jnp.concatenate(
        [target_img, source_imgs.reshape((S * b,) + source_imgs.shape[2:])], 0
    )
    disps = depth_apply(imgs)
    out = []
    for f in range(S + 1):
        out.append([d[f * b:(f + 1) * b] for d in disps])
    return out


def solve_pose(pose_apply: Callable, target_img: jax.Array,
               source_imgs: jax.Array,
               flows: Optional[Tuple[jax.Array, jax.Array]] = None,
               ) -> Tuple[jax.Array, jax.Array]:
    """One-shot (non-iterative) pose for each source (train_mono.py:18-39).

    Args:
      flows: optional (flow_fwd, flow_back), each [S, B, H, W, 2] — the
        classical-optical-flow extra channels of ``flow_type='classical'``
        (reference train_mono.py:22-29; computed on-device by
        `tcsfm.ops.flow.batched_flow_pair` instead of host cv2).

    Returns (poses [S, B, 6], poses_inv [S, B, 6]).
    """
    S, b = source_imgs.shape[0], target_img.shape[0]
    tgt = jnp.broadcast_to(target_img[None], source_imgs.shape)
    fwd = jnp.concatenate([tgt, source_imgs], axis=-1)       # [S, B, H, W, 6]
    inv = jnp.concatenate([source_imgs, tgt], axis=-1)
    if flows is not None:
        flow_fwd, flow_back = flows
        fwd = jnp.concatenate([fwd, flow_fwd], axis=-1)      # [S, B, H, W, 8]
        inv = jnp.concatenate([inv, flow_back], axis=-1)
    stacked = jnp.concatenate([fwd, inv], axis=0).reshape(
        (2 * S * b,) + fwd.shape[2:]
    )
    poses = pose_apply(stacked)
    return poses[: S * b].reshape(S, b, 6), poses[S * b:].reshape(S, b, 6)


def solve_pose_iteratively(
    num_iter: int,
    depths: Sequence[jax.Array],
    pose_apply: Callable,
    target_img: jax.Array,
    source_imgs: jax.Array,
    K: jax.Array,
    return_errors: bool = False,
    trans_pert: Optional[jax.Array] = None,
    yaw_pert: Optional[jax.Array] = None,
    use_mxu_warp: bool = False,
    mxu_exact: bool = True,
    mxu_band_guard: bool = True,
    mxu_band: int = 32,
    remat: bool = False,
):
    """Iterative coupled pose estimation (train_mono.py:41-120).

    The initial pose comes from the raw (target, source) pair; each further
    iteration warps the source with the current depth+pose and feeds
    (masked target, reconstruction) back through the pose net to predict a
    *correction* added to the running estimate.

    Args:
      num_iter:    static number of coupled iterations (>= 1).
      depths:      [S+1, B, H, W, 1] (or sequence) — target depth first,
                   then source depths, full resolution.
      pose_apply:  [N, H, W, 6] stacked pairs → [N, 6] pose vectors.
      target_img:  [B, H, W, 3]; source_imgs: [S, B, H, W, 3].
      K:           [B, 3, 3] intrinsics.
      return_errors: also build the fwd/inv error products (masks, diff
                   images, per-iteration pose chains) used by the losses
                   and PFT.
      trans_pert / yaw_pert: optional [2SB]-broadcastable perturbations
                   injected into the *initial* pose estimate — the
                   fault-injection capability of
                   pose_perturbation_experiment.py:146-151.
      use_mxu_warp: route warps through the Pallas MXU sampler.
      mxu_exact:   False selects the single-pass bf16 sampler (half the
                   matmul cost, ~2e-3 abs image noise); "mixed" keeps the
                   sampled source depth f32-exact while RGB goes bf16
                   (5/8 of exact's matmul rows) — see inverse_warp2_mxu.
      mxu_band_guard: True folds the banded kernel's per-pixel vertical
                   coverage into the warp valid mask (out-of-band pixels
                   are treated as out-of-view — no silent-zeros path
                   reachable from training, full MXU speed);
                   "fallback" instead lax.cond-falls back to the XLA
                   sampler for the whole batch on any violation.

    Returns:
      (poses [S, B, 6], poses_inv [S, B, 6]) and, when return_errors, a
      dict {'fwd': CoupledOutputs, 'inv': CoupledOutputs, 'comb': {...}}.
    """
    depths = jnp.asarray(depths)
    S, b = source_imgs.shape[0], target_img.shape[0]
    split = S * b
    tgt_depth, src_depths = depths[0], depths[1:]

    # --- batched fwd+inv packing (train_mono.py:54-64) --------------------
    src_depths_flat = src_depths.reshape((split,) + src_depths.shape[2:])
    tgt_depths_flat = jnp.tile(tgt_depth, (S, 1, 1, 1))
    src_flat = source_imgs.reshape((split,) + source_imgs.shape[2:])
    tgt_flat = jnp.tile(target_img, (S, 1, 1, 1))

    fwd_imgs = jnp.concatenate([tgt_flat, src_flat], axis=-1)
    inv_imgs = jnp.concatenate([src_flat, tgt_flat], axis=-1)
    imgs = jnp.concatenate([fwd_imgs, inv_imgs], axis=0)      # [2SB, H, W, 6]
    K_full = jnp.tile(K, (2 * S, 1, 1))

    target_depth_full = jnp.concatenate([tgt_depths_flat, src_depths_flat], 0)
    source_depth_full = jnp.concatenate([src_depths_flat, tgt_depths_flat], 0)

    if use_mxu_warp:
        # pure pose inference consumes only the warped image + valid mask:
        # skip resampling the source depth (3/4 of the kernel's matmul
        # rows and DMA). Only the FINAL iteration's error products consume
        # the sampled depth — intermediate warps feed just (img_rec,
        # valid_mask) back into the pose net, so they stay 3-channel even
        # when return_errors (XLA can't DCE the unused channel inside the
        # Pallas kernel; measured 8.1 -> 4.7 ms fwd+bwd per 24-img warp).
        # img is always a camera frame here → img_grad=False drops the
        # dead d_img side of the backward kernel (see inverse_warp2_mxu)
        warp = functools.partial(inverse_warp2_mxu, exact=mxu_exact,
                                 guard=mxu_band_guard, band=mxu_band,
                                 sample_depth=False, img_grad=False)
        warp_final = functools.partial(inverse_warp2_mxu, exact=mxu_exact,
                                       guard=mxu_band_guard, band=mxu_band,
                                       sample_depth=return_errors,
                                       img_grad=False)
    else:
        warp = warp_final = inverse_warp2

    full_poses = pose_apply(imgs)                             # [2SB, 6]

    if trans_pert is not None:
        full_poses = full_poses.at[:, 2].add(trans_pert)
    if yaw_pert is not None:
        full_poses = full_poses.at[:, 4].add(yaw_pert)

    rec_target = imgs[..., 0:3]   # reconstruction target (first 3 channels)
    rec_source = imgs[..., 3:6]   # image being warped

    if num_iter > 1 or return_errors:
        w0 = warp_final if num_iter == 1 else warp
        img_rec, valid_mask, projected_depth, computed_depth = w0(
            rec_source, target_depth_full, source_depth_full, -full_poses,
            K_full
        )

    stacked_poses = [full_poses]

    def correct(full_poses, img_rec, valid_mask):
        new_imgs = jnp.concatenate([rec_target * valid_mask, img_rec], axis=-1)
        return full_poses + pose_apply(new_imgs)

    def make_iter_body(w):
        def iter_body(full_poses, img_rec, valid_mask):
            """One coupled refinement: pose correction from the residual
            reconstruction, then re-warp. Factored out so training can
            ``jax.checkpoint`` it — the backward then recomputes each
            iteration's pose-net activations and warp instead of storing
            all ``num_iter`` copies (the remat knob of VERDICT r1 #9)."""
            full_poses = correct(full_poses, img_rec, valid_mask)
            img_rec, valid_mask, projected_depth, computed_depth = w(
                rec_source, target_depth_full, source_depth_full,
                -full_poses, K_full,
            )
            return (full_poses, img_rec, valid_mask, projected_depth,
                    computed_depth)
        return iter_body

    iter_body = make_iter_body(warp)
    iter_body_final = make_iter_body(warp_final)
    if remat:
        iter_body = jax.checkpoint(iter_body)
        iter_body_final = jax.checkpoint(iter_body_final)
        correct = jax.checkpoint(correct)

    # static unroll: num_iter is a compile-time constant. The LAST
    # iteration's re-warp only feeds the error products — skip it when
    # they aren't requested (the reference warps iterations-1 times in
    # the pose-only path, train_mono.py:69-80; identical poses, one
    # fewer kernel launch per solve); with errors it is the one warp
    # that samples the source depth (iter_body_final).
    for it in range(num_iter - 1):
        if it == num_iter - 2 and not return_errors:
            full_poses = correct(full_poses, img_rec, valid_mask)
        elif it == num_iter - 2:
            (full_poses, img_rec, valid_mask, projected_depth,
             computed_depth) = iter_body_final(full_poses, img_rec,
                                               valid_mask)
        else:
            (full_poses, img_rec, valid_mask, projected_depth,
             computed_depth) = iter_body(full_poses, img_rec, valid_mask)
        stacked_poses.append(full_poses)

    stacked = jnp.stack(stacked_poses, axis=1)                # [2SB, I, 6]
    poses = stacked[:split, -1].reshape(S, b, 6)
    poses_inv = stacked[split:, -1].reshape(S, b, 6)

    if not return_errors:
        return poses, poses_inv

    # --- error products of the final iteration (train_mono.py:82-105) ----
    auto_mask_error = jnp.mean(
        0.15 * jnp.clip(jnp.abs(rec_target - rec_source), 0.0, 1.0)
        + 0.85 * ssim_loss(rec_target, rec_source),
        axis=-1, keepdims=True,
    )
    rec_target_sg = jax.lax.stop_gradient(rec_target)
    diff_imgs_full = jnp.mean(
        0.15 * jnp.clip(jnp.abs(img_rec - rec_target_sg), 0.0, 1.0)
        + 0.85 * ssim_loss(rec_target_sg, img_rec),
        axis=-1, keepdims=True,
    )
    auto_mask = (diff_imgs_full < auto_mask_error).astype(img_rec.dtype)
    diff_depth = jnp.clip(
        jnp.abs(computed_depth - projected_depth)
        / (computed_depth + projected_depth),
        0.0, 1.0,
    )
    weight_masks = 1.0 - diff_depth

    def _slice(lo, hi):
        return CoupledOutputs(
            diff_img=diff_imgs_full[lo:hi],
            img_rec=img_rec[lo:hi],
            valid_mask=valid_mask[lo:hi],
            weight_mask=weight_masks[lo:hi],
            poses=stacked[lo:hi],
            auto_mask_error=auto_mask_error[lo:hi],
            auto_mask=auto_mask[lo:hi],
        )

    outputs = {
        "fwd": _slice(0, split),
        "inv": _slice(split, 2 * split),
        "comb": {
            "imgs": jnp.concatenate([rec_target * valid_mask, img_rec], -1),
            "valid_mask": valid_mask,
        },
    }
    return poses, poses_inv, outputs
