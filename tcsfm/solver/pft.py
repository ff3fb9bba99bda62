"""PFT — inference-time parameter fine-tuning, the headline capability.

TPU-native re-design of DepthOptimizer (optimization_experiments/
optimizer.py:14-297): for every test window, ~20 Adam steps optimize a
selected subset of the depth/pose state against the photometric objective,
with the pose re-derived from the coupled solver *each step*; final
predictions average the last N steps.

Design (TPU-first):
  * The whole optimization is ONE jitted ``lax.scan`` over steps — no
    Python in the loop, one compile per (mode, shapes) pair; per-window
    wall time is dominated by compute, not dispatch.
  * Trainable-subset selection is a *static pytree partition*
    (SURVEY.md §7 hard part (c)): each mode maps to a (trainable, frozen)
    split, merged back inside the loss.
  * Window batching: windows are independent, so multiple windows can be
    stacked on the batch axis and sharded over the mesh's ``data`` axis —
    the sequence-parallel analogue for this workload (SURVEY.md §5.7).

Optimization modes (optimizer.py:176-214):
  'encoder'         — depth encoder weights (paper default)
  'all_depth'       — all depth weights
  'decoder'         — decoder only, decoding from frozen initial skips
  'depth_pred'      — 1/4-resolution disparity maps directly
  'bottleneck'      — the two deepest skip activations
  'pose'            — pose network weights
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from tcsfm.config import Config, PFTOptions
from tcsfm.eval.scale_recovery import scale_recovery
from tcsfm.losses.photometric import smooth_loss, ssim_loss
from tcsfm.solver.coupled import solve_pose_iteratively
from tcsfm.utils.helpers import disp_to_depth, post_process_disparity

MODES = ("encoder", "all_depth", "decoder", "depth_pred", "bottleneck", "pose")


def compute_optimization_loss(
    opts: PFTOptions,
    target_img: jax.Array,        # [B, H, W, 3]
    target_disparity: jax.Array,  # [B, H, W, 1]
    init_target_disparity: jax.Array,
    fwd: Any,                     # CoupledOutputs, leading dim S*B
    inv: Any,
) -> jax.Array:
    """Single-step PFT loss (optimizer.py:29-134)."""
    b = target_img.shape[0]
    S = opts.num_source_imgs
    loss = 0.0

    if opts.diff_img_argmin:
        # [S*B, H, W, 1] → [B, S, H, W, 1]
        diff = fwd.diff_img.reshape(S, b, *fwd.diff_img.shape[1:])
        diff = jnp.moveaxis(diff, 0, 1)
        diff_min = jnp.min(diff, axis=1)                       # [B, H, W, 1]
        valid = fwd.valid_mask.reshape(S, b, *fwd.valid_mask.shape[1:])
        valid_min = jnp.clip(jnp.sum(jnp.moveaxis(valid, 0, 1), axis=1), 0, 1)
        if opts.automasking:
            ame = fwd.auto_mask_error.reshape(S, b, *fwd.auto_mask_error.shape[1:])
            ame_min = jnp.min(jnp.moveaxis(ame, 0, 1), axis=1)
            auto = (diff_min < ame_min).astype(diff_min.dtype)
            valid_min = auto * valid_min
        # NOTE: the reference multiplies by the FIRST source's weight mask
        # only (optimizer.py:69) — quirk preserved.
        w0 = fwd.weight_mask[:b]
        loss += jnp.sum(diff_min * valid_min * w0) / jnp.maximum(
            jnp.sum(valid_min), 1.0)
    else:
        masked = fwd.diff_img * fwd.valid_mask * fwd.weight_mask
        loss += 0.25 * jnp.sum(masked) / jnp.maximum(jnp.sum(fwd.valid_mask), 1.0)

    if opts.l_inverse_reconstruction:
        inv_masked = inv.diff_img * inv.valid_mask * inv.weight_mask
        if opts.automasking:
            inv_masked = inv_masked * inv.auto_mask
            denom = jnp.sum(inv.valid_mask * inv.auto_mask)
        else:
            denom = jnp.sum(inv.valid_mask)
        loss += 0.25 * jnp.sum(inv_masked) / jnp.maximum(denom, 1.0)

    if opts.l_depth_consist:
        loss += opts.l_depth_consist_weight * jnp.mean(1.0 - fwd.weight_mask)
        if opts.l_inverse_reconstruction:
            loss += opts.l_depth_consist_weight * jnp.mean(1.0 - inv.weight_mask)

    if opts.l_depth_init:
        loss += opts.l_depth_init_weight * jnp.mean(
            ssim_loss(target_disparity,
                      jax.lax.stop_gradient(init_target_disparity))
        )

    if opts.l_smooth:
        loss += opts.l_smooth_weight * smooth_loss(target_disparity, target_img)

    if opts.l_pose_consist:
        loss += 0.1 * jnp.mean(jnp.abs(fwd.poses + inv.poses))

    return loss


# --------------------------------------------------------------------------
# pytree partitioning by optimization mode
# --------------------------------------------------------------------------


def partition_params(mode: str, depth_params, pose_params,
                     skips=None, disparities=None):
    """Return (trainable, rebuild) where rebuild(trainable) → the full
    structures the forward pass needs. Static per mode."""
    if mode == "encoder":
        trainable = {"enc": depth_params["encoder"]}

        def rebuild(t):
            dp = dict(depth_params)
            dp["encoder"] = t["enc"]
            return dp, pose_params, skips, disparities
    elif mode == "all_depth":
        trainable = {"depth": depth_params}

        def rebuild(t):
            return t["depth"], pose_params, skips, disparities
    elif mode == "decoder":
        dec = {k: v for k, v in depth_params.items() if k != "encoder"}
        trainable = {"dec": dec}

        def rebuild(t):
            dp = dict(t["dec"])
            dp["encoder"] = depth_params["encoder"]
            return dp, pose_params, skips, disparities
    elif mode == "depth_pred":
        trainable = {"disp": disparities}

        def rebuild(t):
            return depth_params, pose_params, skips, t["disp"]
    elif mode == "bottleneck":
        trainable = {"s4": skips[-1], "s3": skips[-2]}

        def rebuild(t):
            new_skips = list(skips[:-2]) + [t["s3"], t["s4"]]
            return depth_params, pose_params, new_skips, disparities
    elif mode == "pose":
        trainable = {"pose": pose_params}

        def rebuild(t):
            return depth_params, t["pose"], skips, disparities
    else:
        raise ValueError(f"unknown PFT mode {mode!r}; one of {MODES}")
    return trainable, rebuild


class PFTResult(NamedTuple):
    poses_opt: jax.Array           # [S, B, 6] averaged final poses
    poses_inv_opt: jax.Array
    disp_opt: jax.Array            # [B, H, W] flip-merged disparity average
    poses_init: jax.Array
    poses_inv_init: jax.Array
    losses: jax.Array              # [epochs]
    # DNet ground-plane scale factors — the reference computes one per
    # window batch at the first and last optimization epoch
    # (optimizer.py:254-258) and applies ×30·scale on translations
    # (run_sequential_optimization.py:225-228).
    scale_init: jax.Array = jnp.float32(1.0)     # scalar
    scale_opt: jax.Array = jnp.float32(1.0)      # scalar
    # full optimization history (optimizer_for_cont_plot.py capability):
    # per-epoch poses/disparities for loss-surface animations
    poses_hist: Optional[jax.Array] = None       # [epochs, S, B, 6]
    disp_hist: Optional[jax.Array] = None        # [epochs, B, H, W]


class PFTOptimizer:
    """Per-window inference-time optimizer (DepthOptimizer equivalent)."""

    def __init__(self, cfg: Config, opts: PFTOptions, depth_model, pose_model,
                 mode: str = "encoder", record_history: bool = False):
        self.cfg = cfg
        self.opts = opts
        self.mode = mode
        self.depth_model = depth_model
        self.pose_model = pose_model
        self.record_history = record_history
        self._jitted = None

    # -- functional pieces --------------------------------------------------

    def _depth_apply(self, depth_params, batch_stats, imgs=None, skips=None):
        variables = {"params": depth_params, "batch_stats": batch_stats}
        if skips is None:
            return self.depth_model.apply(variables, imgs)
        return self.depth_model.apply(variables, skips,
                                      method=self.depth_model.decode)

    def _flip_merged_disp(self, depth_params, batch_stats, target_img):
        """Normal+flipped disparity merge (helpers.py:35-49)."""
        both = jnp.concatenate([target_img, target_img[:, :, ::-1]], 0)
        disps = self._depth_apply(depth_params, batch_stats, imgs=both)
        scaled, _ = disp_to_depth(disps[0][..., 0], self.cfg.min_depth,
                                  self.cfg.max_depth)
        n = target_img.shape[0]
        return post_process_disparity(scaled[:n], scaled[n:, :, ::-1])

    def optimize_window(self, batch: Dict[str, jax.Array], depth_params,
                        pose_params, batch_stats) -> PFTResult:
        """Run the full PFT loop on one (batched) window.

        batch: target_img [B,H,W,3], source_imgs [S,B,H,W,3],
        intrinsics [B,3,3] — *clean* stream (PFT runs at test time).
        """
        cfg, opts, mode = self.cfg, self.opts, self.mode
        target_img = batch["target_img"]
        source_imgs = batch["source_imgs"]
        K = batch["intrinsics"]
        S, b = source_imgs.shape[0], target_img.shape[0]

        # ---- initial no-grad pass: skips + disparities (optimizer.py:143-158)
        imgs = jnp.concatenate(
            [target_img, source_imgs.reshape((S * b,) + source_imgs.shape[2:])], 0
        )
        init_skips = self.depth_model.apply(
            {"params": depth_params, "batch_stats": batch_stats}, imgs,
            method=self.depth_model.encode,
        )
        init_disps_full = self._depth_apply(depth_params, batch_stats,
                                            skips=init_skips)[0]
        init_target_disp = init_disps_full[:b]

        # 1/4-res disparities for the depth_pred mode (optimizer.py:194-198)
        h, w = target_img.shape[1:3]
        init_disp_small = jax.image.resize(
            init_disps_full, (init_disps_full.shape[0], h // 4, w // 4, 1),
            method="bilinear",
        )

        trainable, rebuild = partition_params(
            mode, depth_params, pose_params,
            skips=init_skips, disparities=init_disp_small,
        )

        if opts.optimizer == "adam":
            tx = optax.adam(opts.lr)
        elif opts.optimizer == "sgd":
            tx = optax.sgd(opts.lr)
        else:
            raise ValueError(opts.optimizer)

        def forward(trainable_params):
            dp, pp, skips, disp_small = rebuild(trainable_params)
            if mode in ("encoder", "all_depth"):
                disps = self._depth_apply(dp, batch_stats, imgs=imgs)[0]
            elif mode in ("decoder", "bottleneck"):
                disps = self._depth_apply(dp, batch_stats, skips=skips)[0]
            elif mode == "depth_pred":
                disps = jax.image.resize(
                    disp_small, (disp_small.shape[0], h, w, 1), "bilinear")
            else:  # pose
                disps = jax.lax.stop_gradient(init_disps_full)

            target_disp = disps[:b]
            depths = jnp.stack(
                [disp_to_depth(disps[f * b:(f + 1) * b], cfg.min_depth,
                               cfg.max_depth)[1] for f in range(S + 1)]
            )
            poses, poses_inv, outputs = solve_pose_iteratively(
                cfg.iterations, depths, lambda x: self.pose_model.apply(
                    {"params": pp}, x),
                target_img, source_imgs, K, return_errors=True,
                use_mxu_warp=cfg.use_mxu_warp,
                mxu_exact=cfg.mxu_exact,
                mxu_band_guard=cfg.mxu_band_guard,
                mxu_band=cfg.mxu_band,
            )
            loss = compute_optimization_loss(
                opts, target_img, target_disp, init_target_disp,
                outputs["fwd"], outputs["inv"],
            )
            return loss, (poses, poses_inv, dp, target_disp)

        def _one(carry):
            params, opt_state = carry
            (loss, (poses, poses_inv, dp, _disp)), grads = jax.value_and_grad(
                forward, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return (new_params, opt_state), loss, poses, poses_inv, dp

        def step(carry, _):
            carry, loss, poses, poses_inv, dp = _one(carry)
            disp_eigen = self._flip_merged_disp(dp, batch_stats, target_img)
            return carry, (loss, poses, poses_inv, disp_eigen)

        def step_nodisp(carry, _):
            carry, loss, poses, poses_inv, _dp = _one(carry)
            return carry, (loss, poses, poses_inv)

        init_carry = (trainable, tx.init(trainable))
        # epochs-1 optimized steps + a final evaluation step without update
        # (the reference skips backprop on the last epoch, optimizer.py:266-268)
        if self.record_history:
            (final_params, _), scans = jax.lax.scan(
                step, init_carry, None, length=opts.epochs - 1)
            losses_hist, poses_hist, poses_inv_hist, disp_hist = scans
        else:
            # the flipped-averaged disparity (2 extra depth forwards per
            # step) is consumed only for the last ``avg_final_epochs``
            # entries (helpers.py:35-49) — split the scan so the early
            # steps skip it. Identical results, epochs-n_avg fewer
            # flip-merge forwards per window.
            k = min(max(opts.avg_final_epochs - 1, 0), opts.epochs - 1)
            carry, scans_a = jax.lax.scan(
                step_nodisp, init_carry, None, length=opts.epochs - 1 - k)
            (final_params, _), scans_b = jax.lax.scan(
                step, carry, None, length=k)
            losses_hist = jnp.concatenate([scans_a[0], scans_b[0]])
            poses_hist = jnp.concatenate([scans_a[1], scans_b[1]])
            poses_inv_hist = jnp.concatenate([scans_a[2], scans_b[2]])
            disp_hist = scans_b[3]

        final_loss, (final_poses, final_poses_inv, final_dp, final_target_disp
                     ) = forward(final_params)
        final_disp = self._flip_merged_disp(final_dp, batch_stats, target_img)

        # DNet ground-plane scale factors at the first and last epoch
        # (optimizer.py:254-258) — camera height lives at 1/30 metric scale
        # like everything else in the network (config['camera_height']/30).
        cam_h = cfg.camera_height / 30.0
        init_depth = disp_to_depth(init_target_disp, cfg.min_depth,
                                   cfg.max_depth)[1]
        final_depth = disp_to_depth(final_target_disp, cfg.min_depth,
                                    cfg.max_depth)[1]
        scale_init = scale_recovery(init_depth, K, cam_h)
        scale_opt = scale_recovery(final_depth, K, cam_h)

        losses_hist = jnp.concatenate([losses_hist, final_loss[None]])
        poses_hist = jnp.concatenate([poses_hist, final_poses[None]])
        poses_inv_hist = jnp.concatenate([poses_inv_hist, final_poses_inv[None]])
        disp_hist = jnp.concatenate([disp_hist, final_disp[None]])

        n_avg = opts.avg_final_epochs
        return PFTResult(
            poses_opt=jnp.mean(poses_hist[-n_avg:], axis=0),
            poses_inv_opt=jnp.mean(poses_inv_hist[-n_avg:], axis=0),
            disp_opt=jnp.mean(disp_hist[-n_avg:], axis=0),
            poses_init=poses_hist[0],
            poses_inv_init=poses_inv_hist[0],
            losses=losses_hist,
            scale_init=scale_init,
            scale_opt=scale_opt,
            poses_hist=poses_hist if self.record_history else None,
            disp_hist=disp_hist if self.record_history else None,
        )

    def optimize_window_jit(self, batch, depth_params, pose_params,
                            batch_stats) -> PFTResult:
        """Jitted entry point — one compile per window shape."""
        if self._jitted is None:
            self._jitted = jax.jit(
                lambda b, dp, pp, bs: self.optimize_window(b, dp, pp, bs)
            )
        return self._jitted(batch, depth_params, pose_params, batch_stats)
