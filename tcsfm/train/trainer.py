"""Data-parallel self-supervised training loop.

TPU-native re-design of the reference Trainer (train_mono.py:134-203,
run_mono_training.py:126-255): one jitted train step runs depth net →
coupled pose solver → loss → grad → Adam update end-to-end; the batch is
sharded over the mesh's ``data`` axis and XLA inserts the gradient
reductions. Pose params train at 2x the depth lr
(run_mono_training.py:151-152); either network can be frozen.
"""

from __future__ import annotations

import functools
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from tcsfm.config import Config
from tcsfm.dist.mesh import (make_mesh, replicated, shard_batch,
                             shard_process_local_batch)
from tcsfm.losses.photometric import compute_losses, pose_consistency_loss
from tcsfm.models.depth import DepthNet
from tcsfm.models.pose import PoseNet
from tcsfm.solver.coupled import solve_disp, solve_pose_iteratively
from tcsfm.train.schedule import halving_schedule
from tcsfm.utils.helpers import disp_to_depth


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any                 # {'depth': ..., 'pose': ...}
    batch_stats: Any            # depth encoder BN stats
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt_state,
        )


def make_optimizer(cfg: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    """Adam with 2x pose lr, halving schedule, optional freezing."""
    depth_sched = halving_schedule(cfg.lr, steps_per_epoch, cfg.lr_decay_epoch)
    pose_sched = halving_schedule(cfg.pose_lr_mult * cfg.lr, steps_per_epoch,
                                  cfg.lr_decay_epoch)

    def adam(sched):
        if cfg.wd:
            return optax.adamw(sched, weight_decay=cfg.wd)
        return optax.adam(sched)

    transforms = {
        "depth": optax.set_to_zero() if cfg.freeze_depthnet else adam(depth_sched),
        "pose": optax.set_to_zero() if cfg.freeze_posenet else adam(pose_sched),
    }
    return optax.multi_transform(
        transforms,
        param_labels={"depth": "depth", "pose": "pose"},
    )


def create_train_state(cfg: Config, rng: jax.Array,
                       steps_per_epoch: int = 1000,
                       depth_model: Optional[DepthNet] = None,
                       pose_model: Optional[PoseNet] = None) -> Tuple[
                           TrainState, DepthNet, PoseNet]:
    h, w = cfg.image_size
    depth_model = depth_model or DepthNet(
        num_scales=cfg.num_scales, dtype=jnp.dtype(cfg.compute_dtype))
    pose_model = pose_model or PoseNet(dtype=jnp.dtype(cfg.compute_dtype))

    tx = make_optimizer(cfg, steps_per_epoch)

    # ONE jitted init program. Un-jitted flax init traces the forward
    # EAGERLY — hundreds of per-op dispatches, each paying remote-tunnel
    # compile+round-trip latency (measured 250-340 s vs seconds jitted),
    # and none of it lands in the persistent compile cache.
    @jax.jit
    def _init(rng):
        k1, k2 = jax.random.split(rng)
        dvars = depth_model.init(k1, jnp.zeros((1, h, w, 3)))
        pvars = pose_model.init(
            k2, jnp.zeros((1, h, w, cfg.pose_input_channels)))
        params = {"depth": dvars["params"], "pose": pvars["params"]}
        batch_stats = dvars.get("batch_stats", FrozenDict())
        return params, batch_stats, tx.init(params)

    params, batch_stats, opt_state = _init(rng)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats=batch_stats, opt_state=opt_state, tx=tx,
    )
    return state, depth_model, pose_model


def forward_loss(cfg: Config, depth_model: DepthNet, pose_model: PoseNet,
                 params, batch_stats, batch, train: bool):
    """Shared train/val forward pass (train_mono.py:159-194 body)."""
    depth_vars = {"params": params["depth"], "batch_stats": batch_stats}
    pose_vars = {"params": params["pose"]}

    new_stats = batch_stats
    if train and not cfg.freeze_depthnet:
        mutable_holder = {}

        def depth_apply(imgs):
            out, upd = depth_model.apply(depth_vars, imgs, train=True,
                                         mutable=["batch_stats"])
            mutable_holder["stats"] = upd["batch_stats"]
            return out
    else:
        def depth_apply(imgs):
            return depth_model.apply(depth_vars, imgs)
        mutable_holder = None

    def pose_apply(imgs):
        return pose_model.apply(pose_vars, imgs)

    tgt_aug = batch["target_img_aug"]
    src_aug = batch["source_imgs_aug"]
    K_aug = batch["intrinsics_aug"]

    disparities = solve_disp(depth_apply, tgt_aug, src_aug)
    if mutable_holder is not None:
        new_stats = mutable_holder["stats"]

    depths = jnp.stack([
        disp_to_depth(disparities[f][0], cfg.min_depth, cfg.max_depth)[1]
        for f in range(len(disparities))
    ])

    poses, poses_inv = solve_pose_iteratively(
        cfg.iterations, depths, pose_apply, tgt_aug, src_aug, K_aug,
        use_mxu_warp=cfg.use_mxu_warp, mxu_exact=cfg.mxu_exact,
        mxu_band_guard=cfg.mxu_band_guard, mxu_band=cfg.mxu_band,
        remat=train and cfg.remat_coupled,
    )

    losses = compute_losses(
        cfg, batch["source_imgs"], batch["target_img"], poses, poses_inv,
        disparities, K_aug,
    )
    if cfg.l_pose_consist:
        losses["l_pose_consist"] = (
            cfg.l_pose_consist_weight * pose_consistency_loss(poses, poses_inv)
        )
        losses["total"] = losses["total"] + losses["l_pose_consist"]
    # depth-collapse diagnostics (reference warns when the disparity
    # median/mean vanish, train_mono.py:168-169; our sigmoid can saturate
    # at either tail — report both moments and let run_epoch warn)
    losses["mean_disp"] = jnp.mean(disparities[0][0])
    losses["std_disp"] = jnp.std(disparities[0][0])
    return losses, new_stats, (poses, poses_inv, disparities)


def make_train_step(cfg: Config, depth_model: DepthNet, pose_model: PoseNet):
    @jax.jit
    def train_step(state: TrainState, batch):
        def loss_fn(params):
            losses, new_stats, _ = forward_loss(
                cfg, depth_model, pose_model, params, state.batch_stats,
                batch, train=True,
            )
            return losses["total"], (losses, new_stats)

        grads, (losses, new_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads).replace(batch_stats=new_stats)
        return new_state, losses

    return train_step


def make_eval_step(cfg: Config, depth_model: DepthNet, pose_model: PoseNet):
    @jax.jit
    def eval_step(state: TrainState, batch):
        losses, _, _ = forward_loss(
            cfg, depth_model, pose_model, state.params, state.batch_stats,
            batch, train=False,
        )
        return losses

    return eval_step


class Trainer:
    """Epoch driver with mesh-sharded batches (Trainer, train_mono.py:134-203)."""

    def __init__(self, cfg: Config, state: TrainState,
                 depth_model: DepthNet, pose_model: PoseNet,
                 mesh=None):
        self.cfg = cfg
        self.state = state
        self.mesh = mesh if mesh is not None else make_mesh(1)
        self.train_step = make_train_step(cfg, depth_model, pose_model)
        self.eval_step = make_eval_step(cfg, depth_model, pose_model)
        self.depth_model = depth_model
        self.pose_model = pose_model
        # multi-host launches feed process-local loader rows; single-host
        # keeps the plain device_put path (identical result, less overhead)
        self._shard = (shard_process_local_batch
                       if jax.process_count() > 1 else shard_batch)

    def run_epoch(self, loader, epoch: int, phase: str = "train",
                  verbose: bool = True) -> Dict[str, float]:
        start = time.time()
        running: Dict[str, float] = {}
        n = 0
        for batch in loader:
            batch.pop("_valid", None)
            batch = self._shard(self.mesh, batch)
            if phase == "train":
                self.state, losses = self.train_step(self.state, batch)
            else:
                losses = self.eval_step(self.state, batch)
            n += 1
            for k, v in losses.items():
                running[k] = running.get(k, 0.0) + float(v)
        for k in running:
            running[k] /= max(n, 1)
        if verbose:
            print(f"{phase} epoch {epoch} done in {time.time() - start:.1f}s "
                  f"loss {running.get('total', float('nan')):.6f}")
        # reference's depth-collapse guard (train_mono.py:168-169), both
        # sigmoid tails: a saturated disparity freezes all depth gradients
        std = running.get("std_disp", 1.0)
        mean = running.get("mean_disp", 0.5)
        if std < 1e-6 or mean < 1e-6 or mean > 1.0 - 1e-6:
            print(f"warning - depth est has failed (mean disp {mean:.3g}, "
                  f"std {std:.3g}): sigmoid saturated, depth gradients are "
                  f"zero. Lower the lr or warm-start the encoder.")
        return running
