"""Convert reference/torchvision checkpoints to tcsfm parameter pytrees.

The reference warm-starts training from pretrained torch checkpoints
(README.md:54; utils/learning_helpers.py:29-48 loads ``pose_state_dict`` /
``depth_state_dict``). This module maps those state dicts — torchvision
resnet18 encoder + monodepth2-style decoder + PackNet pose net — onto the
flax parameter/batch-stats pytrees of ``DepthNet``/``PoseNet``.

Pure numpy: no torch import needed if the caller already has numpy arrays
(e.g. from ``torch.load(..., map_location='cpu')`` → ``.numpy()``).
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _conv_w(w) -> np.ndarray:
    """torch OIHW → flax HWIO."""
    return _np(w).transpose(2, 3, 1, 0)


def _set(tree: dict, path: Tuple[str, ...], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_pose_state_dict(sd: Mapping[str, "np.ndarray"]) -> dict:
    """Reference pose_model state dict → PoseNet params pytree.

    Layout (models/pose_models.py:105-114): convN = Sequential(conv2d_wn,
    GroupNorm, ReLU); pose_pred = 1x1 Conv2d.
    """
    params: dict = {}
    for i in range(1, 8):
        _set(params, (f"conv{i}", "WSConv_0", "kernel"),
             _conv_w(sd[f"conv{i}.0.weight"]))
        _set(params, (f"conv{i}", "WSConv_0", "bias"), _np(sd[f"conv{i}.0.bias"]))
        _set(params, (f"conv{i}", "GroupNorm16_0", "GroupNorm_0", "scale"),
             _np(sd[f"conv{i}.1.weight"]))
        _set(params, (f"conv{i}", "GroupNorm16_0", "GroupNorm_0", "bias"),
             _np(sd[f"conv{i}.1.bias"]))
    _set(params, ("pose_pred", "kernel"), _conv_w(sd["pose_pred.weight"]))
    _set(params, ("pose_pred", "bias"), _np(sd["pose_pred.bias"]))
    return params


def _convert_bn(params, stats, flax_prefix, sd, torch_prefix):
    _set(params, flax_prefix + ("scale",), _np(sd[f"{torch_prefix}.weight"]))
    _set(params, flax_prefix + ("bias",), _np(sd[f"{torch_prefix}.bias"]))
    _set(stats, flax_prefix + ("mean",), _np(sd[f"{torch_prefix}.running_mean"]))
    _set(stats, flax_prefix + ("var",), _np(sd[f"{torch_prefix}.running_var"]))


def convert_depth_state_dict(sd: Mapping[str, "np.ndarray"]) -> Tuple[dict, dict]:
    """Reference depth_model state dict → (params, batch_stats) pytrees.

    Handles the torchvision resnet18 encoder at ``encoder.encoder.*``
    (models/depth_models.py:95-131) and the decoder Sequentials
    (depth_models.py:144-151): depth_upconvs.i.1.conv / iconvs.i.0.conv /
    feature_convs.i.0.conv / predict_disps.i.0.conv.
    """
    params: dict = {}
    stats: dict = {}
    # reference keys are encoder.encoder.* (ResnetEncoder wraps resnet18,
    # depth_models.py:95-131); the flax DepthNet mounts the resnet DIRECTLY
    # as `encoder`, so the pytree path has a single level
    enc = ("encoder",)

    _set(params, enc + ("conv1", "kernel"), _conv_w(sd["encoder.encoder.conv1.weight"]))
    _convert_bn(params, stats, enc + ("bn1",), sd, "encoder.encoder.bn1")

    for layer in range(1, 5):
        for block in range(2):
            t = f"encoder.encoder.layer{layer}.{block}"
            f = enc + (f"layer{layer}_{block}",)
            _set(params, f + ("Conv_0", "kernel"), _conv_w(sd[f"{t}.conv1.weight"]))
            _convert_bn(params, stats, f + ("BatchNorm_0",), sd, f"{t}.bn1")
            _set(params, f + ("Conv_1", "kernel"), _conv_w(sd[f"{t}.conv2.weight"]))
            _convert_bn(params, stats, f + ("BatchNorm_1",), sd, f"{t}.bn2")
            if f"{t}.downsample.0.weight" in sd:
                _set(params, f + ("Conv_2", "kernel"),
                     _conv_w(sd[f"{t}.downsample.0.weight"]))
                _convert_bn(params, stats, f + ("BatchNorm_2",), sd,
                            f"{t}.downsample.1")

    def refl_conv(flax_name, torch_prefix):
        _set(params, (flax_name, "Conv_0", "kernel"),
             _conv_w(sd[f"{torch_prefix}.conv.weight"]))
        _set(params, (flax_name, "Conv_0", "bias"),
             _np(sd[f"{torch_prefix}.conv.bias"]))

    n_up = sum(1 for k in sd if k.startswith("depth_upconvs.")
               and k.endswith(".1.conv.weight"))
    for i in range(n_up):
        refl_conv(f"upconv{i}", f"depth_upconvs.{i}.1")
        refl_conv(f"iconv{i}", f"iconvs.{i}.0")
    n_scales = sum(1 for k in sd if k.startswith("feature_convs.")
                   and k.endswith(".0.conv.weight"))
    for i in range(n_scales):
        refl_conv(f"feature_conv{i}", f"feature_convs.{i}.0")
        refl_conv(f"disp_head{i}", f"predict_disps.{i}.0")
    return params, stats


def convert_torchvision_resnet18(sd: Mapping[str, "np.ndarray"]
                                 ) -> Tuple[dict, dict]:
    """Raw torchvision resnet18 state dict (e.g. ImageNet pretrained) →
    (params, batch_stats) subtrees covering the DepthNet encoder only.

    The reference warm-starts its depth encoder from torchvision's
    ImageNet weights (depth_models.py:110-119, README.md:54); this is the
    one-shot ingestion path for users with those weights on disk:

        sd = {k: v.numpy() for k, v in torch.load('resnet18.pth').items()}
        enc_params, enc_stats = convert_torchvision_resnet18(sd)
        params['depth'] = warm_start_encoder(params['depth'], enc_params)
        batch_stats = warm_start_encoder(batch_stats, enc_stats)
    """
    renamed = {f"encoder.encoder.{k}": v for k, v in sd.items()
               if not k.startswith("fc.")}
    return convert_depth_state_dict(renamed)


def warm_start_encoder(tree: dict, encoder_subtree: dict) -> dict:
    """Merge a converted encoder subtree into a DepthNet params or
    batch_stats pytree (decoder / heads keep their existing values)."""
    import copy

    out = copy.deepcopy(dict(tree))
    src = encoder_subtree.get("encoder", {})
    dst = out.setdefault("encoder", {})
    for k, v in src.items():
        dst[k] = v
    return out


def convert_reference_checkpoint(ckpt: Mapping) -> Dict[str, dict]:
    """Full reference checkpoint dict (run_mono_training.py:228-234) →
    {'depth': {'params', 'batch_stats'}, 'pose': {'params'}, 'epoch', ...}.
    """
    depth_params, depth_stats = convert_depth_state_dict(ckpt["depth_state_dict"])
    return {
        "depth": {"params": depth_params, "batch_stats": depth_stats},
        "pose": {"params": convert_pose_state_dict(ckpt["pose_state_dict"])},
        "epoch": ckpt.get("epoch", 0),
        "best_val_loss": ckpt.get("best_val_loss", float("inf")),
    }
