"""Import a reference torch checkpoint into a tcsfm model directory.

Closes the accuracy loop end-to-end: the reference publishes trained
checkpoints as ``checkpoint.pt`` / ``best_model.pt`` dicts with
``depth_state_dict`` / ``pose_state_dict`` (run_mono_training.py:228-234,
utils/learning_helpers.py:29-48). This CLI converts one into our msgpack
checkpoint + config.json so every eval surface (evaluate_vo,
evaluate_depth_eigen, evaluate_scannet, run_sequential_pft, golden_eval)
runs on the trained weights with a one-liner:

    python -m tcsfm.cli.import_checkpoint \
        --torch_ckpt /path/to/best_model.pt --out_dir results/kitti-4-iter \
        --iterations 4

Also ingests a raw torchvision ImageNet resnet18 state dict into the depth
encoder (--torchvision mode) for warm-started training (README.md:54).
"""

from __future__ import annotations

import argparse
import json
import os


def load_torch_state_dict(path: str):
    """torch.load a checkpoint on CPU and strip tensors to numpy."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return ckpt


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--torch_ckpt", type=str, required=True,
                   help=".pt file: reference checkpoint dict, or a raw "
                        "state dict with --torchvision")
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--torchvision", action="store_true",
                   help="input is a torchvision resnet18 ImageNet state "
                        "dict; warm-start only the depth encoder")
    p.add_argument("--iterations", type=int, default=4)
    p.add_argument("--img_resolution", type=str, default="med")
    p.add_argument("--min_depth", type=float, default=0.06)
    p.add_argument("--max_depth", type=float, default=80.0 / 30.0)
    p.add_argument("--config", type=str, default="",
                   help="optional existing config.json to carry over")
    args = p.parse_args(argv)

    import jax
    from flax.core import FrozenDict

    from tcsfm.config import Config
    from tcsfm.models.torch_import import (
        convert_reference_checkpoint, convert_torchvision_resnet18,
        warm_start_encoder,
    )
    from tcsfm.train.checkpoint import save_checkpoint
    from tcsfm.train.trainer import create_train_state

    if args.config:
        cfg = Config.load(args.config)
    else:
        cfg = Config(iterations=args.iterations,
                     img_resolution=args.img_resolution,
                     min_depth=args.min_depth, max_depth=args.max_depth,
                     ckpt_dir=args.out_dir)

    state, _, _ = create_train_state(cfg, jax.random.PRNGKey(0),
                                     steps_per_epoch=1)
    ckpt = load_torch_state_dict(args.torch_ckpt)

    if args.torchvision:
        from flax import serialization

        enc_params, enc_stats = convert_torchvision_resnet18(ckpt)
        params = dict(state.params)
        params["depth"] = warm_start_encoder(
            serialization.to_state_dict(jax.device_get(params["depth"])),
            enc_params)
        stats = warm_start_encoder(
            serialization.to_state_dict(jax.device_get(state.batch_stats)),
            enc_stats)
        state = state.replace(params=params, batch_stats=FrozenDict(stats))
        epoch, best = 0, float("inf")
    else:
        conv = convert_reference_checkpoint(ckpt)
        state = state.replace(
            params={"depth": conv["depth"]["params"],
                    "pose": conv["pose"]["params"]},
            batch_stats=FrozenDict(conv["depth"]["batch_stats"]),
        )
        epoch, best = conv["epoch"], conv["best_val_loss"]

    os.makedirs(args.out_dir, exist_ok=True)
    path = save_checkpoint(args.out_dir, state, epoch=epoch,
                           best_val_loss=best, cfg=cfg, is_best=True)
    out = {"checkpoint": path, "epoch": int(epoch), "best_val_loss":
           float(best), "config": os.path.join(args.out_dir, "config.json")}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
