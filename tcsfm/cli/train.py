"""Training CLI — the run_mono_training.py equivalent.

Usage:
  python -m tcsfm.cli.train --data_dir /path/to/preprocessed --data_format
      odometry --train_seq 00_02 02_02 --val_seq 05_02 --test_seq 09_02
      --iterations 4 --minibatch 6 --num_epochs 20 [--synthetic]

``--synthetic`` trains on generated sequences (no dataset needed) — the
smoke-test path used by CI and the driver.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="tcsfm training")
    p.add_argument("--flow_type", type=str, default="none")
    p.add_argument("--num_scales", type=int, default=1)
    p.add_argument("--img_resolution", type=str, default="med",
                   choices=["low", "med", "high"])
    p.add_argument("--img_per_sample", type=int, default=3)
    p.add_argument("--iterations", type=int, default=4)
    p.add_argument("--data_dir", type=str, default="")
    p.add_argument("--data_format", type=str, default="odometry")
    p.add_argument("--date", type=str, default=time.strftime("%Y%m%d%H%M"))
    p.add_argument("--train_seq", nargs="+", type=str, default=["00_02"])
    p.add_argument("--val_seq", nargs="+", type=str, default=["05_02"])
    p.add_argument("--test_seq", nargs="+", type=str, default=["09_02"])
    p.add_argument("--augment_motion", action="store_true", default=False)
    p.add_argument("--minibatch", type=int, default=6)
    p.add_argument("--wd", type=float, default=0.0)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--num_epochs", type=int, default=20)
    p.add_argument("--lr_decay_epoch", type=int, default=7)
    p.add_argument("--max_depth", type=float, default=80.0 / 30.0)
    p.add_argument("--min_depth", type=float, default=0.06)
    p.add_argument("--load_from_checkpoint", action="store_true")
    p.add_argument("--load_best_model", action="store_true")
    p.add_argument("--pretrained_dir", type=str, default="")
    p.add_argument("--freeze_depthnet", action="store_true")
    p.add_argument("--freeze_posenet", action="store_true")
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    p.add_argument("--no_mxu_warp", action="store_true",
                   help="disable the Pallas MXU warp (auto-on for TPU)")
    p.add_argument("--fast_sampler", action="store_true",
                   help="single-pass bf16 MXU sampler (half the sampler "
                        "matmul cost, ~2e-3 abs image noise)")
    p.add_argument("--mixed_sampler", action="store_true",
                   help="bf16 RGB + f32-exact source depth MXU sampler "
                        "(5/8 of the exact sampler's matmul rows)")
    p.add_argument("--n_devices", type=int, default=0,
                   help="devices for the data mesh (0 = all)")
    p.add_argument("--synthetic", action="store_true",
                   help="train on generated synthetic sequences")
    p.add_argument("--synthetic_frames", type=int, default=40)
    p.add_argument("--synthetic_kind", type=str, default="scene",
                   choices=["scene", "drive"],
                   help="'scene': short textured-plane windows "
                        "(make_synthetic_sequence, the CI smoke path); "
                        "'drive': long world-anchored S-curve drives "
                        "(make_drive_sequence) — the training data for "
                        "the chain-BA flagship benchmark's checkpoint")
    p.add_argument("--results_dir", type=str, default="results")
    return p.parse_args(argv)


def build_config(args):
    from tcsfm.config import Config

    return Config(
        flow_type=args.flow_type, num_scales=args.num_scales,
        img_resolution=args.img_resolution,
        img_per_sample=args.img_per_sample, iterations=args.iterations,
        data_dir=args.data_dir, data_format=args.data_format,
        train_seq=tuple(args.train_seq), val_seq=tuple(args.val_seq),
        test_seq=tuple(args.test_seq), augment_motion=args.augment_motion,
        minibatch=args.minibatch, wd=args.wd, lr=args.lr,
        num_epochs=args.num_epochs, lr_decay_epoch=args.lr_decay_epoch,
        min_depth=args.min_depth, max_depth=args.max_depth,
        freeze_depthnet=args.freeze_depthnet,
        freeze_posenet=args.freeze_posenet,
        compute_dtype=args.compute_dtype,
        ckpt_dir=os.path.join(args.results_dir, args.date),
        load_from_checkpoint=args.load_from_checkpoint,
        load_best_model=args.load_best_model,
        pretrained_dir=args.pretrained_dir,
    )


def load_datasets(cfg, args):
    from tcsfm.data.dataset import SequenceData, SfMWindowDataset
    from tcsfm.data.synthetic import make_drive_sequence, make_synthetic_sequence
    from tcsfm.data.transforms import get_transforms

    tf = get_transforms()
    if args.synthetic:
        h, w = (64, 96) if cfg.img_resolution == "low" else cfg.image_size
        gen = (make_drive_sequence if args.synthetic_kind == "drive"
               else make_synthetic_sequence)
        train_seqs = [gen(args.synthetic_frames, (h, w), seed=s)
                      for s in range(2)]
        val_seqs = [gen(args.synthetic_frames, (h, w), seed=7)]
        test_seqs = [gen(args.synthetic_frames, (h, w), seed=9)]
    else:
        def load(names, exclude=()):
            if list(names) == ["all"]:
                # ScanNet-style 'all': every sequence dir/npz in data_dir
                # except val/test sequences (kitti_loader_stereo.py:55-69)
                names = sorted(
                    n.replace(".npz", "") for n in os.listdir(cfg.data_dir)
                    if n not in exclude and not n.startswith(".")
                )
                names = [n for n in names if n not in exclude]
            out = []
            for n in names:
                d = os.path.join(cfg.data_dir, n)
                if os.path.exists(d + ".npz"):
                    out.append(SequenceData.from_npz(d + ".npz"))
                    continue
                npz = os.path.join(d, "sequence_data.npz")
                if os.path.exists(npz):
                    out.append(SequenceData.from_npz(npz))
                else:
                    out.append(SequenceData.from_reference_pkl(d, n))
            return out

        train_seqs = load(cfg.train_seq,
                          exclude=set(cfg.val_seq) | set(cfg.test_seq))
        val_seqs = load(cfg.val_seq)
        test_seqs = load(cfg.test_seq)

    mk = lambda seqs, key: SfMWindowDataset(  # noqa: E731
        seqs, seq_len=cfg.img_per_sample, transform=tf[key],
        correction_rate=cfg.correction_rate, skip=cfg.skip,
        augment_motion=cfg.augment_motion and key == "train",
    )
    return (mk(train_seqs, "train"), mk(val_seqs, "val"),
            mk(test_seqs, "test"), test_seqs)


def main(argv=None):
    args = parse_args(argv)
    cfg = build_config(args)

    import jax

    if not args.no_mxu_warp and jax.default_backend() not in ("cpu",):
        cfg = cfg.replace(use_mxu_warp=True)
    if args.fast_sampler:
        cfg = cfg.replace(mxu_exact=False)
    if args.mixed_sampler:
        cfg = cfg.replace(mxu_exact="mixed")

    from tcsfm.data.loader import BatchLoader
    from tcsfm.dist.mesh import initialize_distributed, make_mesh, process_info
    from tcsfm.train.checkpoint import load_checkpoint, save_checkpoint
    from tcsfm.train.trainer import Trainer, create_train_state

    # multi-host pod launch: starts the coordination service when
    # JAX_COORDINATOR_ADDRESS etc. are set; no-op on one host
    initialize_distributed()
    proc_idx, proc_cnt = process_info()

    train_ds, val_ds, test_ds, test_seqs = load_datasets(cfg, args)
    train_loader = BatchLoader(train_ds, cfg.minibatch, shuffle=True,
                               process_index=proc_idx,
                               process_count=proc_cnt)
    val_loader = BatchLoader(val_ds, cfg.minibatch, shuffle=False,
                             process_index=proc_idx,
                             process_count=proc_cnt)
    steps_per_epoch = max(len(train_loader), 1)

    state, depth_model, pose_model = create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=steps_per_epoch)

    start_epoch, best_val = 0, 1e5
    if cfg.load_from_checkpoint or cfg.load_best_model:
        state, start_epoch, best_val = load_checkpoint(
            cfg.pretrained_dir or cfg.ckpt_dir, state,
            load_best=cfg.load_best_model)
        print(f"loaded checkpoint, starting at epoch {start_epoch}")

    n_dev = args.n_devices or len(jax.devices())
    # the data mesh can't be wider than the batch: clamp to the largest
    # divisor of minibatch (e.g. batch 2 on an 8-device test mesh -> 2)
    while cfg.minibatch % n_dev:
        n_dev -= 1
    mesh = make_mesh(n_dev)
    trainer = Trainer(cfg, state, depth_model, pose_model, mesh=mesh)

    from tcsfm.train.logging import MetricsWriter

    writer = MetricsWriter(os.path.join(cfg.ckpt_dir, "logs"))

    for epoch in range(start_epoch, cfg.num_epochs):
        train_ds.reseed(epoch)
        train_losses = trainer.run_epoch(train_loader, epoch, "train")
        val_losses = trainer.run_epoch(val_loader, epoch, "val")

        for k, v in train_losses.items():
            writer.add_scalar(f"train/{k}", v, epoch + 1)
        for k, v in val_losses.items():
            writer.add_scalar(f"val/{k}", v, epoch + 1)

        if epoch > 0:
            # visual panels + trajectory eval (run_mono_training.py:186-221)
            try:
                from tcsfm import vis
                from tcsfm.train.validate import (
                    depth_and_reconstruction_panels, trajectory_eval)

                panels = depth_and_reconstruction_panels(
                    cfg, depth_model, pose_model, trainer.state.params,
                    trainer.state.batch_stats, val_ds)
                writer.add_image(
                    "val/imgs",
                    vis.image_grid(panels["triplets"].reshape(
                        (-1,) + panels["triplets"].shape[2:])), epoch + 1)
                writer.add_image(
                    "val/depth", vis.colorize_disparity(
                        panels["disparities"][0]), epoch + 1)
                writer.add_image(
                    "val/exp_mask",
                    vis.image_grid(panels["exp_masks"][..., None]), epoch + 1)

                if cfg.data_format == "odometry" and len(test_seqs):
                    est, gt_lie, errors = trajectory_eval(
                        cfg, depth_model, pose_model, trainer.state.params,
                        trainer.state.batch_stats, test_ds,
                        test_seqs[0].gt_poses)
                    writer.add_scalar("test/t_ate", errors[0], epoch + 1)
                    writer.add_scalar("test/r_ate", errors[1], epoch + 1)
                    writer.add_scalar("test/t_seg", errors[2], epoch + 1)
                    writer.add_scalar("test/r_seg", errors[3], epoch + 1)
                    writer.add_image("test/pose_components",
                                     vis.plot_pose_components(est, "est"),
                                     epoch + 1)
            except Exception as e:  # visualization must never kill training
                print(f"validation visualization failed: {e}")

        key_metric = (val_losses.get("l_reconstruct_forward", 0.0)
                      + val_losses.get("l_reconstruct_inverse", 0.0))
        is_best = key_metric < best_val and epoch > 0
        if is_best:
            best_val = key_metric
            print("Lowest validation loss (saving new best model)")
        save_checkpoint(cfg.ckpt_dir, trainer.state, epoch, best_val,
                        cfg=cfg, is_best=is_best)
    writer.close()
    print("Training complete")
    return trainer


if __name__ == "__main__":
    main()
