"""Paper-experiment CLIs: perturbation, depth scaling, frame skip.

Equivalents of the reference's self-validating experiments (SURVEY.md C21):
  * perturbation: inject trans/yaw noise into the coupled iterations over a
    full sequence and measure trajectory degradation
    (pose_perturbation_experiment.py)
  * depth-scaling: scale predicted depth x[0.7..1.3] and track the mean
    translation norm — coupled models track the scale ~linearly
    (depth_scaling_experiment.py)
  * frame-skip: evaluate with frame stride 1..3
    (frame_skip_exp.py)

Usage: python -m tcsfm.cli.experiments {perturbation|depth_scaling|frame_skip} ...
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _load_model_and_seq(args):
    import jax

    from tcsfm.config import Config
    from tcsfm.data.dataset import SequenceData
    from tcsfm.data.synthetic import make_synthetic_sequence
    from tcsfm.train.checkpoint import load_checkpoint
    from tcsfm.train.trainer import create_train_state

    if args.model_dir:
        cfg = Config.load(os.path.join(args.model_dir, "config.json"))
    else:
        cfg = Config(iterations=2, compute_dtype="float32")
    if getattr(args, "iterations", 0):
        cfg = cfg.replace(iterations=args.iterations)
    state, depth_model, pose_model = create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=1)
    if args.model_dir:
        state, _, _ = load_checkpoint(args.model_dir, state, load_best=True)

    if args.synthetic:
        seq = make_synthetic_sequence(24, (64, 96), seed=17)
    else:
        d = os.path.join(args.data_dir, args.seq)
        npz = os.path.join(d, "sequence_data.npz")
        seq = (SequenceData.from_npz(npz) if os.path.exists(npz)
               else SequenceData.from_reference_pkl(d, args.seq))
    return cfg, state, depth_model, pose_model, seq


def _run_sequence(cfg, state, depth_model, pose_model, seq, batch,
                  trans_pert=0.0, yaw_pert=0.0, correction_rate=1):
    """Pair-wise inference over a sequence with optional perturbation /
    frame decimation; returns fused metric-scaled pose vecs + gt traj."""
    import jax
    import jax.numpy as jnp

    from tcsfm.data.dataset import SfMWindowDataset
    from tcsfm.data.loader import BatchLoader
    from tcsfm.data.transforms import WindowTransform
    from tcsfm.solver.coupled import solve_disp, solve_pose_iteratively
    from tcsfm.utils.helpers import disp_to_depth

    ds = SfMWindowDataset(
        [seq], seq_len=2,
        transform=WindowTransform(jitter=False, flip_prob=None),
        correction_rate=correction_rate)
    loader = BatchLoader(ds, batch, shuffle=False, drop_last=False,
                         pad_tail=True)

    @jax.jit
    def infer(params, batch_stats, tgt, src, K):
        dvars = {"params": params["depth"], "batch_stats": batch_stats}
        pvars = {"params": params["pose"]}
        depth_apply = lambda im: depth_model.apply(dvars, im)  # noqa: E731
        pose_apply = lambda im: pose_model.apply(pvars, im)    # noqa: E731
        disps = solve_disp(depth_apply, tgt, src)
        depths = jnp.stack([
            disp_to_depth(disps[f][0], cfg.min_depth, cfg.max_depth)[1]
            for f in range(len(disps))
        ])
        S, b = src.shape[0], tgt.shape[0]
        n = 2 * S * b
        return solve_pose_iteratively(
            cfg.iterations, depths, pose_apply, tgt, src, K,
            trans_pert=jnp.full((n,), trans_pert) if trans_pert else None,
            yaw_pert=jnp.full((n,), yaw_pert) if yaw_pert else None,
        )

    fwd, inv = [], []
    for b in loader:
        valid = b.pop("_valid")
        poses, poses_inv = infer(
            state.params, state.batch_stats,
            jnp.asarray(b["target_img"]), jnp.asarray(b["source_imgs"]),
            jnp.asarray(b["intrinsics"]))
        n = int(valid.sum())
        fwd.append(np.asarray(poses[0])[:n])
        inv.append(np.asarray(poses_inv[0])[:n])
    fwd, inv = np.concatenate(fwd), np.concatenate(inv)
    fused = (fwd - inv) / 2.0
    fused[:, 0:3] *= 30.0
    return fused, seq.gt_poses[::correction_rate]


def cmd_perturbation(args):
    from tcsfm.eval.trajectory import compute_trajectory

    cfg, state, dm, pm, seq = _load_model_and_seq(args)
    out = {}
    for name, tp, yp in (
        ("clean", 0.0, 0.0),
        ("trans", args.trans_pert, 0.0),
        ("yaw", 0.0, args.yaw_pert),
        ("both", args.trans_pert, args.yaw_pert),
    ):
        poses, gt = _run_sequence(cfg, state, dm, pm, seq, args.batch,
                                  trans_pert=tp, yaw_pert=yp)
        # gt scaling for comparability
        _, _, errors, _ = compute_trajectory(
            poses, gt, method=name, compute_seg_err=True, verbose=True)
        out[name] = [float(e) for e in errors]
    print(json.dumps(out, indent=2))
    return out


def cmd_depth_scaling(args):
    import jax
    import jax.numpy as jnp

    from tcsfm.data.dataset import SfMWindowDataset
    from tcsfm.data.loader import BatchLoader
    from tcsfm.data.transforms import WindowTransform
    from tcsfm.eval.experiments import depth_scaling_response
    from tcsfm.solver.coupled import solve_disp
    from tcsfm.utils.helpers import disp_to_depth

    cfg, state, dm, pm, seq = _load_model_and_seq(args)
    ds = SfMWindowDataset(
        [seq], seq_len=3,
        transform=WindowTransform(jitter=False, flip_prob=None))
    batch = next(iter(BatchLoader(ds, args.batch, shuffle=False)))
    batch.pop("_valid")
    tgt = jnp.asarray(batch["target_img"])
    src = jnp.asarray(batch["source_imgs"])
    K = jnp.asarray(batch["intrinsics"])

    dvars = {"params": state.params["depth"],
             "batch_stats": state.batch_stats}
    disps = solve_disp(lambda im: dm.apply(dvars, im), tgt, src)
    depths = jnp.stack([
        disp_to_depth(disps[f][0], cfg.min_depth, cfg.max_depth)[1]
        for f in range(len(disps))
    ])
    pvars = {"params": state.params["pose"]}
    scales = [0.7, 0.8, 0.9, 1.0, 1.1, 1.2, 1.3]
    norms = depth_scaling_response(
        cfg.iterations, depths, lambda im: pm.apply(pvars, im),
        tgt, src, K, scales)
    rel = (norms / norms[scales.index(1.0)]).tolist()
    out = {"scales": scales, "trans_norms": norms.tolist(),
           "relative": rel}
    print(json.dumps(out, indent=2))
    return out


def cmd_frame_skip(args):
    from tcsfm.eval.trajectory import compute_trajectory

    cfg, state, dm, pm, seq = _load_model_and_seq(args)
    out = {}
    for skip in (1, 2, 3):
        poses, gt = _run_sequence(cfg, state, dm, pm, seq, args.batch,
                                  correction_rate=skip)
        _, _, errors, _ = compute_trajectory(
            poses, gt, method=f"skip{skip}", compute_seg_err=True,
            verbose=True)
        out[f"skip_{skip}"] = [float(e) for e in errors]
    print(json.dumps(out, indent=2))
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("perturbation", "depth_scaling", "frame_skip"):
        sp = sub.add_parser(name)
        sp.add_argument("--model_dir", type=str, default="")
        sp.add_argument("--data_dir", type=str, default="")
        sp.add_argument("--seq", type=str, default="09_02")
        sp.add_argument("--batch", type=int, default=8)
        sp.add_argument("--iterations", type=int, default=0)
        sp.add_argument("--synthetic", action="store_true")
        if name == "perturbation":
            sp.add_argument("--trans_pert", type=float, default=0.05)
            sp.add_argument("--yaw_pert", type=float, default=0.0875)
    args = p.parse_args(argv)
    return {"perturbation": cmd_perturbation,
            "depth_scaling": cmd_depth_scaling,
            "frame_skip": cmd_frame_skip}[args.cmd](args)


if __name__ == "__main__":
    main()
