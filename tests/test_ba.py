"""Photometric BA: joint pose+depth refinement with Schur complement."""

import jax
import jax.numpy as jnp
import numpy as np

from tcsfm.data.dataset import relative_lie_alg
from tcsfm.data.synthetic import make_synthetic_sequence
from tcsfm.solver.ba import (fuse_pose_estimates, photometric_ba,
                             sequence_ba)


def _setup(seed=23):
    seq = make_synthetic_sequence(4, (64, 96), seed=seed)
    t, s = 1, 2
    xi = relative_lie_alg(seq.gt_poses[t], seq.gt_poses[s]).astype(np.float32)
    return (
        jnp.asarray(xi[None]),
        jnp.asarray(seq.images[t][None]),
        jnp.asarray(seq.images[s][None]),
        jnp.asarray(seq.depths[t][None, ..., None]),
        jnp.asarray(seq.depths[s][None, ..., None]),
        jnp.asarray(seq.intrinsics[t][None]),
    )


class TestPhotometricBA:
    def test_joint_refinement_reduces_cost(self):
        true_pose, tgt, src, d_t, d_s, K = _setup()
        # perturb BOTH pose and depth
        pert_pose = true_pose.at[:, 2].add(0.008)
        pert_depth = d_t * 1.15

        res = jax.jit(
            lambda p, d: photometric_ba(p, d, tgt, src, d_s, K, iters=10,
                                        depth_prior_weight=0.1)
        )(pert_pose, pert_depth)

        costs = np.asarray(res.cost)[:, 0]
        assert costs[-1] < 0.6 * costs[0], costs
        assert np.all(np.isfinite(np.asarray(res.depth)))
        assert np.all(np.asarray(res.depth) > 0)

    def test_depth_moves_toward_truth(self):
        """With the true pose held near-correct, the scaled-up depth should
        move back toward the true depth in textured regions."""
        true_pose, tgt, src, d_t, d_s, K = _setup(seed=24)
        pert_depth = d_t * 1.2
        res = photometric_ba(true_pose, pert_depth, tgt, src, d_s, K,
                             iters=10, depth_prior_weight=0.05)
        err0 = float(jnp.mean(jnp.abs(pert_depth - d_t)))
        err1 = float(jnp.mean(jnp.abs(res.depth - d_t)))
        assert err1 < err0, (err0, err1)

    def test_fixed_point_at_truth(self):
        true_pose, tgt, src, d_t, d_s, K = _setup(seed=25)
        res = photometric_ba(true_pose, d_t, tgt, src, d_s, K, iters=4)
        moved = float(jnp.linalg.norm(res.pose - true_pose))
        assert moved < 5e-3, moved

    def test_batched_windows(self):
        """Two windows refine independently in one batched call."""
        p1, tgt1, src1, dt1, ds1, K1 = _setup(seed=26)
        p2, tgt2, src2, dt2, ds2, K2 = _setup(seed=27)
        cat = lambda a, b: jnp.concatenate([a, b], 0)  # noqa: E731
        res = photometric_ba(
            cat(p1, p2).at[:, 2].add(0.006), cat(dt1, dt2) * 1.1,
            cat(tgt1, tgt2), cat(src1, src2), cat(ds1, ds2), cat(K1, K2),
            iters=6,
        )
        costs = np.asarray(res.cost)
        assert costs[-1, 0] < costs[0, 0]
        assert costs[-1, 1] < costs[0, 1]


class TestPoseFusion:
    def test_equal_info_matches_reference_average(self):
        """With equal information the fusion IS the reference's
        (fwd - inv)/2 (evaluate_vo_model.py:140)."""
        rng = np.random.RandomState(0)
        xi_f = jnp.asarray(0.01 * rng.randn(3, 6).astype(np.float32))
        xi_i = jnp.asarray(0.01 * rng.randn(3, 6).astype(np.float32))
        A = rng.randn(6, 6).astype(np.float32)
        info = jnp.asarray(np.broadcast_to(A @ A.T + 0.1 * np.eye(6),
                                           (3, 6, 6)).copy())
        fused = fuse_pose_estimates(xi_f, info, xi_i, info)
        np.testing.assert_allclose(np.asarray(fused),
                                   np.asarray((xi_f - xi_i) / 2),
                                   rtol=1e-4, atol=1e-7)

    def test_weighting_follows_information(self):
        """An estimate with much higher information dominates the fusion."""
        xi_f = jnp.full((1, 6), 0.02)
        xi_i = jnp.full((1, 6), 0.02)   # -xi_i = -0.02: disagrees with fwd
        strong = jnp.asarray(1e4 * np.eye(6)[None])
        weak = jnp.asarray(np.eye(6)[None])
        fused = fuse_pose_estimates(xi_f, strong, xi_i, weak)
        np.testing.assert_allclose(np.asarray(fused), 0.02, rtol=1e-3)
        fused = fuse_pose_estimates(xi_f, weak, xi_i, strong)
        np.testing.assert_allclose(np.asarray(fused), -0.02, rtol=1e-3)


class TestSequenceBA:
    def _seq_setup(self, n_frames=4, seed=31):
        seq = make_synthetic_sequence(n_frames, (64, 96), seed=seed)
        frames = jnp.asarray(seq.images)
        depths = jnp.asarray(seq.depths[..., None])
        K = jnp.asarray(seq.intrinsics[0])
        xi_f = np.stack([
            relative_lie_alg(seq.gt_poses[t], seq.gt_poses[t + 1])
            for t in range(n_frames - 1)
        ]).astype(np.float32)
        xi_i = np.stack([
            relative_lie_alg(seq.gt_poses[t + 1], seq.gt_poses[t])
            for t in range(n_frames - 1)
        ]).astype(np.float32)
        return frames, depths, K, jnp.asarray(xi_f), jnp.asarray(xi_i)

    def test_chain_refinement_improves_perturbed_poses(self):
        frames, depths, K, xi_f, xi_i = self._seq_setup()
        # perturb ty: strongly photometrically observed. (tz sits in the
        # depth-scale null direction and is absorbed by depth; yaw is
        # near-degenerate with tx on this planar narrow-FOV scene.)
        pert_f = xi_f.at[:, 1].add(0.01)
        pert_i = xi_i.at[:, 1].add(-0.01)
        res = jax.jit(lambda pf, pi: sequence_ba(
            frames, depths, K, pf, pi, iters=8))(pert_f, pert_i)
        err0 = jnp.abs(pert_f - xi_f).max(axis=1)
        err1 = jnp.abs(res.fused_pose - xi_f).max(axis=1)
        # residual-variance weighting (default) gates wrong-basin pairs:
        # every pair improves, and the chain improves 2x+ on average
        assert float(err1.max()) < float(err0.max()), (err0, err1)
        assert float(err1.mean()) < 0.5 * float(err0.mean())

    def test_pure_information_fusion_beats_both_when_converged(self):
        frames, depths, K, xi_f, xi_i = self._seq_setup()
        pert_f = xi_f.at[:, 1].add(0.01)
        pert_i = xi_i.at[:, 1].add(-0.01)
        res = jax.jit(lambda pf, pi: sequence_ba(
            frames, depths, K, pf, pi, iters=8,
            residual_variance_weighting=False))(pert_f, pert_i)
        ef = jnp.abs(res.fwd.pose - xi_f).max(axis=1)
        ei = jnp.abs(res.inv.pose - xi_i).max(axis=1)
        eu = jnp.abs(res.fused_pose - xi_f).max(axis=1)
        # where BOTH directions converged, geometric-information fusion
        # is at least as good as the better individual estimate
        both_ok = (ef < 0.005) & (ei < 0.005)
        assert bool(jnp.any(both_ok))
        assert bool(jnp.all(~both_ok | (eu <= 1.1 * jnp.minimum(ef, ei))))
        info = np.asarray(res.fwd.pose_info)
        # information matrices are symmetric PSD
        np.testing.assert_allclose(info, np.swapaxes(info, 1, 2),
                                   rtol=1e-3, atol=1e-5)
        assert (np.linalg.eigvalsh(info) > -1e-3).all()

    def test_sharded_matches_single_device(self):
        """The sequence solve partitions SPMD over the window axis: same
        result on an 8-device virtual mesh as on one device."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from tcsfm.dist.mesh import make_mesh

        frames, depths, K, xi_f, xi_i = self._seq_setup(n_frames=9, seed=32)
        pert_f = xi_f.at[:, 2].add(0.005)
        pert_i = xi_i.at[:, 2].add(-0.005)

        fn = jax.jit(lambda fr, d, pf, pi: sequence_ba(
            fr, d, K, pf, pi, iters=3).fused_pose)
        base = np.asarray(fn(frames, depths, pert_f, pert_i))

        mesh = make_mesh(8)
        shard = NamedSharding(mesh, P("data"))
        # frames/depths split on the frame axis is NOT window-aligned
        # (windows overlap frames), so shard the pose chain and replicate
        # images — XLA propagates the window sharding through the solve.
        pf_s = jax.device_put(pert_f, shard)
        pi_s = jax.device_put(pert_i, shard)
        out = np.asarray(fn(frames, depths, pf_s, pi_s))
        np.testing.assert_allclose(out, base, rtol=1e-4, atol=1e-6)
