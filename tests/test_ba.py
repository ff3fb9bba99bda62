"""Photometric BA: joint pose+depth refinement with Schur complement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


class TestWindowBA:
    """Joint 3-frame-window BA with SHARED target depth."""

    def _win_setup(self, seed=41):
        seq = make_synthetic_sequence(3, (64, 96), seed=seed)
        xi_prev = relative_lie_alg(seq.gt_poses[1],
                                   seq.gt_poses[0]).astype(np.float32)
        xi_next = relative_lie_alg(seq.gt_poses[1],
                                   seq.gt_poses[2]).astype(np.float32)
        return (
            jnp.asarray(xi_prev[None]), jnp.asarray(xi_next[None]),
            jnp.asarray(seq.depths[1][None, ..., None]),
            jnp.asarray(seq.images[1][None]),
            jnp.asarray(seq.images[0][None]),
            jnp.asarray(seq.images[2][None]),
            jnp.asarray(seq.depths[0][None, ..., None]),
            jnp.asarray(seq.depths[2][None, ..., None]),
            jnp.asarray(seq.intrinsics[1][None]),
        )

    def test_joint_window_reduces_cost(self):
        from tcsfm.solver.ba import window_ba

        pa, pb, d, tgt, prv, nxt, dp, dn, K = self._win_setup()
        res = jax.jit(lambda a, b, dd: window_ba(
            a, b, dd, tgt, prv, nxt, dp, dn, K, iters=8,
            depth_prior_weight=0.1))(
            pa.at[:, 1].add(0.008), pb.at[:, 1].add(-0.008), d * 1.1)
        costs = np.asarray(res.cost)[:, 0]
        assert costs[-1] < 0.6 * costs[0], costs
        assert np.all(np.asarray(res.depth) > 0)

    def test_bf16_inputs_are_promoted(self):
        """BA must solve in f32 even when the upstream nets ran in bf16
        (a bf16-trained config's depths used to poison the LM scan
        carries with mixed dtypes — found by scripts/bench_refiners.py)."""
        from tcsfm.solver.ba import window_ba

        pa, pb, d, tgt, prv, nxt, dp, dn, K = self._win_setup()
        bf = jnp.bfloat16
        res = jax.jit(lambda a, b, dd: window_ba(
            a, b, dd, tgt.astype(bf), prv.astype(bf), nxt.astype(bf),
            dp.astype(bf), dn.astype(bf), K, iters=4,
            depth_prior_weight=0.1))(
            pa.at[:, 1].add(0.008), pb.at[:, 1].add(-0.008),
            (d * 1.1).astype(bf))
        assert res.depth.dtype == jnp.float32
        costs = np.asarray(res.cost)[:, 0]
        assert costs[-1] < costs[0]

    def test_cross_block_nonzero_and_psd(self):
        """Shared depth couples the two poses: S_ab != 0, and the full
        12x12 reduced system stays PSD."""
        from tcsfm.solver.ba import window_ba

        pa, pb, d, tgt, prv, nxt, dp, dn, K = self._win_setup(seed=42)
        res = window_ba(pa, pb, d, tgt, prv, nxt, dp, dn, K, iters=2)
        S_ab = np.asarray(res.S_ab[0])
        assert np.abs(S_ab).max() > 1e-3
        S = np.block([[np.asarray(res.S_aa[0]), S_ab],
                      [S_ab.T, np.asarray(res.S_bb[0])]])
        np.testing.assert_allclose(S, S.T, rtol=1e-3, atol=1e-4)
        assert (np.linalg.eigvalsh(S) > -1e-2).all()


class TestChainBA:
    """Block-tridiagonal reduced camera system over the window chain."""

    def _chain_setup(self, n_frames=6, seed=51):
        seq = make_synthetic_sequence(n_frames, (64, 96), seed=seed)
        frames = jnp.asarray(seq.images)
        depths = jnp.asarray(seq.depths[..., None])
        K = jnp.asarray(seq.intrinsics[0])
        xi_edge = np.stack([
            relative_lie_alg(seq.gt_poses[t], seq.gt_poses[t + 1])
            for t in range(n_frames - 1)
        ]).astype(np.float32)
        xi_prev = np.stack([
            relative_lie_alg(seq.gt_poses[t], seq.gt_poses[t - 1])
            for t in range(1, n_frames - 1)
        ]).astype(np.float32)
        xi_next = xi_edge[1:].copy()
        return frames, depths, K, xi_edge, xi_prev, xi_next

    def test_tridiag_solver_matches_dense(self):
        from tcsfm.solver.ba import block_tridiag_solve

        rng = np.random.RandomState(3)
        E = 5
        D, U = [], []
        for _ in range(E):
            A = rng.randn(6, 6)
            D.append(A @ A.T + 6 * np.eye(6))
        for _ in range(E - 1):
            U.append(0.3 * rng.randn(6, 6))
        b = rng.randn(E, 6)
        H = np.zeros((6 * E, 6 * E))
        for i in range(E):
            H[6*i:6*i+6, 6*i:6*i+6] = D[i]
        for i in range(E - 1):
            H[6*i:6*i+6, 6*i+6:6*i+12] = U[i]
            H[6*i+6:6*i+12, 6*i:6*i+6] = U[i].T
        dense = np.linalg.solve(H, b.reshape(-1)).reshape(E, 6)
        ours = np.asarray(block_tridiag_solve(
            jnp.asarray(np.stack(D), jnp.float32),
            jnp.asarray(np.stack(U), jnp.float32),
            jnp.asarray(b, jnp.float32)))
        np.testing.assert_allclose(ours, dense, rtol=1e-3, atol=1e-4)

    @pytest.mark.full
    def test_chain_beats_per_pair_fusion(self):
        """Wrong-basin robustness: both measurements of one edge are
        corrupted far outside the full-res photometric basin. Per-pair
        BA (`sequence_ba`) has only that pair's own images, so the
        corrupted edge stays lost; the joint chain solve pulls it back
        through the neighboring windows' shared-depth coupling plus the
        coarse-to-fine pyramid. Both solvers get the SAME measurement
        content."""
        from tcsfm.solver.ba import chain_ba, sequence_ba

        frames, depths, K, xi_edge, xi_prev, xi_next = self._chain_setup()
        rng = np.random.RandomState(7)
        pp = xi_prev + 0.005 * rng.randn(*xi_prev.shape).astype(np.float32)
        pn = xi_next + 0.005 * rng.randn(*xi_next.shape).astype(np.float32)
        # edge 2 is measured by window 2's prev (-x_2) and window 1's
        # next (x_2): corrupt both, ~25x the background noise (chosen
        # well past the full-res basin edge — initializations *at* the
        # basin edge flip chaotically between codegen variants)
        corr = np.float32([1.0, -0.8, 1.0, 0.2, -0.2, 0.2]) * 0.12
        pp[2] += corr
        pn[1] -= corr

        res = jax.jit(lambda a, b: chain_ba(
            frames, depths, K, a, b, iters=8, depth_prior_weight=0.1,
            pyramid_levels=4, coarse_iters=8))(jnp.asarray(pp),
                                               jnp.asarray(pn))
        edge = np.asarray(res.edge_pose)
        assert edge.shape == (len(xi_edge), 6)
        err_chain = np.abs(edge - xi_edge).max(axis=1)

        # per-pair fusion from the same measurements: fwd inits from the
        # next-style twists, inv inits from the prev-style twists
        pf = jnp.asarray(np.concatenate([-pp[:1], pn]))
        pi = jnp.asarray(np.concatenate([pp, -pn[-1:]]))
        res_pp = jax.jit(lambda a, b: sequence_ba(
            frames, depths, K, a, b, iters=8,
            depth_prior_weight=0.1))(pf, pi)
        err_pair = np.abs(np.asarray(res_pp.fused_pose) - xi_edge).max(axis=1)

        assert err_chain[2] < 0.03, err_chain           # recovered
        assert err_chain[2] < 0.5 * err_pair[2], (err_chain, err_pair)
        assert err_chain.mean() < 0.5 * err_pair.mean(), (err_chain,
                                                          err_pair)

    def test_chain_sharded_matches_single_device(self):
        """Windows shard over the data axis; the tiny tridiagonal solve
        replicates — same result on the 8-device virtual mesh."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from tcsfm.dist.mesh import make_mesh
        from tcsfm.solver.ba import chain_ba

        frames, depths, K, xi_edge, xi_prev, xi_next = self._chain_setup(
            n_frames=10, seed=52)
        pert_prev = jnp.asarray(xi_prev).at[:, 1].add(0.005)
        pert_next = jnp.asarray(xi_next).at[:, 1].add(-0.005)

        fn = jax.jit(lambda pp, pn: chain_ba(
            frames, depths, K, pp, pn, iters=3).edge_pose)
        base = np.asarray(fn(pert_prev, pert_next))

        mesh = make_mesh(8)
        shard = NamedSharding(mesh, P("data"))
        out = np.asarray(fn(jax.device_put(pert_prev, shard),
                            jax.device_put(pert_next, shard)))
        np.testing.assert_allclose(out, base, rtol=1e-4, atol=1e-6)


class TestMXUForwardModeResidual:
    """The forward-mode MXU sampler path of the GN/LM refiners
    (use_mxu_warp=True routes residuals through grid_sample_mxu_fwd_diff;
    interpret mode on CPU)."""

    def test_photometric_ba_mxu_matches_xla(self):
        true_pose, tgt, src, d_t, d_s, K = _setup(seed=26)
        pert_pose = true_pose.at[:, 2].add(0.006)
        pert_depth = d_t * 1.1
        r_x = photometric_ba(pert_pose, pert_depth, tgt, src, d_s, K,
                             iters=6, depth_prior_weight=0.1)
        r_m = photometric_ba(pert_pose, pert_depth, tgt, src, d_s, K,
                             iters=6, depth_prior_weight=0.1,
                             use_mxu_warp=True, interpret=True)
        # same solve up to sampler numerics (hi/lo-exact values, jvp taps)
        np.testing.assert_allclose(np.asarray(r_m.pose),
                                   np.asarray(r_x.pose), atol=2e-4)
        cx, cm = np.asarray(r_x.cost)[:, 0], np.asarray(r_m.cost)[:, 0]
        assert cm[-1] < 0.7 * cm[0], cm
        np.testing.assert_allclose(cm, cx, rtol=0.05)

    def test_gauss_newton_mxu_matches_xla(self):
        from tcsfm.solver.gauss_newton import gauss_newton_pose

        true_pose, tgt, src, d_t, d_s, K = _setup(seed=27)
        pert_pose = true_pose.at[:, 4].add(0.004)
        r_x = gauss_newton_pose(pert_pose, tgt, src, d_t, d_s, K, iters=6)
        r_m = gauss_newton_pose(pert_pose, tgt, src, d_t, d_s, K, iters=6,
                                use_mxu_warp=True, interpret=True)
        np.testing.assert_allclose(np.asarray(r_m.pose),
                                   np.asarray(r_x.pose), atol=2e-4)
        cm = np.asarray(r_m.cost)[:, 0]
        assert cm[-1] < cm[0]

    def test_window_ba_mxu_matches_xla(self):
        from tcsfm.solver.ba import window_ba

        seq = make_synthetic_sequence(4, (64, 96), seed=28)
        t = 1
        xi_p = relative_lie_alg(seq.gt_poses[t],
                                seq.gt_poses[t - 1]).astype(np.float32)
        xi_n = relative_lie_alg(seq.gt_poses[t],
                                seq.gt_poses[t + 1]).astype(np.float32)
        args = (
            jnp.asarray(xi_p[None]).at[:, 2].add(0.005),
            jnp.asarray(xi_n[None]).at[:, 2].add(-0.005),
            jnp.asarray(seq.depths[t][None, ..., None]) * 1.1,
            jnp.asarray(seq.images[t][None]),
            jnp.asarray(seq.images[t - 1][None]),
            jnp.asarray(seq.images[t + 1][None]),
            jnp.asarray(seq.depths[t - 1][None, ..., None]),
            jnp.asarray(seq.depths[t + 1][None, ..., None]),
            jnp.asarray(seq.intrinsics[t][None]),
        )
        r_x = window_ba(*args, iters=5, depth_prior_weight=0.1)
        r_m = window_ba(*args, iters=5, depth_prior_weight=0.1,
                        use_mxu_warp=True, interpret=True)
        np.testing.assert_allclose(np.asarray(r_m.pose_prev),
                                   np.asarray(r_x.pose_prev), atol=3e-4)
        np.testing.assert_allclose(np.asarray(r_m.pose_next),
                                   np.asarray(r_x.pose_next), atol=3e-4)
        cm = np.asarray(r_m.cost)[:, 0]
        assert cm[-1] < cm[0]

    @pytest.mark.full
    def test_chain_ba_mxu_matches_xla(self):
        from tcsfm.solver.ba import chain_ba

        seq = make_synthetic_sequence(5, (64, 96), seed=29)
        xi_prev = np.stack([
            relative_lie_alg(seq.gt_poses[t], seq.gt_poses[t - 1])
            for t in range(1, 4)
        ]).astype(np.float32)
        xi_next = np.stack([
            relative_lie_alg(seq.gt_poses[t], seq.gt_poses[t + 1])
            for t in range(1, 4)
        ]).astype(np.float32)
        rng = np.random.RandomState(3)
        pp = jnp.asarray(xi_prev + 0.004 * rng.randn(3, 6).astype(np.float32))
        pn = jnp.asarray(xi_next + 0.004 * rng.randn(3, 6).astype(np.float32))
        frames = jnp.asarray(seq.images)
        depths = jnp.asarray(seq.depths[..., None])
        K = jnp.asarray(seq.intrinsics[0])
        r_x = chain_ba(frames, depths, K, pp, pn, iters=4,
                       depth_prior_weight=0.1)
        r_m = chain_ba(frames, depths, K, pp, pn, iters=4,
                       depth_prior_weight=0.1, use_mxu_warp=True,
                       interpret=True)
        np.testing.assert_allclose(np.asarray(r_m.edge_pose),
                                   np.asarray(r_x.edge_pose), atol=3e-4)
        cm = np.asarray(r_m.cost)
        assert cm[-1] < cm[0]

    @pytest.mark.full
    def test_chain_ba_uint8_pyramid_matches_hilo(self):
        """uint8 sampler mode + pyramid: coarse levels sample ANTIALIASED
        downsampled frames (no longer k/255) and must force hi/lo — with
        the fix, a uint8-mode pyramid solve on uint8-grid data matches the
        all-hi/lo solve (both exact everywhere)."""
        from tcsfm.solver.ba import chain_ba

        seq = make_synthetic_sequence(5, (64, 96), seed=33)
        frames = jnp.asarray(
            np.round(np.asarray(seq.images) * 255.0) / 255.0)
        depths = jnp.asarray(seq.depths[..., None])
        K = jnp.asarray(seq.intrinsics[0])
        xi_prev = np.stack([
            relative_lie_alg(seq.gt_poses[t], seq.gt_poses[t - 1])
            for t in range(1, 4)
        ]).astype(np.float32)
        xi_next = np.stack([
            relative_lie_alg(seq.gt_poses[t], seq.gt_poses[t + 1])
            for t in range(1, 4)
        ]).astype(np.float32)
        rng = np.random.RandomState(5)
        pp = jnp.asarray(xi_prev + 0.004 * rng.randn(3, 6).astype(np.float32))
        pn = jnp.asarray(xi_next + 0.004 * rng.randn(3, 6).astype(np.float32))
        kw = dict(iters=3, coarse_iters=3, pyramid_levels=2,
                  depth_prior_weight=0.1, use_mxu_warp=True, interpret=True)
        r_u8 = chain_ba(frames, depths, K, pp, pn, mxu_exact="uint8", **kw)
        r_hl = chain_ba(frames, depths, K, pp, pn, mxu_exact=True, **kw)
        np.testing.assert_allclose(np.asarray(r_u8.edge_pose),
                                   np.asarray(r_hl.edge_pose), atol=3e-4)
