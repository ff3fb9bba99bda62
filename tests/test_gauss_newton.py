"""GN pose refinement: recovers perturbed poses on synthetic data."""

import jax
import jax.numpy as jnp
import numpy as np

from tcsfm.data.dataset import relative_lie_alg
from tcsfm.data.synthetic import make_synthetic_sequence
from tcsfm.solver.gauss_newton import gauss_newton_pose


class TestGaussNewton:
    def test_recovers_perturbed_pose(self):
        seq = make_synthetic_sequence(4, (64, 96), seed=21)
        t, s = 1, 2
        xi = relative_lie_alg(seq.gt_poses[t], seq.gt_poses[s]).astype(
            np.float32)

        tgt = jnp.asarray(seq.images[t][None])
        src = jnp.asarray(seq.images[s][None])
        d_t = jnp.asarray(seq.depths[t][None, ..., None])
        d_s = jnp.asarray(seq.depths[s][None, ..., None])
        K = jnp.asarray(seq.intrinsics[t][None])

        true_pose = jnp.asarray(xi[None])
        pert = true_pose.at[:, 2].add(0.01).at[:, 4].add(0.004)

        res = jax.jit(
            lambda p: gauss_newton_pose(p, tgt, src, d_t, d_s, K, iters=15,
                                        damping=1e-2)
        )(pert)

        costs = np.asarray(res.cost)
        assert costs[-1, 0] < costs[0, 0] * 0.5, costs[:, 0]
        # check the photometrically IDENTIFIABLE perturbed directions
        # (tz, yaw); ty/rx form the classic near-degenerate valley and are
        # not recoverable from photometric error alone
        tz_err0 = abs(float(pert[0, 2] - true_pose[0, 2]))
        tz_err1 = abs(float(res.pose[0, 2] - true_pose[0, 2]))
        yaw_err0 = abs(float(pert[0, 4] - true_pose[0, 4]))
        yaw_err1 = abs(float(res.pose[0, 4] - true_pose[0, 4]))
        assert tz_err1 < 0.5 * tz_err0, (tz_err0, tz_err1)
        assert yaw_err1 < 0.6 * yaw_err0, (yaw_err0, yaw_err1)

    def test_fixed_point_at_truth(self):
        """Starting at the true pose, GN should stay (cost can't improve)."""
        seq = make_synthetic_sequence(4, (64, 96), seed=22)
        t, s = 1, 2
        xi = relative_lie_alg(seq.gt_poses[t], seq.gt_poses[s]).astype(
            np.float32)
        tgt = jnp.asarray(seq.images[t][None])
        src = jnp.asarray(seq.images[s][None])
        d_t = jnp.asarray(seq.depths[t][None, ..., None])
        d_s = jnp.asarray(seq.depths[s][None, ..., None])
        K = jnp.asarray(seq.intrinsics[t][None])
        res = gauss_newton_pose(jnp.asarray(xi[None]), tgt, src, d_t, d_s, K,
                                iters=5)
        moved = float(jnp.linalg.norm(res.pose - jnp.asarray(xi[None])))
        assert moved < 5e-3, moved
