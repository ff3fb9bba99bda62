"""Photometric BA: joint pose+depth refinement with Schur complement."""

import jax
import jax.numpy as jnp
import numpy as np

from tcsfm.data.dataset import relative_lie_alg
from tcsfm.data.synthetic import make_synthetic_sequence
from tcsfm.solver.ba import photometric_ba


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
