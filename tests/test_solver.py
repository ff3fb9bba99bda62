"""Coupled solver tests: shapes, coupling behavior, jit/grad, perturbation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcsfm.models.depth import DepthNet
from tcsfm.models.pose import PoseNet
from tcsfm.solver.coupled import solve_disp, solve_pose, solve_pose_iteratively
from tcsfm.utils.helpers import disp_to_depth

B, S, H, W = 2, 2, 32, 64


def _rand(shape, seed=0):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32)


def _K(b=B):
    K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]], np.float32)
    return jnp.asarray(np.broadcast_to(K, (b, 3, 3)).copy())


@pytest.fixture(scope="module")
def nets():
    depth = DepthNet(num_scales=1)
    pose = PoseNet()
    x1 = jnp.zeros((1, H, W, 3))
    x2 = jnp.zeros((1, H, W, 6))
    dvars = depth.init(jax.random.PRNGKey(0), x1)
    pvars = pose.init(jax.random.PRNGKey(1), x2)
    depth_apply = lambda imgs: depth.apply(dvars, imgs)  # noqa: E731
    pose_apply = lambda imgs: pose.apply(pvars, imgs)    # noqa: E731
    return depth_apply, pose_apply, dvars, pvars


def _inputs(seed=0):
    tgt = jnp.asarray(_rand((B, H, W, 3), seed))
    src = jnp.asarray(_rand((S, B, H, W, 3), seed + 1))
    return tgt, src


class TestSolveDisp:
    def test_shapes_and_batching(self, nets):
        depth_apply, _, _, _ = nets
        tgt, src = _inputs()
        disps = solve_disp(depth_apply, tgt, src)
        assert len(disps) == S + 1
        for f in range(S + 1):
            assert disps[f][0].shape == (B, H, W, 1)
        # batched call must agree with per-frame calls
        # batch-size-dependent XLA conv algorithm choice gives ~1e-5 noise
        solo = depth_apply(tgt)[0]
        np.testing.assert_allclose(np.asarray(disps[0][0]), np.asarray(solo),
                                   atol=1e-3)


class TestSolvePose:
    def test_shapes(self, nets):
        _, pose_apply, _, _ = nets
        tgt, src = _inputs()
        poses, poses_inv = solve_pose(pose_apply, tgt, src)
        assert poses.shape == (S, B, 6)
        assert poses_inv.shape == (S, B, 6)

    def test_packing_matches_individual_calls(self, nets):
        _, pose_apply, _, _ = nets
        tgt, src = _inputs(seed=3)
        poses, poses_inv = solve_pose(pose_apply, tgt, src)
        for j in range(S):
            fwd = pose_apply(jnp.concatenate([tgt, src[j]], -1))
            np.testing.assert_allclose(np.asarray(poses[j]), np.asarray(fwd),
                                       atol=1e-5)


class TestSolvePoseIteratively:
    def _depths(self, nets, tgt, src):
        depth_apply = nets[0]
        disps = solve_disp(depth_apply, tgt, src)
        return jnp.stack(
            [disp_to_depth(disps[f][0], 0.06, 80 / 30.0)[1] for f in range(S + 1)]
        )

    def test_one_iter_equals_solve_pose(self, nets):
        _, pose_apply, _, _ = nets
        tgt, src = _inputs(seed=4)
        depths = self._depths(nets, tgt, src)
        p1, pi1 = solve_pose_iteratively(1, depths, pose_apply, tgt, src, _K())
        p0, pi0 = solve_pose(pose_apply, tgt, src)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(pi1), np.asarray(pi0), atol=1e-5)

    def test_outputs_structure(self, nets):
        _, pose_apply, _, _ = nets
        tgt, src = _inputs(seed=5)
        depths = self._depths(nets, tgt, src)
        poses, poses_inv, out = solve_pose_iteratively(
            3, depths, pose_apply, tgt, src, _K(), return_errors=True
        )
        assert poses.shape == (S, B, 6)
        assert out["fwd"].poses.shape == (S * B, 3, 6)
        assert out["fwd"].diff_img.shape == (S * B, H, W, 1)
        assert out["inv"].valid_mask.shape == (S * B, H, W, 1)
        # final pose of the chain equals the returned pose
        np.testing.assert_allclose(
            np.asarray(out["fwd"].poses[:, -1].reshape(S, B, 6)),
            np.asarray(poses), atol=1e-6,
        )
        am = np.asarray(out["fwd"].auto_mask)
        assert set(np.unique(am)).issubset({0.0, 1.0})

    def test_iterations_change_pose(self, nets):
        _, pose_apply, _, _ = nets
        tgt, src = _inputs(seed=6)
        depths = self._depths(nets, tgt, src)
        p1, _ = solve_pose_iteratively(1, depths, pose_apply, tgt, src, _K())
        p4, _ = solve_pose_iteratively(4, depths, pose_apply, tgt, src, _K())
        assert np.abs(np.asarray(p4) - np.asarray(p1)).max() > 1e-7

    def test_jit_and_grad_through_coupling(self, nets):
        depth_apply, _, dvars, pvars = nets
        pose_model = PoseNet()
        tgt, src = _inputs(seed=7)
        depths = self._depths(nets, tgt, src)
        K = _K()

        @jax.jit
        def loss_fn(pvars):
            apply = lambda imgs: pose_model.apply(pvars, imgs)  # noqa: E731
            poses, poses_inv = solve_pose_iteratively(
                3, depths, apply, tgt, src, K
            )
            return jnp.sum(poses ** 2) + jnp.sum(poses_inv ** 2)

        g = jax.grad(loss_fn)(pvars)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        assert sum(float(np.abs(np.asarray(l)).sum()) for l in leaves) > 0

    def test_perturbation_injection(self, nets):
        """Fault-injection capability (pose_perturbation_experiment.py:146-151)."""
        _, pose_apply, _, _ = nets
        tgt, src = _inputs(seed=8)
        depths = self._depths(nets, tgt, src)
        clean, _ = solve_pose_iteratively(2, depths, pose_apply, tgt, src, _K())
        pert, _ = solve_pose_iteratively(
            2, depths, pose_apply, tgt, src, _K(),
            trans_pert=jnp.full((2 * S * B,), 0.05),
        )
        # the injected tz offset must propagate into the final estimate
        assert np.abs(np.asarray(pert) - np.asarray(clean)).max() > 1e-3
