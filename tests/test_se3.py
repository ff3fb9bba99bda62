"""Unit tests for tcsfm.geom.se3: round-trips, known values, finite diffs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcsfm.geom import se3

jax.config.update("jax_enable_x64", False)


def rand(shape, seed=0, scale=1.0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.uniform(-scale, scale, shape).astype(np.float32))


class TestEuler2Mat:
    def test_identity(self):
        R = se3.euler2mat(jnp.zeros((2, 3)))
        np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-6)

    def test_orthonormal(self):
        R = se3.euler2mat(rand((8, 3), scale=2.0))
        RtR = np.einsum("bij,bkj->bik", R, R)
        np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_composition_order_xyz(self):
        # R = Rx @ Ry @ Rz (models/stn.py:115): pure z rotation
        a = jnp.array([[0.0, 0.0, np.pi / 2]])
        R = np.asarray(se3.euler2mat(a))[0]
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
        np.testing.assert_allclose(R, expected, atol=1e-6)

    def test_matches_scipy(self):
        from scipy.spatial.transform import Rotation

        angles = np.asarray(rand((16, 3), seed=3, scale=1.5))
        R = np.asarray(se3.euler2mat(jnp.asarray(angles)))
        # Rx @ Ry @ Rz == extrinsic 'zyx' with angles reversed
        R_ref = Rotation.from_euler("xyz", angles[:, ::-1][:, ::-1], degrees=False)
        for i in range(16):
            r = (
                Rotation.from_euler("x", angles[i, 0])
                * Rotation.from_euler("y", angles[i, 1])
                * Rotation.from_euler("z", angles[i, 2])
            ).as_matrix()
            np.testing.assert_allclose(R[i], r, atol=1e-5)


class TestSO3:
    def test_exp_log_roundtrip(self):
        phi = rand((32, 3), seed=1, scale=1.5)
        phi2 = se3.so3_log(se3.so3_exp(phi))
        np.testing.assert_allclose(phi2, phi, atol=1e-4)

    def test_exp_small_angle(self):
        phi = rand((8, 3), seed=2, scale=1e-6)
        R = se3.so3_exp(phi)
        np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5)

    def test_exp_matches_scipy(self):
        from scipy.spatial.transform import Rotation

        phi = np.asarray(rand((16, 3), seed=4, scale=2.0))
        R = np.asarray(se3.so3_exp(jnp.asarray(phi)))
        R_ref = Rotation.from_rotvec(phi).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=1e-5)

    def test_grad_finite_at_zero(self):
        g = jax.grad(lambda p: jnp.sum(se3.so3_exp(p)))(jnp.zeros(3))
        assert np.all(np.isfinite(g))


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = rand((32, 6), seed=5, scale=1.0)
        xi2 = se3.se3_log(se3.se3_exp(xi))
        np.testing.assert_allclose(xi2, xi, atol=1e-4)

    def test_exp_zero(self):
        T = se3.se3_exp(jnp.zeros((4, 6)))
        np.testing.assert_allclose(T, np.broadcast_to(np.eye(4), (4, 4, 4)), atol=1e-6)

    def test_inv(self):
        T = se3.se3_exp(rand((8, 6), seed=6))
        I = np.asarray(T @ se3.se3_inv(T))
        np.testing.assert_allclose(I, np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-5)

    def test_translation_first_ordering(self):
        # xi = [rho, phi]; with phi=0, exp is a pure translation by rho.
        xi = jnp.array([[1.0, 2.0, 3.0, 0.0, 0.0, 0.0]])
        T = np.asarray(se3.se3_exp(xi))[0]
        np.testing.assert_allclose(T[:3, 3], [1, 2, 3], atol=1e-6)
        np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-6)

    def test_from_matrix_normalizes(self):
        T = np.asarray(se3.se3_exp(rand((4, 6), seed=7)))
        T_noisy = T.copy()
        T_noisy[:, :3, :3] += 1e-3 * np.random.RandomState(0).randn(4, 3, 3)
        Tn = np.asarray(se3.se3_from_matrix(jnp.asarray(T_noisy)))
        R = Tn[:, :3, :3]
        np.testing.assert_allclose(
            np.einsum("bij,bkj->bik", R, R), np.broadcast_to(np.eye(3), (4, 3, 3)),
            atol=1e-5,
        )

    def test_grad_finite_at_zero(self):
        g = jax.grad(lambda x: jnp.sum(se3.se3_exp(x)))(jnp.zeros(6))
        assert np.all(np.isfinite(g))


class TestPoseVec2Mat:
    def test_shape_and_translation(self):
        vec = rand((5, 6), seed=8)
        T = se3.pose_vec2mat(vec)
        assert T.shape == (5, 3, 4)
        np.testing.assert_allclose(T[:, :, 3], vec[:, :3], atol=1e-6)

    def test_44(self):
        vec = rand((5, 6), seed=9)
        T = np.asarray(se3.pose_vec2mat44(vec))
        np.testing.assert_allclose(T[:, 3], np.broadcast_to([0, 0, 0, 1], (5, 4)), atol=0)

    def test_quat_identity(self):
        R = se3.quat2mat(jnp.zeros((3, 3)))
        np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), (3, 3, 3)), atol=1e-6)
