"""Warp correctness: grid_sample vs torch, inverse_warp2 vs the reference math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcsfm.geom import warp as W
from tcsfm.geom.camera import backproject, inv_intrinsics

B, H, Wd, C = 2, 16, 24, 3


def _rand(shape, seed=0):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32)


def _K(b=B):
    K = np.array([[20.0, 0, Wd / 2], [0, 20.0, H / 2], [0, 0, 1]], np.float32)
    return np.broadcast_to(K, (b, 3, 3)).copy()


class TestGridSample:
    def test_identity_grid(self):
        img = jnp.asarray(_rand((B, H, Wd, C)))
        xs, ys = np.meshgrid(np.arange(Wd), np.arange(H))
        # align_corners=False: g = (2x + 1) / W - 1
        gx = (2 * xs + 1) / Wd - 1
        gy = (2 * ys + 1) / H - 1
        coords = jnp.asarray(
            np.broadcast_to(np.stack([gx, gy], -1), (B, H, Wd, 2)).astype(np.float32)
        )
        out = W.grid_sample(img, coords)
        np.testing.assert_allclose(out, img, atol=1e-5)

    def test_matches_torch(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        img = _rand((B, H, Wd, C), seed=1)
        coords = (_rand((B, H, Wd, 2), seed=2) * 2.6 - 1.3).astype(np.float32)

        ours = np.asarray(W.grid_sample(jnp.asarray(img), jnp.asarray(coords)))
        theirs = (
            F.grid_sample(
                torch.from_numpy(img).permute(0, 3, 1, 2),
                torch.from_numpy(coords),
                mode="bilinear",
                padding_mode="zeros",
                align_corners=False,
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_zeros_padding(self):
        img = jnp.ones((1, H, Wd, 1))
        coords = jnp.full((1, H, Wd, 2), 2.0)  # fully out of bounds
        out = W.grid_sample(img, coords)
        np.testing.assert_allclose(out, 0.0, atol=0)

    def test_grad_flows(self):
        img = jnp.asarray(_rand((1, H, Wd, 1), seed=3))
        coords = jnp.zeros((1, H, Wd, 2))

        g = jax.grad(lambda c: jnp.sum(W.grid_sample(img, c)))(coords)
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.abs(np.asarray(g)).sum() > 0


class TestInverseWarp2:
    def test_identity_pose(self):
        """Zero pose + constant depth.

        The reference normalizes with the align_corners=True convention
        (stn.py:221-222) but samples align_corners=False (stn.py:266), so
        zero pose resamples at x' = x*W/(W-1) - 0.5 — a sub-pixel shear,
        not an exact identity. Verify that exact behavior on a linear ramp.
        """
        ramp = np.broadcast_to(
            np.arange(Wd, dtype=np.float32)[None, None, :, None], (B, H, Wd, 1)
        ).copy()
        img = jnp.asarray(ramp)
        depth = jnp.full((B, H, Wd, 1), 2.0)
        pose = jnp.zeros((B, 6))
        warped, valid, proj_d, comp_d = W.inverse_warp2(
            img, depth, depth, pose, jnp.asarray(_K())
        )
        xs = np.arange(Wd, dtype=np.float32)
        expected_x = xs * Wd / (Wd - 1) - 0.5
        interior = (expected_x >= 0) & (expected_x <= Wd - 1)
        np.testing.assert_allclose(
            np.asarray(warped)[0, H // 2, interior, 0], expected_x[interior],
            atol=1e-4,
        )
        np.testing.assert_allclose(np.asarray(comp_d), 2.0, atol=1e-5)
        assert np.asarray(valid).mean() > 0.9

    def test_pure_translation_shift(self):
        """Translating the camera along +x shifts sampling by fx*tx/Z pixels."""
        img = np.zeros((1, H, Wd, 1), np.float32)
        img[0, :, 10, 0] = 1.0
        depth = jnp.full((1, H, Wd, 1), 1.0)
        tx = 0.1  # shift = fx * tx / Z = 20 * 0.1 = 2 px
        pose = jnp.asarray([[tx, 0, 0, 0, 0, 0]], dtype=jnp.float32)
        warped, _, _, _ = W.inverse_warp2(
            jnp.asarray(img), depth, depth, pose, jnp.asarray(_K(1))
        )
        out = np.asarray(warped)[0, H // 2, :, 0]
        assert out[8] > 0.9  # column 10 sampled at x+2 → appears at 8
        assert out[10] < 0.1

    def test_matches_torch_reference_math(self):
        """Full parity vs a torch re-implementation of stn.py:234-273."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        img = _rand((B, H, Wd, C), seed=5)
        depth = (_rand((B, H, Wd, 1), seed=6) * 2 + 0.5).astype(np.float32)
        ref_depth = (_rand((B, H, Wd, 1), seed=7) * 2 + 0.5).astype(np.float32)
        pose = (_rand((B, 6), seed=8) * 0.1 - 0.05).astype(np.float32)
        K = _K()

        ours = W.inverse_warp2(
            jnp.asarray(img), jnp.asarray(depth), jnp.asarray(ref_depth),
            jnp.asarray(pose), jnp.asarray(K),
        )

        # --- torch reference math (mirrors models/stn.py) ---
        timg = torch.from_numpy(img).permute(0, 3, 1, 2)
        tdepth = torch.from_numpy(depth[..., 0])
        tref = torch.from_numpy(ref_depth).permute(0, 3, 1, 2)
        tK = torch.from_numpy(K)
        tpose = torch.from_numpy(pose)

        ys, xs = np.meshgrid(np.arange(H), np.arange(Wd), indexing="ij")
        pix = torch.from_numpy(
            np.stack([xs, ys, np.ones_like(xs)], 0).astype(np.float32)
        ).reshape(1, 3, -1).expand(B, 3, H * Wd)
        cam = (tK.inverse() @ pix) * tdepth.reshape(B, 1, -1)

        R = torch.from_numpy(np.asarray(W.pose_vec2mat(jnp.asarray(pose))))
        P = tK @ R
        pc = P[:, :, :3] @ cam + P[:, :, 3:]
        X, Y, Z = pc[:, 0], pc[:, 1], pc[:, 2].clamp(min=1e-3)
        xn = 2 * (X / Z) / (Wd - 1) - 1
        yn = 2 * (Y / Z) / (H - 1) - 1
        xn[(xn.abs() > 1)] = 2
        yn[(yn.abs() > 1)] = 2
        grid = torch.stack([xn, yn], 2).reshape(B, H, Wd, 2)
        t_warp = F.grid_sample(timg, grid, padding_mode="zeros", align_corners=False)
        t_proj = F.grid_sample(tref, grid, padding_mode="zeros", align_corners=False)
        t_valid = (grid.abs().max(dim=-1)[0] <= 1).float()

        np.testing.assert_allclose(
            np.asarray(ours[0]), t_warp.permute(0, 2, 3, 1).numpy(), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(ours[1])[..., 0], t_valid.numpy(), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ours[2]), t_proj.permute(0, 2, 3, 1).numpy(), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(ours[3])[..., 0], Z.reshape(B, H, Wd).numpy(), atol=1e-4
        )

    def test_jit_and_grad(self):
        img = jnp.asarray(_rand((B, H, Wd, C), seed=9))
        depth = jnp.full((B, H, Wd, 1), 1.5)
        K = jnp.asarray(_K())

        @jax.jit
        def loss(pose, depth):
            warped, valid, _, _ = W.inverse_warp2(img, depth, depth, pose, K)
            return jnp.sum(warped * valid)

        g_pose = jax.grad(loss)(jnp.full((B, 6), 0.01), depth)
        g_depth = jax.grad(loss, argnums=1)(jnp.full((B, 6), 0.01), depth)
        assert np.all(np.isfinite(np.asarray(g_pose)))
        assert np.abs(np.asarray(g_pose)).sum() > 0
        assert np.all(np.isfinite(np.asarray(g_depth)))
