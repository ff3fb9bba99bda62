"""Loss stack parity tests against torch implementations of the formulas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcsfm.config import Config
from tcsfm.losses import photometric as L
from tcsfm.utils.helpers import disp_to_depth

B, H, W = 2, 24, 32


def _rand(shape, seed=0):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32)


class TestSSIM:
    def test_identical_images_zero(self):
        x = jnp.asarray(_rand((B, H, W, 3)))
        out = L.ssim_loss(x, x)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-5)

    def test_matches_torch(self):
        torch = pytest.importorskip("torch")
        import torch.nn as nn

        x = _rand((B, H, W, 3), seed=1)
        y = _rand((B, H, W, 3), seed=2)
        ours = np.asarray(L.ssim_loss(jnp.asarray(x), jnp.asarray(y)))

        # torch version of the SSIM at losses.py:11-41
        pool = nn.AvgPool2d(3, 1)
        refl = nn.ReflectionPad2d(1)
        tx = refl(torch.from_numpy(x).permute(0, 3, 1, 2))
        ty = refl(torch.from_numpy(y).permute(0, 3, 1, 2))
        mu_x, mu_y = pool(tx), pool(ty)
        sx = pool(tx ** 2) - mu_x ** 2
        sy = pool(ty ** 2) - mu_y ** 2
        sxy = pool(tx * ty) - mu_x * mu_y
        C1, C2 = 0.01 ** 2, 0.03 ** 2
        n = (2 * mu_x * mu_y + C1) * (2 * sxy + C2)
        d = (mu_x ** 2 + mu_y ** 2 + C1) * (sx + sy + C2)
        theirs = torch.clamp((1 - n / d) / 2, 0, 1).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_range(self):
        x = jnp.asarray(_rand((1, H, W, 3), seed=3))
        y = 1.0 - x
        out = np.asarray(L.ssim_loss(x, y))
        assert out.min() >= 0.0 and out.max() <= 1.0


class TestSmooth:
    def test_constant_disp_zero(self):
        disp = jnp.full((B, H, W, 1), 0.5)
        img = jnp.asarray(_rand((B, H, W, 3), seed=4))
        assert float(L.smooth_loss(disp, img)) < 1e-6

    def test_matches_torch(self):
        torch = pytest.importorskip("torch")

        disp = _rand((B, H, W, 1), seed=5)
        img = _rand((B, H, W, 3), seed=6)
        ours = float(L.smooth_loss(jnp.asarray(disp), jnp.asarray(img)))

        td = torch.from_numpy(disp).permute(0, 3, 1, 2)
        ti = torch.from_numpy(img).permute(0, 3, 1, 2)
        mean_disp = td.mean(2, True).mean(3, True)
        td = td / (mean_disp + 1e-7)
        gx = torch.abs(td[:, :, :, :-1] - td[:, :, :, 1:])
        gy = torch.abs(td[:, :, :-1, :] - td[:, :, 1:, :])
        igx = torch.mean(torch.abs(ti[:, :, :, :-1] - ti[:, :, :, 1:]), 1, keepdim=True)
        igy = torch.mean(torch.abs(ti[:, :, :-1, :] - ti[:, :, 1:, :]), 1, keepdim=True)
        theirs = float((gx * torch.exp(-igx)).mean() + (gy * torch.exp(-igy)).mean())
        assert abs(ours - theirs) < 1e-6


class TestMeanOnMask:
    def test_guard(self):
        diff = jnp.ones((1, H, W, 1))
        mask = jnp.zeros((1, H, W, 1))
        assert float(L.mean_on_mask(diff, mask)) == 0.0
        # small number of valid pixels → guard triggers
        mask2 = mask.at[0, 0, :4].set(1.0)
        assert float(L.mean_on_mask(diff, mask2)) == 0.0

    def test_masked_mean(self):
        diff = jnp.asarray(_rand((1, 128, 128, 1), seed=7))
        mask = jnp.ones((1, 128, 128, 1))
        np.testing.assert_allclose(
            float(L.mean_on_mask(diff, mask)), float(jnp.mean(diff)), atol=1e-6
        )


class TestPoseConsistency:
    def test_opposite_poses_zero(self):
        p = jnp.asarray(_rand((2, B, 6), seed=8))
        assert float(L.pose_consistency_loss(p, -p)) < 1e-7

    def test_value(self):
        p = jnp.ones((2, B, 6))
        q = jnp.zeros((2, B, 6))
        np.testing.assert_allclose(float(L.pose_consistency_loss(p, q)), 2.0, atol=1e-6)


class TestComputeLosses:
    def _inputs(self):
        cfg = Config(minibatch=B, num_scales=1)
        S = 2
        src = jnp.asarray(_rand((S, B, H, W, 3), seed=9))
        tgt = jnp.asarray(_rand((B, H, W, 3), seed=10))
        poses = jnp.asarray(_rand((S, B, 6), seed=11) * 0.02 - 0.01)
        poses_inv = -poses
        disps = [[jnp.asarray(_rand((B, H, W, 1), seed=20 + f) * 0.5 + 0.2)]
                 for f in range(S + 1)]
        K = jnp.broadcast_to(
            jnp.asarray([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]]), (B, 3, 3)
        )
        return cfg, src, tgt, poses, poses_inv, disps, K

    def test_finite_and_positive(self):
        cfg, src, tgt, poses, poses_inv, disps, K = self._inputs()
        out = L.compute_losses(cfg, src, tgt, poses, poses_inv, disps, K)
        for k, v in out.items():
            assert np.isfinite(float(v)), k
        assert float(out["total"]) > 0
        assert set(out) == {
            "l_reconstruct_forward", "l_reconstruct_inverse", "l_depth",
            "l_smooth", "total",
        }

    def test_jit_and_grad(self):
        cfg, src, tgt, poses, poses_inv, disps, K = self._inputs()

        @jax.jit
        def total(poses, disps):
            return L.compute_losses(cfg, src, tgt, poses, poses_inv, disps, K)["total"]

        g = jax.grad(total)(poses, disps)
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.abs(np.asarray(g)).sum() > 0

    def test_perfect_reconstruction_low_loss(self):
        """Identical target/sources & identity pose → tiny photometric loss."""
        cfg = Config(minibatch=B, num_scales=1, l_smooth=False,
                     with_auto_mask=False)
        # smooth image: the reference warp's sub-pixel shear (see
        # test_warp.test_identity_pose) leaves almost no residual on it
        ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        smooth = 0.5 + 0.4 * np.sin(2 * np.pi * xs / W) * np.cos(2 * np.pi * ys / H)
        img = jnp.asarray(
            np.broadcast_to(smooth[None, :, :, None], (B, H, W, 3)).astype(np.float32)
        )
        # constant-ish depth so warp ~identity
        disp = jnp.full((B, H, W, 1), 0.5)
        src = jnp.stack([img, img])
        disps = [[disp]] * 3
        K = jnp.broadcast_to(
            jnp.asarray([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]]), (B, 3, 3)
        )
        zero_pose = jnp.zeros((2, B, 6))
        out = L.compute_losses(cfg, src, img, zero_pose, zero_pose, disps, K)
        # the loss must be discriminative: identity pose scores well below a
        # visibly wrong pose (residual floor comes from the reference
        # sampler's sub-pixel shear + border taps at this tiny resolution)
        bad_pose = jnp.zeros((2, B, 6)).at[..., 0].set(0.3)
        out_bad = L.compute_losses(cfg, src, img, bad_pose, bad_pose, disps, K)
        assert float(out["l_reconstruct_forward"]) < 0.5 * float(
            out_bad["l_reconstruct_forward"]
        )
        assert float(out["l_depth"]) < 1e-4
