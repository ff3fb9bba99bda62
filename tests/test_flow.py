"""Tests for the TPU-native Farneback optical flow (tcsfm/ops/flow.py).

Covers: polynomial-expansion coefficient recovery on an analytic
quadratic, single-level subpixel shift recovery, pyramidal recovery of
multi-pixel shifts, cross-check against cv2.calcOpticalFlowFarneback
(the reference's exact call, kitti_loader_stereo.py:110), and the
solve_pose flow-channel plumbing (train_mono.py:22-29).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tcsfm.ops import flow as F


def _texture(h=48, w=64, sigma=2.5, seed=0):
    import scipy.ndimage as ndi
    rng = np.random.RandomState(seed)
    return ndi.gaussian_filter(rng.rand(h, w).astype(np.float32), sigma) * 255


def _shift(img, dx, dy):
    import scipy.ndimage as ndi
    # content moves by (+dx, +dy): flow img->shifted is (dx, dy)
    return ndi.shift(img, (dy, dx), order=3, mode="nearest")


class TestPolyExpansion:
    def test_quadratic_coefficients(self):
        """Expansion recovers the coefficients of an exact quadratic."""
        h, w = 21, 25
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        a_xx, a_yy, xy_c, b_x, b_y = 0.2, -0.3, 0.15, 4.0, 5.0
        img = (a_xx * xs ** 2 + a_yy * ys ** 2 + xy_c * xs * ys
               + b_x * xs + b_y * ys + 6.0)
        r = np.array(F.poly_expansion(jnp.asarray(img)))
        cy, cx = h // 2, w // 2
        # local expansion at pixel p: b_local = 2*A*p + b_global
        want_bx = 2 * a_xx * cx + xy_c * cy + b_x
        want_by = 2 * a_yy * cy + xy_c * cx + b_y
        np.testing.assert_allclose(r[cy, cx, 1], want_bx, rtol=1e-3)
        np.testing.assert_allclose(r[cy, cx, 0], want_by, rtol=1e-3)
        np.testing.assert_allclose(r[cy, cx, 3], a_xx, rtol=1e-3)
        np.testing.assert_allclose(r[cy, cx, 2], a_yy, rtol=1e-3)
        np.testing.assert_allclose(r[cy, cx, 4], xy_c, rtol=1e-3)

    def test_subpixel_single_level(self):
        base = _texture()
        moved = _shift(base, 0.5, -0.3)
        r0 = F.poly_expansion(jnp.asarray(base))
        r1 = F.poly_expansion(jnp.asarray(moved))
        fl = jnp.zeros(base.shape + (2,), jnp.float32)
        for _ in range(3):
            fl = F._solve_flow(F._box_blur(F._update_matrices(r0, r1, fl),
                                           15))
        interior = np.array(fl)[10:-10, 10:-10]
        np.testing.assert_allclose(interior[..., 0].mean(), 0.5, atol=0.05)
        np.testing.assert_allclose(interior[..., 1].mean(), -0.3, atol=0.05)


class TestFarnebackPyramid:
    def test_multi_pixel_shift(self):
        base = _texture(64, 96, sigma=3.0)
        moved = _shift(base, 1.5, -1.0)
        fl = np.array(F.farneback_flow(jnp.asarray(base), jnp.asarray(moved),
                                       levels=2))
        interior = fl[12:-12, 12:-12]
        np.testing.assert_allclose(interior[..., 0].mean(), 1.5, atol=0.3)
        np.testing.assert_allclose(interior[..., 1].mean(), -1.0, atol=0.3)

    def test_vs_cv2(self):
        cv2 = pytest.importorskip("cv2")
        # OpenCV 5's lazy module loader can fail to register the top-level
        # alias depending on what was imported first in the process
        fb = getattr(cv2, "calcOpticalFlowFarneback", None)
        if fb is None:
            fb = getattr(getattr(cv2, "video", None),
                         "calcOpticalFlowFarneback", None)
        if fb is None:
            pytest.skip("cv2 Farneback unavailable in this import order")
        base = _texture(64, 96, sigma=3.0)
        moved = _shift(base, 1.5, -1.0)
        ref = fb(base.astype(np.uint8), moved.astype(np.uint8), None,
                 0.5, 2, 15, 3, 5, 1.2, 0)
        mine = np.array(F.farneback_flow(jnp.asarray(base),
                                         jnp.asarray(moved), levels=2))
        c = slice(12, -12)
        epe = np.hypot(*(mine[c, c] - ref[c, c]).transpose(2, 0, 1))
        assert epe.mean() < 0.5, f"mean EPE vs cv2 {epe.mean():.3f}"


class TestFlowPlumbing:
    def test_batched_flow_pair_shapes(self):
        rgb_t = jnp.asarray(np.random.RandomState(0).rand(2, 32, 48, 3),
                            jnp.float32)
        rgb_s = jnp.roll(rgb_t, 2, axis=2)
        fwd, back = F.batched_flow_pair(rgb_t, rgb_s)
        assert fwd.shape == (2, 32, 48, 2)
        assert back.shape == (2, 32, 48, 2)
        # pure x-roll: forward flow ~ +2/W, backward ~ -2/W (normalized)
        inner = np.array(fwd)[:, 8:-8, 8:-8, 0]
        assert abs(inner.mean() - 2.0 / 48) < 1.5 / 48

    def test_solve_pose_with_flow_channels(self):
        from tcsfm.config import Config
        from tcsfm.models.pose import PoseNet
        from tcsfm.solver.coupled import solve_pose

        cfg = Config(flow_type="classical", img_resolution="low")
        assert cfg.pose_input_channels == 8
        model = PoseNet()
        rng = np.random.RandomState(1)
        tgt = jnp.asarray(rng.rand(2, 32, 48, 3), jnp.float32)
        src = jnp.asarray(rng.rand(1, 2, 32, 48, 3), jnp.float32)
        pvars = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 48, 8)))
        flows = (jnp.zeros((1, 2, 32, 48, 2)), jnp.zeros((1, 2, 32, 48, 2)))
        poses, poses_inv = solve_pose(
            lambda im: model.apply(pvars, im), tgt, src, flows)
        assert poses.shape == (1, 2, 6)
        assert poses_inv.shape == (1, 2, 6)
        assert np.isfinite(np.array(poses)).all()
