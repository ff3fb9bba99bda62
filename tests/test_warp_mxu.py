"""MXU grid-sample kernel: parity vs the exact XLA path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcsfm.geom.warp import grid_sample
from tcsfm.ops.warp_mxu import grid_sample_mxu, vertical_band_ok

B, H, W, C = 2, 32, 64, 4


def _identity_coords(b=B, h=H, w=W):
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    gx = (2 * xs + 1) / w - 1
    gy = (2 * ys + 1) / h - 1
    return np.broadcast_to(np.stack([gx, gy], -1), (b, h, w, 2)).astype(
        np.float32).copy()


def _img(seed=0):
    return jnp.asarray(np.random.RandomState(seed).rand(B, H, W, C)
                       .astype(np.float32))


class TestMXUGridSample:
    def test_identity(self):
        img = _img()
        out = grid_sample_mxu(img, jnp.asarray(_identity_coords()),
                              interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)

    def test_parity_smooth_warp(self):
        img = _img(1)
        rng = np.random.RandomState(2)
        coords = _identity_coords()
        coords += (0.02 * rng.randn(B, H, W, 2) * [1.0, 0.3]).astype(np.float32)
        out = grid_sample_mxu(img, jnp.asarray(coords), band=16,
                              interpret=True)
        ref = grid_sample(img, jnp.asarray(coords))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_parity_pushed_oob(self):
        """Coordinates pushed to 2.0 (the stn.py OOB rule) sample zero."""
        img = _img(3)
        coords = _identity_coords()
        coords[:, :4] = 2.0
        coords[:, :, :3] = 2.0
        out = grid_sample_mxu(img, jnp.asarray(coords), interpret=True)
        ref = grid_sample(img, jnp.asarray(coords))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out)[:, :4], 0.0, atol=0)

    def test_parity_edge_halfpixel(self):
        """Border sampling: taps outside the image contribute zero."""
        img = _img(4)
        coords = _identity_coords()
        # shift half a pixel beyond each edge
        coords[..., 0] += 1.2 / W
        coords[..., 1] -= 1.2 / H
        out = grid_sample_mxu(img, jnp.asarray(coords), interpret=True)
        ref = grid_sample(img, jnp.asarray(coords))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_nonaligned_width(self):
        """W not a lane multiple exercises the padding path."""
        img = jnp.asarray(np.random.RandomState(5).rand(1, 16, 52, 3)
                          .astype(np.float32))
        coords = jnp.asarray(_identity_coords(1, 16, 52))
        out = grid_sample_mxu(img, coords, band=8, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)

    def test_band_diagnostic(self):
        coords = jnp.asarray(_identity_coords())
        ok = vertical_band_ok(coords, H, band=16)
        assert bool(jnp.all(ok))
        # vertical shear larger than the band → flagged
        sheared = np.array(coords, copy=True)
        sheared[..., 1] += np.linspace(-0.9, 0.9, W)[None, None, :].astype(
            np.float32)
        ok2 = vertical_band_ok(jnp.asarray(sheared), H, band=8)
        assert not bool(jnp.all(ok2))
