"""Gradient parity of the differentiable MXU sampler vs the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcsfm.geom.warp import grid_sample
from tcsfm.ops.warp_mxu import grid_sample_mxu_diff

B, H, W, C = 2, 32, 64, 4


def _identity_coords(b=B, h=H, w=W):
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    gx = (2 * xs + 1) / w - 1
    gy = (2 * ys + 1) / h - 1
    return np.broadcast_to(np.stack([gx, gy], -1), (b, h, w, 2)).astype(
        np.float32).copy()


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    coords = _identity_coords()
    coords += (0.03 * rng.randn(B, H, W, 2) * [1.0, 0.3]).astype(np.float32)
    g = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    return img, jnp.asarray(coords), g


class TestMXUSamplerVJP:
    def test_forward_matches(self, data):
        img, coords, _ = data
        out = grid_sample_mxu_diff(img, coords, 24, True, True)
        ref = grid_sample(img, coords)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_grad_coords_matches_xla(self, data):
        img, coords, g = data

        def loss_mxu(c):
            return jnp.sum(grid_sample_mxu_diff(img, c, 24, True, True) * g)

        def loss_ref(c):
            return jnp.sum(grid_sample(img, c) * g)

        g_mxu = np.asarray(jax.grad(loss_mxu)(coords))
        g_ref = np.asarray(jax.grad(loss_ref)(coords))
        # backward runs single-pass bf16 (gradients tolerate ~1% noise)
        np.testing.assert_allclose(g_mxu, g_ref, atol=2e-2, rtol=3e-2)

    def test_grad_img_matches_xla(self, data):
        img, coords, g = data

        def loss_mxu(im):
            return jnp.sum(grid_sample_mxu_diff(im, coords, 24, True, True) * g)

        def loss_ref(im):
            return jnp.sum(grid_sample(im, coords) * g)

        g_mxu = np.asarray(jax.grad(loss_mxu)(img))
        g_ref = np.asarray(jax.grad(loss_ref)(img))
        np.testing.assert_allclose(g_mxu, g_ref, atol=2e-2, rtol=3e-2)

    def test_grads_wide_image_column_chunks(self, data):
        """W=384 (3 column tiles) + a 40 px lateral shift: the backward's
        chunk-skipped matmuls must match the XLA gradients."""
        h, w = 16, 384
        rng = np.random.RandomState(3)
        img = jnp.asarray(rng.rand(1, h, w, 2).astype(np.float32))
        g = jnp.asarray(rng.rand(1, h, w, 2).astype(np.float32))
        coords = _identity_coords(1, h, w)
        coords += (0.01 * rng.randn(1, h, w, 2)).astype(np.float32)
        coords[..., 0] += 2 * 40.0 / w
        coords = jnp.asarray(coords)

        def loss_mxu(im, c):
            return jnp.sum(grid_sample_mxu_diff(im, c, 16, True, True) * g)

        def loss_ref(im, c):
            return jnp.sum(grid_sample(im, c) * g)

        gi_m, gc_m = jax.grad(loss_mxu, argnums=(0, 1))(img, coords)
        gi_r, gc_r = jax.grad(loss_ref, argnums=(0, 1))(img, coords)
        np.testing.assert_allclose(np.asarray(gi_m), np.asarray(gi_r),
                                   atol=2e-2, rtol=3e-2)
        np.testing.assert_allclose(np.asarray(gc_m), np.asarray(gc_r),
                                   atol=2e-2, rtol=3e-2)

    def test_grad_zero_at_pushed_coords(self, data):
        img, coords, g = data
        pushed = np.array(coords, copy=True)
        pushed[:, :8] = 2.0

        def loss(c):
            return jnp.sum(grid_sample_mxu_diff(img, c, 24, True, True) * g)

        grads = np.asarray(jax.grad(loss)(jnp.asarray(pushed)))
        np.testing.assert_allclose(grads[:, :8], 0.0, atol=1e-7)

    def test_value_and_grad_jit(self, data):
        img, coords, g = data

        @jax.jit
        def vg(im, c):
            return jax.value_and_grad(
                lambda a, b: jnp.sum(
                    grid_sample_mxu_diff(a, b, 24, True, True) * g),
                argnums=(0, 1),
            )(im, c)

        val, (gi, gc) = vg(img, coords)
        assert np.isfinite(float(val))
        assert np.all(np.isfinite(np.asarray(gi)))
        assert np.all(np.isfinite(np.asarray(gc)))
