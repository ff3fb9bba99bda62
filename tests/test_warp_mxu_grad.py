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

    @pytest.mark.parametrize("grad_ch", [(), (3,), (1, 2)])
    def test_grad_ch_subset(self, data, grad_ch):
        """grad_ch: d_coords is bit-identical to the full backward; d_img
        matches the full path on the kept channels and is exactly zero on
        the dropped (data-leaf) channels."""
        img, coords, g = data

        def loss(im, c, gch):
            return jnp.sum(
                grid_sample_mxu_diff(im, c, 24, True, True, (), gch) * g)

        gi_f, gc_f = jax.grad(loss, argnums=(0, 1))(img, coords, None)
        gi_s, gc_s = jax.grad(loss, argnums=(0, 1))(img, coords, grad_ch)
        np.testing.assert_array_equal(np.asarray(gc_s), np.asarray(gc_f))
        gi_s, gi_f = np.asarray(gi_s), np.asarray(gi_f)
        for ch in range(C):
            if ch in grad_ch:
                np.testing.assert_array_equal(gi_s[..., ch], gi_f[..., ch])
            else:
                np.testing.assert_array_equal(gi_s[..., ch], 0.0)

    def test_inverse_warp2_mxu_img_grad_false_matches(self):
        """img_grad=False leaves depth/pose gradients bit-identical on the
        losses' sample_depth=True warp (only the dead RGB d_img is cut)."""
        from tcsfm.geom.warp import inverse_warp2_mxu

        rng = np.random.RandomState(7)
        b, h, w = 1, 16, 64
        img = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
        depth = jnp.asarray(1.0 + rng.rand(b, h, w, 1).astype(np.float32))
        ref_depth = jnp.asarray(1.0 + rng.rand(b, h, w, 1).astype(np.float32))
        pose = jnp.asarray(0.01 * rng.randn(b, 6).astype(np.float32))
        K = jnp.asarray(np.broadcast_to(
            np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]],
                     np.float32), (b, 3, 3)).copy())

        def loss(d, rd, p, ig):
            wi, vm, pd, cd = inverse_warp2_mxu(
                img, d, rd, p, K, band=16, img_grad=ig, interpret=True)
            return jnp.sum(wi * vm) + jnp.sum(pd * vm) + jnp.sum(cd)

        g_t = jax.grad(loss, argnums=(0, 1, 2))(depth, ref_depth, pose, True)
        g_f = jax.grad(loss, argnums=(0, 1, 2))(depth, ref_depth, pose, False)
        for a, b_ in zip(g_t, g_f):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    def test_u8_backward_matches_hilo(self):
        """uint8-mode backward (255x single-pass tap values on the u8
        channels) vs the all-hi/lo backward on k/255 data: d_coords agree
        to f32 rounding and d_img (u8 channels are data in practice, but
        the kernel must still be correct when asked) matches XLA."""
        rng = np.random.RandomState(11)
        h, w = 16, 64
        img = jnp.asarray(
            rng.randint(0, 256, (1, h, w, 3)).astype(np.float32) / 255.0)
        g = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
        coords = _identity_coords(1, h, w)
        coords += (0.02 * rng.randn(1, h, w, 2)).astype(np.float32)
        coords = jnp.asarray(coords)

        def loss(c, exact, u8):
            return jnp.sum(
                grid_sample_mxu_diff(img, c, 16, True, exact, u8) * g)

        g_hilo = np.asarray(jax.grad(loss)(coords, True, ()))
        g_u8 = np.asarray(jax.grad(loss)(coords, (), (0, 1, 2)))
        np.testing.assert_allclose(g_u8, g_hilo, atol=1e-4, rtol=1e-4)

        def loss_ref(c):
            return jnp.sum(grid_sample(img, c) * g)

        g_ref = np.asarray(jax.grad(loss_ref)(coords))
        np.testing.assert_allclose(g_u8, g_ref, atol=1e-4, rtol=1e-3)

    def test_u8_mixed_with_hilo_depth_channel(self):
        """The eval/PFT layout: RGB u8 + a hi/lo depth channel, d_img only
        for the depth channel — gradients match the XLA sampler."""
        rng = np.random.RandomState(13)
        h, w = 16, 64
        rgb = rng.randint(0, 256, (1, h, w, 3)).astype(np.float32) / 255.0
        depth = (1.0 + rng.rand(1, h, w, 1)).astype(np.float32)
        packed = jnp.asarray(np.concatenate([rgb, depth], axis=-1))
        g = jnp.asarray(rng.rand(1, h, w, 4).astype(np.float32))
        coords = _identity_coords(1, h, w)
        coords += (0.02 * rng.randn(1, h, w, 2)).astype(np.float32)
        coords = jnp.asarray(coords)

        def loss(im, c):
            return jnp.sum(grid_sample_mxu_diff(
                im, c, 16, True, (3,), (0, 1, 2), (3,)) * g)

        def loss_ref(im, c):
            return jnp.sum(grid_sample(im, c) * g)

        gi, gc = jax.grad(loss, argnums=(0, 1))(packed, coords)
        gi_r, gc_r = jax.grad(loss_ref, argnums=(0, 1))(packed, coords)
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gc_r),
                                   atol=2e-2, rtol=3e-2)
        np.testing.assert_allclose(np.asarray(gi)[..., 3],
                                   np.asarray(gi_r)[..., 3],
                                   atol=2e-2, rtol=3e-2)
        np.testing.assert_array_equal(np.asarray(gi)[..., :3], 0.0)

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
