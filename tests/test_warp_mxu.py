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

    def test_mixed_precision_channels(self):
        """exact=(3,): channel 3 is f32-exact, RGB within bf16 rounding."""
        img = _img(6)
        rng = np.random.RandomState(7)
        coords = _identity_coords()
        coords += (0.02 * rng.randn(B, H, W, 2) * [1.0, 0.3]).astype(
            np.float32)
        out = grid_sample_mxu(img, jnp.asarray(coords), band=16,
                              interpret=True, exact=(3,))
        ref = grid_sample(img, jnp.asarray(coords))
        # hi/lo-split channel: exact
        np.testing.assert_allclose(np.asarray(out)[..., 3],
                                   np.asarray(ref)[..., 3], atol=1e-5)
        # bf16 channels: within single-pass rounding, but NOT f32-exact
        np.testing.assert_allclose(np.asarray(out)[..., :3],
                                   np.asarray(ref)[..., :3], atol=6e-3)
        fast = grid_sample_mxu(img, jnp.asarray(coords), band=16,
                               interpret=True, exact=False)
        np.testing.assert_allclose(np.asarray(out)[..., :3],
                                   np.asarray(fast)[..., :3], atol=1e-6)

    def test_wide_image_column_chunks(self):
        """W=384 (3 column tiles): the banded-selector chunk skipping must
        stay exact for smooth warps and for a uniform lateral shift."""
        h, w = 16, 384
        img = jnp.asarray(np.random.RandomState(8).rand(1, h, w, 2)
                          .astype(np.float32))
        rng = np.random.RandomState(9)
        coords = _identity_coords(1, h, w)
        coords += (0.01 * rng.randn(1, h, w, 2)).astype(np.float32)
        # add a +40 px lateral shift (well inside the 2-chunk window)
        coords[..., 0] += 2 * 40.0 / w
        out = grid_sample_mxu(img, jnp.asarray(coords), band=16,
                              interpret=True)
        ref = grid_sample(img, jnp.asarray(coords))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_wide_image_column_violation_flagged(self):
        """A horizontal spread larger than the 3-chunk window is flagged by
        the coverage mask, and every covered pixel still samples exactly."""
        from tcsfm.ops.warp_mxu import (band_coverage_mask, band_geometry,
                                        horizontal_band_ok)
        h, w = 16, 640
        img = jnp.asarray(np.random.RandomState(10).rand(1, h, w, 2)
                          .astype(np.float32))
        coords = _identity_coords(1, h, w)
        # horizontal stretch x ≈ 3.35·j: the source-column spread within
        # one 128-col output tile is ~425 px > the 3-chunk window (384)
        shift = np.linspace(0.0, 1500.0, w).astype(np.float32)
        coords[..., 0] += 2 * shift / w
        coords = np.clip(coords, -1.0, 1.0)
        ok = horizontal_band_ok(jnp.asarray(coords), w,
                                band_geometry(h, w, 16)[1])
        assert not bool(jnp.all(ok))
        bv, wp = band_geometry(h, w, 16)
        cover = np.asarray(band_coverage_mask(jnp.asarray(coords), h, bv,
                                              W=w, Wp=wp))
        assert 0 < cover.sum() < cover.size
        out = np.asarray(grid_sample_mxu(img, jnp.asarray(coords), band=16,
                                         interpret=True))
        ref = np.asarray(grid_sample(img, jnp.asarray(coords)))
        m = cover[..., None]
        np.testing.assert_allclose(out * m, ref * m, atol=1e-5)

    def test_partial_tail_tile(self):
        """W=400 (Wp=512, 4 column tiles, the last one mostly padding):
        chunk bases from the mixed real/pad tail tile stay exact."""
        h, w = 16, 400
        img = jnp.asarray(np.random.RandomState(11).rand(1, h, w, 2)
                          .astype(np.float32))
        rng = np.random.RandomState(12)
        coords = _identity_coords(1, h, w)
        coords += (0.02 * rng.randn(1, h, w, 2) * [1.0, 0.3]).astype(
            np.float32)
        out = grid_sample_mxu(img, jnp.asarray(coords), band=16,
                              interpret=True)
        ref = grid_sample(img, jnp.asarray(coords))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

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


class TestBandGuard:
    """The guarded MXU warp never silently samples zeros (VERDICT r1 §weak-1)."""

    def _warp_inputs(self, rz):
        """A warp whose in-group vertical spread is controlled by roll rz
        (a roll maps output rows to diagonal source bands: y-spread across
        one 8-row group ~ W*sin(rz), which overflows a narrow band)."""
        from tcsfm.geom.warp import inverse_warp2

        rng = np.random.RandomState(7)
        b, h, w = 1, 32, 64
        img = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
        depth = jnp.asarray(1.0 + rng.rand(b, h, w, 1).astype(np.float32))
        ref_depth = jnp.asarray(1.0 + rng.rand(b, h, w, 1).astype(np.float32))
        pose = jnp.asarray([[0.0, 0.0, 0.0, 0.0, 0.0, rz]], jnp.float32)
        K = jnp.asarray([[[60.0, 0, 32.0], [0, 60.0, 16.0], [0, 0, 1]]],
                        jnp.float32)
        return img, depth, ref_depth, pose, K

    def test_fallback_guard_fires_on_band_violation(self):
        """guard='fallback': large-rotation warp == XLA path (not zeros)."""
        from tcsfm.geom.warp import inverse_warp2, inverse_warp2_mxu
        from tcsfm.ops.warp_mxu import band_geometry, vertical_band_ok
        from tcsfm.geom.camera import backproject
        from tcsfm.geom.se3 import pose_vec2mat
        from tcsfm.geom.warp import _project_with_mask

        args = self._warp_inputs(rz=0.6)    # strong roll → big in-group spread
        img, depth, ref_depth, pose, K = args
        h, w = img.shape[1:3]
        cam = backproject(depth, K)
        coords, _, _ = _project_with_mask(cam, K, pose_vec2mat(-pose), h, w)
        bv, _ = band_geometry(h, w, 16)
        assert not bool(jnp.all(vertical_band_ok(coords, h, bv))), \
            "fixture must actually violate the band"

        guarded = inverse_warp2_mxu(img, depth, ref_depth, -pose, K, band=16,
                                    guard="fallback", interpret=True)
        xla = inverse_warp2(img, depth, ref_depth, -pose, K)
        for g, r in zip(guarded, xla):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-5)

    def test_mask_guard_invalidates_uncovered_pixels(self):
        """guard=True (mask mode): the kernel runs unconditionally; pixels
        whose taps the band covers match the XLA path exactly, every
        other pixel is flagged INVALID — so no valid pixel ever carries a
        silently-zero sample (VERDICT r1 weak #1, at MXU speed)."""
        from tcsfm.geom.warp import inverse_warp2, inverse_warp2_mxu

        img, depth, ref_depth, pose, K = self._warp_inputs(rz=0.6)
        wi_m, vm_m, pd_m, cd_m = inverse_warp2_mxu(
            img, depth, ref_depth, -pose, K, band=16, guard=True,
            interpret=True)
        wi_x, vm_x, pd_x, cd_x = inverse_warp2(img, depth, ref_depth,
                                               -pose, K)
        vm_m = np.asarray(vm_m)
        vm_x = np.asarray(vm_x)
        # the violating fixture must actually lose some pixels...
        assert vm_m.sum() < vm_x.sum()
        # ...but keep a meaningful share
        assert vm_m.sum() > 0.2 * vm_x.sum()
        # masked-valid pixels are exact vs the XLA sampler
        np.testing.assert_allclose(np.asarray(wi_m) * vm_m,
                                   np.asarray(wi_x) * vm_m, atol=1e-5)
        np.testing.assert_allclose(np.asarray(pd_m) * vm_m,
                                   np.asarray(pd_x) * vm_m, atol=1e-5)
        # computed depth doesn't pass through the sampler
        np.testing.assert_allclose(np.asarray(cd_m), np.asarray(cd_x),
                                   atol=1e-6)

    def test_sample_depth_false_matches_image_path(self):
        """sample_depth=False (pure-pose inference): identical warped image
        + valid mask, projected_depth is None, computed depth unchanged."""
        from tcsfm.geom.warp import inverse_warp2_mxu

        img, depth, ref_depth, pose, K = self._warp_inputs(rz=0.0)
        full = inverse_warp2_mxu(img, depth, ref_depth, -pose, K, band=16,
                                 interpret=True)
        lite = inverse_warp2_mxu(img, depth, ref_depth, -pose, K, band=16,
                                 sample_depth=False, interpret=True)
        np.testing.assert_allclose(np.asarray(lite[0]), np.asarray(full[0]),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(lite[1]), np.asarray(full[1]),
                                   atol=0)
        assert lite[2] is None
        np.testing.assert_allclose(np.asarray(lite[3]), np.asarray(full[3]),
                                   atol=0)
        # "mixed" degrades to the single-pass sampler without the depth
        # channel — still identical image/mask up to bf16 rounding
        mixed = inverse_warp2_mxu(img, depth, ref_depth, -pose, K, band=16,
                                  exact="mixed", sample_depth=False,
                                  interpret=True)
        np.testing.assert_allclose(np.asarray(mixed[0]), np.asarray(full[0]),
                                   atol=6e-3)

    def test_guard_pass_through_on_smooth_warp(self):
        """Small warp: guard stays on the MXU path (parity with unguarded)."""
        from tcsfm.geom.warp import inverse_warp2_mxu

        args = self._warp_inputs(rz=0.005)
        img, depth, ref_depth, pose, K = args
        guarded = inverse_warp2_mxu(img, depth, ref_depth, -pose, K, band=32,
                                    guard=True, interpret=True)
        raw = inverse_warp2_mxu(img, depth, ref_depth, -pose, K, band=32,
                                guard=False, interpret=True)
        for g, r in zip(guarded, raw):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-6)

    def test_mask_guard_grads_flow(self):
        """Mask mode: pose gradients through the masked objective are
        finite and nonzero (in-band pixels still drive the warp)."""
        from tcsfm.geom.warp import inverse_warp2_mxu

        img, depth, ref_depth, pose, K = self._warp_inputs(rz=0.6)

        def loss(p):
            wi, vm, pd, cd = inverse_warp2_mxu(img, depth, ref_depth, -p, K,
                                               band=16, guard=True,
                                               interpret=True)
            return jnp.sum(wi * vm)

        g = jax.grad(loss)(pose)
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.abs(np.asarray(g)).max() > 0

    def test_fallback_guard_grads_flow(self):
        """Gradients flow through the cond fallback branch."""
        from tcsfm.geom.warp import inverse_warp2, inverse_warp2_mxu

        img, depth, ref_depth, pose, K = self._warp_inputs(rz=0.6)

        def loss_mxu(p):
            wi, vm, pd, cd = inverse_warp2_mxu(img, depth, ref_depth, -p, K,
                                               band=16, guard="fallback",
                                               interpret=True)
            return jnp.sum(wi * vm)

        def loss_xla(p):
            wi, vm, pd, cd = inverse_warp2(img, depth, ref_depth, -p, K)
            return jnp.sum(wi * vm)

        g_mxu = jax.grad(loss_mxu)(pose)
        g_xla = jax.grad(loss_xla)(pose)
        np.testing.assert_allclose(np.asarray(g_mxu), np.asarray(g_xla),
                                   rtol=1e-4, atol=1e-6)


class TestUint8Mode:
    """Single-pass integer-exact sampling for uint8-sourced frames:
    the block stores round(255*S) (exact in bf16), the read-out divides
    by 255 — f32-exact at half the hi/lo split's matmul rows
    (measured 2.4e-7 vs 3.7e-6 max err, 3.05 vs 5.37 ms per warp batch
    on chip)."""

    def _u8_img(self, seed=0, c=C):
        k = np.random.RandomState(seed).randint(0, 256, (B, H, W, c))
        return jnp.asarray(k.astype(np.float32) / 255.0)

    def _coords(self, seed=1):
        rng = np.random.RandomState(seed)
        coords = _identity_coords()
        return jnp.asarray(coords + (0.03 * rng.randn(B, H, W, 2)
                                     * [1.0, 0.3]).astype(np.float32))

    def test_all_channels_uint8_exact(self):
        img = self._u8_img(3)
        coords = self._coords(4)
        out = grid_sample_mxu(img, coords, band=16, interpret=True,
                              exact="uint8")
        ref = grid_sample(img, coords)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-6)

    def test_rgb_uint8_depth_hilo(self):
        """The inference packing: RGB via the 255x path, the float source
        depth via the hi/lo split — both f32-exact."""
        rgb = self._u8_img(5, c=3)
        depth = jnp.asarray(
            0.1 + np.random.RandomState(6).rand(B, H, W, 1)
            .astype(np.float32))
        img = jnp.concatenate([rgb, depth], axis=-1)
        coords = self._coords(7)
        out = grid_sample_mxu(img, coords, band=16, interpret=True,
                              exact=(3,), u8=(0, 1, 2))
        ref = grid_sample(img, coords)
        # u8 channels: tighter than the hi/lo split's own error level
        np.testing.assert_allclose(np.asarray(out)[..., :3],
                                   np.asarray(ref)[..., :3], atol=2e-6)
        # hi/lo depth channel: the split's documented ~4e-6 max error
        np.testing.assert_allclose(np.asarray(out)[..., 3],
                                   np.asarray(ref)[..., 3], atol=1e-5)

    def test_uint8_mode_via_inverse_warp(self):
        """exact='uint8' through inverse_warp2_mxu matches the XLA
        inverse_warp2 on uint8-sourced images."""
        from tcsfm.geom.warp import inverse_warp2, inverse_warp2_mxu

        rng = np.random.RandomState(8)
        img = self._u8_img(8, c=3)
        depth = jnp.asarray(
            (0.5 + rng.rand(B, H, W, 1)).astype(np.float32))
        ref_depth = jnp.asarray(
            (0.5 + rng.rand(B, H, W, 1)).astype(np.float32))
        pose = jnp.asarray(0.01 * rng.randn(B, 6).astype(np.float32))
        K = jnp.asarray(np.broadcast_to(
            np.array([[0.6 * W, 0, W / 2], [0, 0.6 * W, H / 2.5],
                      [0, 0, 1]], np.float32), (B, 3, 3)).copy())
        w_ref = inverse_warp2(img, depth, ref_depth, pose, K)
        w_u8 = inverse_warp2_mxu(img, depth, ref_depth, pose, K,
                                 exact="uint8", interpret=True)
        # warped image exact; valid mask may differ only where the band
        # guard masks extra pixels (checked subset)
        mask = np.asarray(w_u8[1])[..., 0] > 0
        np.testing.assert_allclose(np.asarray(w_u8[0])[mask],
                                   np.asarray(w_ref[0])[mask], atol=2e-6)
        np.testing.assert_allclose(np.asarray(w_u8[2])[mask],
                                   np.asarray(w_ref[2])[mask], atol=1e-5)

    def test_uint8_sourced_property(self):
        from tcsfm.data.dataset import SequenceData
        from tcsfm.data.synthetic import make_synthetic_sequence

        syn = make_synthetic_sequence(4, (16, 32), seed=0)
        assert not syn.uint8_sourced          # float-valued scene
        filebacked = SequenceData(
            name="f", intrinsics=syn.intrinsics, gt_poses=syn.gt_poses,
            vo_poses=syn.vo_poses, timestamps=syn.timestamps,
            image_files=np.array(["a.jpg"] * 4))
        assert filebacked.uint8_sourced
