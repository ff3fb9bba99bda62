"""Data pipeline tests: windows, transforms, dataset, loader, synthetic."""

import numpy as np
import pytest

from tcsfm.data.windows import build_windows, sliding_windows, target_source_split
from tcsfm.data import transforms as TR
from tcsfm.data.dataset import SequenceData, SfMWindowDataset, relative_lie_alg
from tcsfm.data.loader import BatchLoader, collate_windows
from tcsfm.data.synthetic import make_synthetic_sequence
from tcsfm.eval.trajectory import np_se3_exp


class TestWindows:
    def test_sliding(self):
        w = sliding_windows(5, 3)
        np.testing.assert_array_equal(w, [[0, 1, 2], [1, 2, 3], [2, 3, 4]])

    def test_correction_rate(self):
        # frames {0,2,4,6}: windows {0,2,4},{2,4,6} (kitti_loader_stereo.py:239-245)
        w = build_windows(8, 3, correction_rate=2)
        np.testing.assert_array_equal(w, [[0, 2, 4], [2, 4, 6]])

    def test_skip(self):
        w = build_windows(6, 2, skip=2)
        np.testing.assert_array_equal(w, [[0, 1], [2, 3], [4, 5]])

    def test_augment_motion(self):
        w = build_windows(6, 3, augment_motion=True)
        # normal windows (4) + skip-2 windows over frames {0,2,4}
        assert len(w) == 4 + 1
        np.testing.assert_array_equal(w[-1], [0, 2, 4])

    def test_target_middle(self):
        t, s = target_source_split(3)
        assert t == 1 and s == [0, 2]
        t2, s2 = target_source_split(2)
        assert t2 == 1 and s2 == [0]


class TestTransforms:
    def test_flip_fixup(self):
        img = np.random.RandomState(0).rand(8, 10, 3).astype(np.float32)
        K = np.array([[5.0, 0, 3.0], [0, 5.0, 4.0], [0, 0, 1]], np.float32)
        lie = np.zeros((2, 2, 6), np.float32)
        lie[..., 4] = 0.3
        lie[..., 5] = -0.2
        lie[..., 1] = 0.7  # ty untouched
        out, K2, la = TR.apply_flip([img], K, lie)
        np.testing.assert_allclose(out[0], img[:, ::-1])
        assert K2[0, 2] == 10 - 3.0
        np.testing.assert_allclose(la[..., 4], -0.3)
        np.testing.assert_allclose(la[..., 5], 0.2)
        np.testing.assert_allclose(la[..., 1], 0.7)

    def test_jitter_only_on_aug_stream(self):
        rng = np.random.RandomState(3)
        tf = TR.WindowTransform(jitter=True, flip_prob=None)
        img = np.random.RandomState(1).rand(8, 10, 3).astype(np.float32)
        (o, _, _), (a, _, _) = tf([img, img], np.eye(3, dtype=np.float32),
                                  np.zeros((1, 2, 6)), rng)
        np.testing.assert_allclose(o[0], img)  # clean stream untouched

    def test_jitter_matches_torch(self):
        torch = pytest.importorskip("torch")
        try:
            import torchvision.transforms.functional as F  # noqa
            have_tv = True
        except ImportError:
            have_tv = False
        if not have_tv:
            pytest.skip("torchvision unavailable")

    def test_hue_roundtrip(self):
        img = np.random.RandomState(2).rand(6, 6, 3).astype(np.float32)
        out = TR.adjust_hue(TR.adjust_hue(img, 0.25), -0.25)
        np.testing.assert_allclose(out, img, atol=1e-4)


class TestDataset:
    def _seq(self, n=8):
        return make_synthetic_sequence(n_frames=n, image_size=(32, 48), seed=1)

    def test_relative_lie_alg_roundtrip(self):
        xi = np.array([0.1, -0.05, 0.3, 0.01, 0.02, -0.01])
        T_t = np.eye(4)
        T_s = T_t @ np_se3_exp(xi)
        # log(T_t^-1 T_s) = xi
        np.testing.assert_allclose(relative_lie_alg(T_t, T_s), xi, atol=1e-5)

    def test_window_dataset_shapes(self):
        ds = SfMWindowDataset([self._seq()], seq_len=3)
        assert len(ds) == 6
        s = ds[0]
        assert s["target_img"].shape == (32, 48, 3)
        assert s["source_imgs"].shape == (2, 32, 48, 3)
        assert s["gt_lie_alg"].shape == (2, 6)
        assert s["intrinsics"].shape == (3, 3)

    def test_gt_lie_alg_consistency(self):
        """Window GT must match the generating motion: the synthetic camera
        moves with constant xi per frame."""
        seq = self._seq()
        ds = SfMWindowDataset([seq], seq_len=3)
        s = ds[0]
        # source 0 is the frame BEFORE the target: pose change source→target
        xi_fwd = s["gt_lie_alg"][1]  # frame after
        xi_back = s["gt_lie_alg"][0]
        # symmetric motion: xi_fwd ≈ -xi_back for constant velocity
        np.testing.assert_allclose(xi_fwd[:3], -xi_back[:3], atol=1e-3)

    def test_npz_roundtrip(self, tmp_path):
        seq = self._seq(4)
        p = str(tmp_path / "seq.npz")
        seq.save_npz(p)
        seq2 = SequenceData.from_npz(p)
        np.testing.assert_allclose(seq2.gt_poses, seq.gt_poses)
        np.testing.assert_allclose(seq2.images, seq.images)
        assert len(seq2) == 4
        # an in-memory FLOAT sequence is not uint8-exact: the eval CLIs
        # gate the uint8 sampler mode on this property (advisor r3 low —
        # the gate must not quantize genuinely float-valued frames)
        assert not seq2.uint8_sourced

    def test_uint8_in_memory_images_normalized(self):
        """uint8-stored in-memory arrays are uint8_sourced and load_image
        normalizes them to [0,1] float32 like the file-decode path."""
        import dataclasses

        seq = self._seq(4)
        u8 = dataclasses.replace(
            seq, images=(np.asarray(seq.images) * 255).astype(np.uint8))
        assert u8.uint8_sourced
        im = u8.load_image(0)
        assert im.dtype == np.float32
        assert 0.0 <= im.min() and im.max() <= 1.0
        np.testing.assert_allclose(im, seq.images[0], atol=1 / 255.0)


class TestLoader:
    def test_collate_layout(self):
        ds = SfMWindowDataset([make_synthetic_sequence(8, (32, 48))], seq_len=3)
        batch = collate_windows([ds[0], ds[1]])
        assert batch["target_img"].shape == (2, 32, 48, 3)
        assert batch["source_imgs"].shape == (2, 2, 32, 48, 3)  # [S, B, ...]
        assert batch["gt_lie_alg"].shape == (2, 2, 6)

    def test_loader_drop_last(self):
        ds = SfMWindowDataset([make_synthetic_sequence(9, (32, 48))], seq_len=3)
        dl = BatchLoader(ds, batch_size=4, shuffle=False, drop_last=True)
        batches = list(dl)
        assert len(batches) == len(ds) // 4
        for b in batches:
            assert b["target_img"].shape[0] == 4

    def test_loader_pad_tail(self):
        ds = SfMWindowDataset([make_synthetic_sequence(9, (32, 48))], seq_len=3)
        dl = BatchLoader(ds, batch_size=4, shuffle=False, pad_tail=True)
        batches = list(dl)
        total_valid = sum(b["_valid"].sum() for b in batches)
        assert total_valid == len(ds)
        for b in batches:
            assert b["target_img"].shape[0] == 4

    def test_threaded_decode_determinism(self):
        """Thread-pool sample loading must be bitwise-identical to serial —
        augmentation streams are per-sample-seeded, not fetch-ordered."""
        from tcsfm.data.transforms import WindowTransform

        ds = SfMWindowDataset([make_synthetic_sequence(12, (32, 48))],
                              seq_len=3,
                              transform=WindowTransform(jitter=True,
                                                        flip_prob=0.5))
        a = list(BatchLoader(ds, 3, shuffle=True, seed=5, decode_threads=0))
        b = list(BatchLoader(ds, 3, shuffle=True, seed=5, decode_threads=8))
        assert len(a) == len(b)
        for x, y in zip(a, b):
            for k in x:
                assert np.array_equal(x[k], y[k]), k

    def test_reseed_changes_augmentation(self):
        """Per-epoch reseed must change the augmentation draws (the
        reference reseeds per epoch, run_mono_training.py:168)."""
        from tcsfm.data.transforms import WindowTransform

        ds = SfMWindowDataset([make_synthetic_sequence(12, (32, 48))],
                              seq_len=3,
                              transform=WindowTransform(jitter=True,
                                                        flip_prob=0.5))
        s0 = ds[0]["target_img_aug"]
        ds.reseed(1)
        s1 = ds[0]["target_img_aug"]
        assert not np.array_equal(s0, s1)

    def test_prefetch_equivalence(self):
        ds = SfMWindowDataset([make_synthetic_sequence(9, (32, 48))], seq_len=3)
        a = list(BatchLoader(ds, 2, shuffle=False, prefetch=0))
        b = list(BatchLoader(ds, 2, shuffle=False, prefetch=2))
        assert len(a) == len(b)
        np.testing.assert_allclose(a[0]["target_img"], b[0]["target_img"])

    def test_pool_growth_keeps_live_loaders_working(self):
        """A narrow-threaded loader must survive a later, wider-threaded
        loader replacing the shared decode pool (advisor r3 medium: the
        old pool was shut down while a live loader still held it, raising
        'cannot schedule new futures' on its next batch)."""
        ds = SfMWindowDataset([make_synthetic_sequence(12, (32, 48))],
                              seq_len=3)
        narrow = BatchLoader(ds, 2, shuffle=False, prefetch=0,
                             decode_threads=2)
        it = iter(narrow)
        first = next(it)
        # a wider pool request replaces the shared executor
        wide = BatchLoader(ds, 2, shuffle=False, prefetch=0,
                           decode_threads=16)
        list(wide)
        # the live narrow loader must keep batching (previously raised)
        rest = list(it)
        assert len(rest) == len(narrow) - 1
        np.testing.assert_allclose(first["target_img"].shape, (2, 32, 48, 3))

    def test_decode_pool_growth_does_not_kill_old_pool(self):
        """Growing the shared pool must leave the replaced executor usable
        for anyone still holding it (it is dropped, not shut down)."""
        from tcsfm.data.common import decode_pool

        old = decode_pool(2)
        new = decode_pool(old._max_workers + 2)
        assert new is not old
        assert old.submit(lambda: 41 + 1).result() == 42
        assert decode_pool(1) is new   # smaller request reuses current


class TestSynthetic:
    def test_photometric_consistency(self):
        """Warping a source frame with GT depth+pose must reconstruct the
        target — the property the whole framework optimizes."""
        import jax.numpy as jnp

        from tcsfm.geom.warp import inverse_warp2
        from tcsfm.data.dataset import relative_lie_alg

        seq = make_synthetic_sequence(4, (64, 96), seed=3)
        t, s = 1, 2
        xi = relative_lie_alg(seq.gt_poses[t], seq.gt_poses[s])

        img_src = jnp.asarray(seq.images[s][None])
        depth_t = jnp.asarray(seq.depths[t][None, ..., None])
        depth_s = jnp.asarray(seq.depths[s][None, ..., None])
        K = jnp.asarray(seq.intrinsics[t][None])
        # solver convention: warp with -pose where pose ≈ xi
        warped, valid, _, _ = inverse_warp2(
            img_src, depth_t, depth_s, jnp.asarray(-xi[None]), K
        )
        w = np.asarray(warped[0])
        v = np.asarray(valid[0, ..., 0]) > 0
        tgt = seq.images[t]
        err = np.abs(w - tgt)[v].mean()
        assert err < 0.03, f"photometric error {err}"

    def test_drive_sequence_consistent_everywhere(self):
        """`make_drive_sequence` (world-anchored texture) must stay
        photometrically consistent at ANY point along the trajectory —
        the property that makes KITTI-09-scale flagship sequences valid,
        where the frame-0-texture generator degenerates after ~0.5 scene
        units of travel."""
        import jax.numpy as jnp

        from tcsfm.data.synthetic import make_drive_sequence
        from tcsfm.geom.warp import inverse_warp2
        from tcsfm.data.dataset import relative_lie_alg

        seq = make_drive_sequence(120, (64, 96), seed=3)
        assert len(seq.gt_poses) == 120
        # travel distance far beyond the old generator's valid range
        assert np.linalg.norm(seq.gt_poses[-1][:3, 3]) > 1.0
        for t in (1, 60, 117):
            s = t + 1
            xi = relative_lie_alg(seq.gt_poses[t], seq.gt_poses[s])
            warped, valid, _, _ = inverse_warp2(
                jnp.asarray(seq.images[s][None]),
                jnp.asarray(seq.depths[t][None, ..., None]),
                jnp.asarray(seq.depths[s][None, ..., None]),
                jnp.asarray(-xi[None]), jnp.asarray(seq.intrinsics[t][None]))
            v = np.asarray(valid[0, ..., 0]) > 0
            err = np.abs(np.asarray(warped[0]) - seq.images[t])[v].mean()
            assert err < 0.03, f"pair {t}->{s}: photometric error {err}"
        # world texture: the same GT pose delta holds between first and
        # last pair (sinusoidal yaw — poses are exact by construction)
        assert np.isfinite(seq.images).all()


class TestSequenceSources:
    """Lazy CLI sequence resolution + the header-only uint8 probe."""

    def test_probe_matches_loaded_property(self, tmp_path):
        from tcsfm.data.dataset import (SequenceData, sequence_sources,
                                        sequences_uint8_sourced)

        n, h, w = 4, 16, 24
        rng = np.random.RandomState(0)
        base = dict(
            intrinsics=np.tile(np.eye(3, dtype=np.float32), (n, 1, 1)),
            gt_poses=np.tile(np.eye(4), (n, 1, 1)),
            vo_poses=np.tile(np.eye(4), (n, 1, 1)),
            timestamps=np.arange(n, dtype=np.float64),
        )
        cases = {
            "u8mem": SequenceData(
                name="u8mem",
                images=rng.randint(0, 255, (n, h, w, 3)).astype(np.uint8),
                **base),
            "floatmem": SequenceData(
                name="floatmem",
                images=rng.rand(n, h, w, 3).astype(np.float32), **base),
            "filebacked": SequenceData(
                name="filebacked",
                image_files=np.asarray([f"/nonexistent/{i}.jpg"
                                        for i in range(n)]), **base),
        }
        for name, seq in cases.items():
            d = tmp_path / name
            d.mkdir()
            seq.save_npz(str(d / "sequence_data.npz"))
            probed = SequenceData.probe_uint8_sourced(str(d), name)
            assert probed == seq.uint8_sourced, name
        # lazy loaders round-trip and the all-seqs gate composes per-seq
        src = sequence_sources(str(tmp_path), list(cases))
        for name, load in src.items():
            got = load()
            assert got.uint8_sourced == cases[name].uint8_sourced
        assert not sequences_uint8_sourced(str(tmp_path), list(cases))
        assert sequences_uint8_sourced(str(tmp_path),
                                       ["u8mem", "filebacked"])
