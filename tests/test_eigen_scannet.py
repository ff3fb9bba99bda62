"""Eigen / ScanNet dataset loaders on synthetic fixtures."""

import os

import numpy as np
import pytest

from tcsfm.data.scannet import ScanNetTestDataset
from tcsfm.data.synthetic import make_synthetic_sequence


class TestScanNetDataset:
    def test_windows_and_gt(self):
        seq = make_synthetic_sequence(20, (32, 48), seed=7)
        ds = ScanNetTestDataset([seq], frame_gap=4)
        assert len(ds) == 20 - 2 * 4
        s = ds[0]
        assert s["target_img"].shape == (32, 48, 3)
        assert s["source_imgs"].shape == (2, 32, 48, 3)
        assert s["gt_depth"].shape == (32, 48)
        assert s["gt_pose_mats"].shape == (2, 4, 4)
        # relative gt pose mats consistent with the lie targets
        from tcsfm.eval.trajectory import np_se3_log

        xi_from_mat = np_se3_log(np.asarray(s["gt_pose_mats"][0], np.float64))
        np.testing.assert_allclose(xi_from_mat, s["gt_lie_alg"][0], atol=1e-4)


class TestEigenDataset:
    def _write_index(self, tmp_path, n=6):
        """Synthesize an eigen_info npz + image files from a synthetic seq."""
        from PIL import Image

        seq = make_synthetic_sequence(n, (32, 48), seed=8)
        files = []
        for i in range(n):
            p = str(tmp_path / f"{i:010d}.jpg")
            Image.fromarray(
                (seq.images[i] * 255).astype(np.uint8)).save(p)
            files.append(p)
        np.savez(
            tmp_path / "eigen_info_test.npz",
            files=np.asarray(files),
            K=seq.intrinsics[:n],
            poses=seq.gt_poses[:n],
            folders=np.asarray(["drive0"] * n),
            idxs=np.arange(n),
        )
        return seq

    def test_loads_with_neighbours(self, tmp_path):
        from tcsfm.data.eigen import EigenDataset

        seq = self._write_index(tmp_path)
        ds = EigenDataset(str(tmp_path), mode="test")
        assert len(ds) == 6
        s = ds[2]
        assert s["target_img"].shape == (32, 48, 3)
        assert s["source_imgs"].shape == (2, 32, 48, 3)
        # neighbour selection: sample 0 has no previous frame → boundary
        s0 = ds[0]
        assert np.isfinite(s0["gt_lie_alg"]).all()

    def test_gt_matches_sequence(self, tmp_path):
        from tcsfm.data.dataset import relative_lie_alg
        from tcsfm.data.eigen import EigenDataset

        seq = self._write_index(tmp_path)
        ds = EigenDataset(str(tmp_path), mode="test")
        s = ds[2]
        expected = relative_lie_alg(seq.gt_poses[2], seq.gt_poses[1])
        np.testing.assert_allclose(s["gt_lie_alg"][0], expected, atol=1e-6)
