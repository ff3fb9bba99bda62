"""End-to-end preprocessing test on a generated fake KITTI-odometry tree.

Exercises C17 (SURVEY.md §2: create_kitti_odometry_data.py equivalent)
dataset-free: build sequences/<s>/{image_2,image_3}, calib.txt,
times.txt, poses/<s>.txt → run preprocess_odometry → load the emitted
npz index → construct training windows from it.
"""

import os

import numpy as np
import pytest
from PIL import Image

from tcsfm.data import kitti_io
from tcsfm.data.dataset import SequenceData, SfMWindowDataset
from tcsfm.data.preprocess import preprocess_odometry, remove_static_frames
from tcsfm.data.transforms import WindowTransform

N_FRAMES = 8
SRC_H, SRC_W = 64, 208


@pytest.fixture(scope="module")
def fake_kitti(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_odom")
    seq_dir = root / "sequences" / "00"
    rng = np.random.RandomState(0)
    for cam in ("image_2", "image_3"):
        d = seq_dir / cam
        d.mkdir(parents=True)
        for i in range(N_FRAMES):
            arr = (rng.rand(SRC_H, SRC_W, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i:06d}.png")

    fx = fy = 100.0
    P2 = f"P2: {fx} 0 {SRC_W / 2} 0  0 {fy} {SRC_H / 2} 0  0 0 1 0\n"
    P3 = f"P3: {fx} 0 {SRC_W / 2} -38.0  0 {fy} {SRC_H / 2} 0  0 0 1 0\n"
    (seq_dir / "calib.txt").write_text(P2 + P3)
    (seq_dir / "times.txt").write_text(
        "".join(f"{0.1 * i:.6f}\n" for i in range(N_FRAMES)))

    poses_dir = root / "poses"
    poses_dir.mkdir()
    lines = []
    for i in range(N_FRAMES):
        T = np.eye(4)
        T[2, 3] = 0.8 * i          # forward motion along z
        lines.append(" ".join(f"{v:.6f}" for v in T[:3].reshape(-1)))
    (poses_dir / "00.txt").write_text("\n".join(lines) + "\n")
    return str(root)


class TestPreprocessOdometry:
    def test_full_pipeline(self, fake_kitti, tmp_path):
        out = str(tmp_path / "pre")
        preprocess_odometry(fake_kitti, out, resolution="low_res",
                            sequences=["00"], also_write_reference_pkl=True)

        for cam in ("02", "03"):
            seq_dir = os.path.join(out, "low_res", f"00_{cam}")
            npz = os.path.join(seq_dir, "sequence_data.npz")
            assert os.path.exists(npz)
            seq = SequenceData.from_npz(npz)
            assert len(seq) == N_FRAMES
            assert seq.intrinsics.shape == (N_FRAMES, 3, 3)
            # intrinsics rescaled by the resize zoom (low_res = 128x448)
            assert np.allclose(seq.intrinsics[0, 0, 0],
                               100.0 * 448 / SRC_W)
            assert np.allclose(seq.intrinsics[0, 1, 1],
                               100.0 * 128 / SRC_H)
            # resized jpgs written and loadable
            img = Image.open(seq.image_files[0])
            assert img.size == (448, 128)
            # GT poses preserved
            assert np.allclose(seq.gt_poses[3, 2, 3], 2.4, atol=1e-5)
            # reference-compat pickle
            assert os.path.exists(os.path.join(seq_dir,
                                               "sequence_data.pkl"))

        # windows build from the preprocessed sequence
        seq = SequenceData.from_npz(
            os.path.join(out, "low_res", "00_02", "sequence_data.npz"))
        ds = SfMWindowDataset(
            [seq], seq_len=3,
            transform=WindowTransform(jitter=False, flip_prob=None))
        assert len(ds) == N_FRAMES - 2
        s = ds[0]
        assert s["target_img"].shape == (128, 448, 3)
        assert s["source_imgs"].shape == (2, 128, 448, 3)
        assert np.isfinite(s["gt_lie_alg"]).all()

    def test_remove_static_frames(self, fake_kitti, tmp_path):
        out = str(tmp_path / "pre2")
        preprocess_odometry(fake_kitti, out, resolution="low_res",
                            sequences=["00"])
        seq = SequenceData.from_npz(
            os.path.join(out, "low_res", "00_02", "sequence_data.npz"))
        # forward motion 0.8 m/frame >> 0.15 threshold: nothing removed
        kept = remove_static_frames(seq)
        assert len(kept) == len(seq)
        # make every frame static: all removed but the first
        static = SequenceData(
            name=seq.name, intrinsics=seq.intrinsics,
            gt_poses=np.tile(np.eye(4), (len(seq), 1, 1)),
            vo_poses=np.tile(np.eye(4), (len(seq), 1, 1)),
            timestamps=seq.timestamps, image_files=seq.image_files)
        pruned = remove_static_frames(static)
        assert len(pruned) < len(static)


class TestKittiIO:
    def test_calib_parsing(self, fake_kitti):
        K = kitti_io.odometry_intrinsics(
            os.path.join(fake_kitti, "sequences", "00"))
        assert np.allclose(K["02"][0, 0], 100.0)
        assert np.allclose(K["03"][0, 2], SRC_W / 2)

    def test_pose_parsing(self, fake_kitti):
        gt = kitti_io.read_odometry_poses(
            os.path.join(fake_kitti, "poses", "00.txt"))
        assert gt.shape == (N_FRAMES, 4, 4)
        assert np.allclose(gt[:, 3], [0, 0, 0, 1])
        assert np.allclose(gt[5, 2, 3], 4.0)
