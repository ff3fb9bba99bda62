"""Full-pipeline integration at REAL shapes (VERDICT r2 #5).

preprocess → train 1 epoch → evaluate_vo → golden_eval BASELINE table, at
the paper's med resolution (192x640) on a generated fake KITTI-odometry
tree — so the first real-data run cannot die on a shape/protocol seam the
low-res synthetic tests never exercised (intrinsics rescale, jpg I/O,
med-res jit shapes, checkpoint round-trip, the anchored-table path).

Slow (~10 min on CPU: med-res fwd+bwd compiles) — gated behind
``TCSFM_SLOW=1``; the verify skill runs it as one command:

    TCSFM_SLOW=1 python -m pytest tests/test_full_pipeline.py -x -q
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

SLOW = os.environ.get("TCSFM_SLOW", "") == "1"

N_FRAMES = 8
SRC_H, SRC_W = 370, 1226          # real KITTI image size


@pytest.fixture(scope="module")
def fake_kitti_fullres(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_fullres")
    seq_dir = root / "sequences" / "00"
    rng = np.random.RandomState(0)
    # smooth low-frequency texture + per-frame horizontal roll: gives the
    # photometric loss real gradients instead of unwarpable white noise
    ys, xs = np.meshgrid(np.arange(SRC_H), np.arange(SRC_W), indexing="ij")
    base = np.stack([
        0.5 + 0.4 * np.sin(2 * np.pi * (3 * xs / SRC_W + 2 * ys / SRC_H
                                        + 0.3 * c))
        for c in range(3)
    ], axis=-1)
    for cam in ("image_2", "image_3"):
        d = seq_dir / cam
        d.mkdir(parents=True)
        for i in range(N_FRAMES):
            arr = np.roll(base, 12 * i, axis=1)
            arr = (np.clip(arr + 0.02 * rng.rand(SRC_H, SRC_W, 3), 0, 1)
                   * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i:06d}.png")

    fx = fy = 718.0
    P2 = f"P2: {fx} 0 {SRC_W / 2} 0  0 {fy} {SRC_H / 2} 0  0 0 1 0\n"
    P3 = f"P3: {fx} 0 {SRC_W / 2} -386.0  0 {fy} {SRC_H / 2} 0  0 0 1 0\n"
    (seq_dir / "calib.txt").write_text(P2 + P3)
    (seq_dir / "times.txt").write_text(
        "".join(f"{0.1 * i:.6f}\n" for i in range(N_FRAMES)))
    poses_dir = root / "poses"
    poses_dir.mkdir()
    lines = []
    for i in range(N_FRAMES):
        T = np.eye(4)
        T[2, 3] = 0.8 * i
        lines.append(" ".join(f"{v:.6f}" for v in T[:3].reshape(-1)))
    (poses_dir / "00.txt").write_text("\n".join(lines) + "\n")
    return str(root)


@pytest.mark.skipif(not SLOW, reason="med-res pipeline (~10 min CPU); "
                                     "set TCSFM_SLOW=1")
class TestFullPipelineMedRes:
    def test_preprocess_train_eval_golden(self, fake_kitti_fullres,
                                          tmp_path):
        from tcsfm.cli.evaluate_vo import main as vo_main
        from tcsfm.cli.golden_eval import main as golden_main
        from tcsfm.cli.train import main as train_main
        from tcsfm.data.preprocess import preprocess_odometry

        # 1. preprocess at med res (192x640) with intrinsics rescale
        pre = str(tmp_path / "pre")
        preprocess_odometry(fake_kitti_fullres, pre, resolution="med_res",
                            sequences=["00"])
        data_dir = os.path.join(pre, "med_res")
        from tcsfm.data.dataset import SequenceData
        seq = SequenceData.from_npz(
            os.path.join(data_dir, "00_02", "sequence_data.npz"))
        assert Image.open(seq.image_files[0]).size == (640, 192)
        assert np.allclose(seq.intrinsics[0, 0, 0], 718.0 * 640 / SRC_W)

        # 2. train ONE epoch at med res through the real-data CLI path
        results = str(tmp_path / "results")
        train_main([
            "--data_dir", data_dir, "--train_seq", "00_02",
            "--val_seq", "00_03", "--test_seq", "00_02",
            "--img_resolution", "med", "--num_epochs", "1",
            "--minibatch", "2", "--iterations", "2",
            "--compute_dtype", "float32", "--lr", "5e-5",
            "--results_dir", results, "--date", "fp",
        ])
        model_dir = os.path.join(results, "fp")
        assert os.path.exists(os.path.join(model_dir, "config.json"))
        assert os.path.exists(os.path.join(model_dir, "checkpoint.msgpack"))

        # 3. VO evaluation over the preprocessed sequence
        vo_out = vo_main(["--model_dir", model_dir, "--data_dir", data_dir,
                          "--seqs", "00_02", "--batch", "2",
                          "--no_mxu_warp"])
        errs = vo_out["00_02"]["errors_unscaled"]
        assert np.isfinite(errs[0]) and np.isfinite(errs[1])

        # 4. golden_eval BASELINE table on the same dir (00_02 has no
        # published anchor -> rows carry status 'no-anchor'; the point is
        # the anchored-table code path runs at med res end-to-end)
        g = golden_main(["--model_dir", model_dir, "--data_dir", data_dir,
                         "--seqs", "00_02", "--batch", "2"])
        rows = {r["metric"]: r for r in g["seqs"]["00_02"]["rows"]}
        assert set(rows) == {"t_err", "r_err", "t_ate", "r_ate"}
        # ATEs are finite; segment errors (t_err/r_err) are NaN by
        # protocol on trajectories shorter than the 100m segment length
        # (validate.py:80-97 faithful behavior) — the fake tree covers
        # 5.6m
        assert np.isfinite(rows["t_ate"]["ours"])
        assert np.isfinite(rows["r_ate"]["ours"])

        # 5. file-backed BA refiners at real shapes (round-4 verdict #6):
        # the r3 advisor crash site was exactly this path — refiner fusion
        # over from_npz sequences whose images live on disk (images=None,
        # frames via seq.load_image, pixel counts from batch shapes)
        from tcsfm.cli.run_sequential_pft import main as pft_main
        for refiner, extra in (("ba", []), ("chain", ["--chain_block", "6",
                                                      "--pyramid_levels",
                                                      "2"])):
            r = pft_main(["--model_dir", model_dir, "--data_dir", data_dir,
                          "--seqs", "00_02", "--refiner", refiner,
                          "--epochs", "4", "--window_batch", "2"] + extra)
            ate_opt = r["00_02"]["errors_optimized"][0]
            assert np.isfinite(ate_opt), (refiner, r)

        print(json.dumps({"pipeline": "ok", "vo_t_ate": float(errs[0])}))
