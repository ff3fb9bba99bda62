"""PFT tests: the optimization loop reduces the photometric loss on
synthetic windows, across optimization modes; averaging semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcsfm.config import Config, PFTOptions
from tcsfm.data.dataset import SfMWindowDataset
from tcsfm.data.loader import BatchLoader
from tcsfm.data.synthetic import make_synthetic_sequence
from tcsfm.data.transforms import WindowTransform
from tcsfm.models.depth import DepthNet
from tcsfm.models.pose import PoseNet
from tcsfm.solver.pft import PFTOptimizer, partition_params

H, W = 32, 64
B = 2


@pytest.fixture(scope="module")
def setup():
    cfg = Config(minibatch=B, iterations=2, num_scales=1,
                 compute_dtype="float32")
    depth_model = DepthNet(num_scales=1)
    pose_model = PoseNet()
    dvars = depth_model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    pvars = pose_model.init(jax.random.PRNGKey(1), jnp.zeros((1, H, W, 6)))

    seq = make_synthetic_sequence(8, (H, W), seed=2)
    ds = SfMWindowDataset([seq], seq_len=3,
                          transform=WindowTransform(jitter=False, flip_prob=None))
    batch = next(iter(BatchLoader(ds, B, shuffle=False)))
    batch.pop("_valid")
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    return cfg, depth_model, pose_model, dvars, pvars, jbatch


class TestPartition:
    def test_encoder_partition(self, setup):
        cfg, dm, pm, dvars, pvars, batch = setup
        trainable, rebuild = partition_params(
            "encoder", dvars["params"], pvars["params"])
        dp, pp, _, _ = rebuild(trainable)
        assert set(dp.keys()) == set(dvars["params"].keys())
        # frozen decoder leaves must be identical objects
        assert dp["upconv0"] is dvars["params"]["upconv0"]

    def test_all_modes_rebuild(self, setup):
        cfg, dm, pm, dvars, pvars, batch = setup
        skips = [jnp.zeros((1, 4, 4, 8))] * 5
        disp = jnp.zeros((1, 8, 16, 1))
        for mode in ("encoder", "all_depth", "decoder", "depth_pred",
                     "bottleneck", "pose"):
            trainable, rebuild = partition_params(
                mode, dvars["params"], pvars["params"], skips=skips,
                disparities=disp)
            dp, pp, sk, di = rebuild(trainable)
            assert set(dp.keys()) == set(dvars["params"].keys())


class TestPFTLoop:
    @pytest.mark.parametrize("mode", [
        pytest.param("encoder", marks=pytest.mark.full), "depth_pred",
        "pose"])
    def test_loss_decreases(self, setup, mode):
        cfg, dm, pm, dvars, pvars, batch = setup
        # pose-weight optimization needs a gentler lr (weight-standardized
        # convs amplify weight perturbations)
        lr = 1e-4 if mode == "pose" else 1e-3
        opts = PFTOptions(epochs=6, lr=lr, avg_final_epochs=2,
                          num_source_imgs=2, l_depth_init=False)
        opt = PFTOptimizer(cfg, opts, dm, pm, mode=mode)
        res = opt.optimize_window(batch, dvars["params"], pvars["params"],
                                  dvars["batch_stats"])
        losses = np.asarray(res.losses)
        assert np.all(np.isfinite(losses))
        if mode == "pose":
            # random-init pose weights have no descent guarantee in a few
            # steps; require the optimization to actually move the loss
            assert np.abs(np.diff(losses)).max() > 1e-5
        else:
            assert losses[-1] < losses[0], f"{mode}: {losses}"

    @pytest.mark.full
    def test_result_shapes(self, setup):
        cfg, dm, pm, dvars, pvars, batch = setup
        opts = PFTOptions(epochs=4, avg_final_epochs=2, num_source_imgs=2)
        opt = PFTOptimizer(cfg, opts, dm, pm, mode="encoder")
        res = opt.optimize_window(batch, dvars["params"], pvars["params"],
                                  dvars["batch_stats"])
        assert res.poses_opt.shape == (2, B, 6)
        assert res.poses_init.shape == (2, B, 6)
        assert res.disp_opt.shape == (B, H, W)
        assert res.losses.shape == (4,)

    def test_jit_compiles(self, setup):
        cfg, dm, pm, dvars, pvars, batch = setup
        opts = PFTOptions(epochs=3, avg_final_epochs=2, num_source_imgs=2)
        opt = PFTOptimizer(cfg, opts, dm, pm, mode="encoder")
        res = opt.optimize_window_jit(batch, dvars["params"], pvars["params"],
                                      dvars["batch_stats"])
        assert np.all(np.isfinite(np.asarray(res.losses)))

    @pytest.mark.skipif(
        not __import__("os").environ.get("TCSFM_SLOW_TESTS"),
        reason="~100s of scan compiles; set TCSFM_SLOW_TESTS=1 to run "
               "(DP equivalence is also covered by test_train)")
    def test_window_sharded_matches_single_device(self, setup):
        """PFT windows are independent → sharding the window batch over the
        mesh's data axis (the sequence-parallel axis, SURVEY.md §5.7) must
        reproduce single-device results."""
        import jax

        from tcsfm.dist.mesh import batch_sharding, make_mesh, replicated

        cfg, dm, pm, dvars, pvars, batch = setup
        # widen the batch to 4 so it splits over 4 devices
        wide = {}
        for k, v in batch.items():
            axis = 1 if k in ("source_imgs", "gt_lie_alg", "vo_lie_alg",
                              "source_imgs_aug", "gt_lie_alg_aug",
                              "vo_lie_alg_aug", "dt") else 0
            wide[k] = jnp.concatenate([v, v], axis=axis)

        opts = PFTOptions(epochs=3, avg_final_epochs=2, num_source_imgs=2)
        opt = PFTOptimizer(cfg, opts, dm, pm, mode="encoder")

        res1 = opt.optimize_window(wide, dvars["params"], pvars["params"],
                                   dvars["batch_stats"])

        mesh = make_mesh(4)
        sharded = {}
        for k, v in wide.items():
            axis = 1 if k in ("source_imgs", "gt_lie_alg", "vo_lie_alg",
                              "source_imgs_aug", "gt_lie_alg_aug",
                              "vo_lie_alg_aug", "dt") else 0
            sharded[k] = jax.device_put(v, batch_sharding(mesh, axis))
        params_r = jax.device_put(dvars["params"], replicated(mesh))
        pose_r = jax.device_put(pvars["params"], replicated(mesh))
        stats_r = jax.device_put(dvars["batch_stats"], replicated(mesh))
        res4 = opt.optimize_window(sharded, params_r, pose_r, stats_r)

        np.testing.assert_allclose(np.asarray(res1.poses_opt),
                                   np.asarray(res4.poses_opt), atol=1e-4)
        np.testing.assert_allclose(np.asarray(res1.losses),
                                   np.asarray(res4.losses), rtol=1e-4)


class TestSplitScan:
    @pytest.mark.full
    def test_split_scan_matches_history_variant_bitwise(self, setup):
        """The non-history optimizer skips the flip-merged disparity on
        early scan steps (it is consumed only for the final
        avg_final_epochs) — results must match the record_history variant
        that computes it every step (losses/disparity bitwise; the pose
        means to 1 ULP)."""
        cfg, depth_model, pose_model, dvars, pvars, jbatch = setup
        opts = PFTOptions(epochs=6, num_source_imgs=2, avg_final_epochs=3)
        kw = dict(mode="encoder")
        r_hist = PFTOptimizer(cfg, opts, depth_model, pose_model,
                              record_history=True, **kw).optimize_window_jit(
            jbatch, dvars["params"], pvars["params"],
            dvars.get("batch_stats", {}))
        r_split = PFTOptimizer(cfg, opts, depth_model, pose_model,
                               **kw).optimize_window_jit(
            jbatch, dvars["params"], pvars["params"],
            dvars.get("batch_stats", {}))
        # the final mean over the concatenated histories may associate
        # one ULP differently than over the single-scan stack (measured
        # 9e-10); everything upstream is identical
        np.testing.assert_allclose(np.asarray(r_hist.poses_opt),
                                   np.asarray(r_split.poses_opt), atol=1e-8)
        np.testing.assert_allclose(np.asarray(r_hist.poses_inv_opt),
                                   np.asarray(r_split.poses_inv_opt),
                                   atol=1e-8)
        np.testing.assert_array_equal(np.asarray(r_hist.disp_opt),
                                      np.asarray(r_split.disp_opt))
        np.testing.assert_array_equal(np.asarray(r_hist.losses),
                                      np.asarray(r_split.losses))
