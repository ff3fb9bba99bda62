"""Config serialization and multi-scale end-to-end coverage."""

import jax
import jax.numpy as jnp
import numpy as np

from tcsfm.config import Config, PFTOptions


class TestConfig:
    def test_json_roundtrip(self, tmp_path):
        cfg = Config(iterations=4, train_seq=("00_02", "02_02"),
                     lr=3e-4, use_mxu_warp=True, num_scales=2)
        p = str(tmp_path / "config.json")
        cfg.save(p)
        cfg2 = Config.load(p)
        assert cfg2 == cfg

    def test_ignores_unknown_keys(self):
        cfg = Config.from_json('{"iterations": 7, "bogus_key": 1}')
        assert cfg.iterations == 7

    def test_derived_properties(self):
        cfg = Config(img_resolution="med", img_per_sample=3,
                     flow_type="classical")
        assert cfg.image_size == (192, 640)
        assert cfg.num_source_imgs == 2
        assert cfg.pose_input_channels == 8

    def test_pft_options_replace(self):
        o = PFTOptions(epochs=5).replace(lr=1e-3)
        assert o.epochs == 5 and o.lr == 1e-3


class TestMultiScaleTraining:
    def test_train_step_num_scales_3(self):
        """Exercise the multi-scale loss path end-to-end (paper uses 1)."""
        from tcsfm.train.trainer import create_train_state, make_train_step

        H, W, B, S = 32, 64, 2, 2
        cfg = Config(iterations=2, num_scales=3, minibatch=B,
                     compute_dtype="float32")
        state, dm, pm = create_train_state(cfg, jax.random.PRNGKey(0),
                                           steps_per_epoch=5)
        step = make_train_step(cfg, dm, pm)
        rng = np.random.RandomState(0)
        K = np.broadcast_to(
            np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]],
                     np.float32), (B, 3, 3)).copy()
        batch = {
            "target_img": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)),
            "target_img_aug": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)),
            "source_imgs": jnp.asarray(rng.rand(S, B, H, W, 3).astype(np.float32)),
            "source_imgs_aug": jnp.asarray(rng.rand(S, B, H, W, 3).astype(np.float32)),
            "intrinsics": jnp.asarray(K), "intrinsics_aug": jnp.asarray(K),
            "gt_lie_alg": jnp.zeros((S, B, 6)),
            "gt_lie_alg_aug": jnp.zeros((S, B, 6)),
            "vo_lie_alg": jnp.zeros((S, B, 6)),
            "vo_lie_alg_aug": jnp.zeros((S, B, 6)),
            "dt": jnp.full((S, B), 0.1),
        }
        new_state, losses = step(state, batch)
        assert np.isfinite(float(losses["total"]))
        assert float(losses["l_smooth"]) > 0
