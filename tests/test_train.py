"""Training loop tests: loss decreases on synthetic data, DP sharding,
freezing, checkpointing round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcsfm.config import Config
from tcsfm.data.dataset import SfMWindowDataset
from tcsfm.data.loader import BatchLoader
from tcsfm.data.synthetic import make_synthetic_sequence
from tcsfm.data.transforms import WindowTransform
from tcsfm.dist.mesh import make_mesh, shard_batch
from tcsfm.train.trainer import (
    Trainer, create_train_state, make_train_step, make_eval_step,
)
from tcsfm.train.checkpoint import load_checkpoint, save_checkpoint

H, W = 32, 64


def tiny_cfg(**kw):
    base = dict(
        img_resolution="low", minibatch=4, iterations=2, num_scales=1,
        lr=1e-4, compute_dtype="float32",
    )
    base.update(kw)
    cfg = Config(**base)
    # patch the image size for the tiny test resolution
    object.__setattr__(cfg, "image_size_override", (H, W))
    return cfg


@pytest.fixture(scope="module")
def setup():
    cfg = Config(minibatch=4, iterations=2, num_scales=1, lr=2e-4,
                 compute_dtype="float32")
    state, depth_model, pose_model = create_train_state(
        cfg.replace(img_resolution="low"), jax.random.PRNGKey(0),
        steps_per_epoch=10,
    )
    return cfg, state, depth_model, pose_model


def make_loader(batch_size=4, n_frames=10):
    seq = make_synthetic_sequence(n_frames, (H, W), seed=0)
    ds = SfMWindowDataset([seq], seq_len=3,
                          transform=WindowTransform(jitter=False, flip_prob=None))
    return BatchLoader(ds, batch_size, shuffle=False, seed=0)


class TestTrainStep:
    @pytest.mark.full
    def test_loss_decreases(self, setup):
        """Training makes progress at the gates' stable lr (5e-5).

        Deliberately NOT the paper lr (2e-4): from random init on
        synthetic data that regime is chaotic (the depth-collapse edge
        the reference warm-starts around), and a ~1e-4 numeric
        perturbation — conv accumulation order, compile-cache state —
        flips the 6-step outcome. A smoke test must probe the robust
        descent regime, not the bifurcation."""
        cfg, _, depth_model, pose_model = setup
        cfg = cfg.replace(lr=5e-5)
        state, _, _ = create_train_state(
            cfg.replace(img_resolution="low"), jax.random.PRNGKey(0),
            steps_per_epoch=10)
        step = make_train_step(cfg, depth_model, pose_model)
        loader = make_loader()
        mesh = make_mesh(1)
        batch = next(iter(loader))
        batch.pop("_valid")
        batch = shard_batch(mesh, batch)

        _, first = step(state, batch)
        s = state
        traj = []
        for _ in range(10):
            s, losses = step(s, batch)
            traj.append(float(losses["total"]))
        assert min(traj[-3:]) < float(first["total"]), (
            float(first["total"]), traj)

    def test_eval_step_no_state_change(self, setup):
        cfg, state, depth_model, pose_model = setup
        estep = make_eval_step(cfg, depth_model, pose_model)
        loader = make_loader()
        batch = next(iter(loader))
        batch.pop("_valid")
        losses = estep(state, batch)
        assert np.isfinite(float(losses["total"]))

    def test_freeze_posenet(self):
        cfg = Config(minibatch=2, iterations=1, num_scales=1,
                     compute_dtype="float32", freeze_posenet=True)
        state, dm, pm = create_train_state(cfg, jax.random.PRNGKey(1),
                                           steps_per_epoch=5)
        step = make_train_step(cfg, dm, pm)
        loader = make_loader(batch_size=2)
        batch = next(iter(loader))
        batch.pop("_valid")
        new_state, _ = step(state, batch)
        before = jax.tree_util.tree_leaves(state.params["pose"])
        after = jax.tree_util.tree_leaves(new_state.params["pose"])
        for a, b in zip(before, after):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        d_before = jax.tree_util.tree_leaves(state.params["depth"])
        d_after = jax.tree_util.tree_leaves(new_state.params["depth"])
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(d_before, d_after)
        )


class TestRemat:
    @pytest.mark.full
    def test_remat_matches_no_remat(self, setup):
        """jax.checkpoint over the coupled iterations changes memory use,
        not math: one train step must produce identical losses and
        parameters either way."""
        cfg, state0, depth_model, pose_model = setup
        loader = make_loader()
        batch = next(iter(loader))
        batch.pop("_valid", None)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}

        results = {}
        for remat in (False, True):
            step = make_train_step(cfg.replace(remat_coupled=remat),
                                   depth_model, pose_model)
            new_state, losses = step(state0, batch)
            results[remat] = (new_state, losses)
        lf, lt = results[False][1], results[True][1]
        for k in lf:
            np.testing.assert_allclose(float(lf[k]), float(lt[k]),
                                       rtol=1e-5, err_msg=k)
        flat_f = jax.tree_util.tree_leaves(results[False][0].params)
        flat_t = jax.tree_util.tree_leaves(results[True][0].params)
        for a, b in zip(flat_f, flat_t):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)


class TestDataParallel:
    @pytest.mark.full
    def test_sharded_training_matches_single_device(self, setup):
        """DP over a 4-device CPU mesh must agree with 1-device training."""
        cfg, state, depth_model, pose_model = setup
        step = make_train_step(cfg, depth_model, pose_model)
        loader = make_loader(batch_size=4)
        batch0 = next(iter(loader))
        batch0.pop("_valid")

        mesh1 = make_mesh(1)
        mesh4 = make_mesh(4)
        s1, l1 = step(state, shard_batch(mesh1, batch0))
        s4, l4 = step(state, shard_batch(mesh4, batch0))
        np.testing.assert_allclose(float(l1["total"]), float(l4["total"]),
                                   rtol=1e-4)
        # compare gradients, not post-Adam params: Adam normalizes by
        # |grad|, so fp reduction-order noise on near-zero gradient
        # coordinates flips updates by a full ±lr
        from tcsfm.train.trainer import forward_loss

        def grads_on(mesh):
            b = shard_batch(mesh, batch0)

            @jax.jit
            def g(params):
                def loss_fn(p):
                    losses, _, _ = forward_loss(
                        cfg, depth_model, pose_model, p, state.batch_stats,
                        b, train=False,
                    )
                    return losses["total"]
                return jax.grad(loss_fn)(params)
            return g(state.params)

        g1 = jax.tree_util.tree_leaves(grads_on(mesh1))
        g4 = jax.tree_util.tree_leaves(grads_on(mesh4))
        for a, b in zip(g1, g4):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
        # batch stats (global BN semantics under sharding) must agree
        st1 = jax.tree_util.tree_leaves(s1.batch_stats)
        st4 = jax.tree_util.tree_leaves(s4.batch_stats)
        for a, b in zip(st1, st4):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


class TestTrainerDriver:
    @pytest.mark.full
    def test_epoch_runs(self, setup):
        cfg, state, depth_model, pose_model = setup
        trainer = Trainer(cfg, state, depth_model, pose_model)
        loader = make_loader()
        losses = trainer.run_epoch(loader, epoch=0, phase="train",
                                   verbose=False)
        assert np.isfinite(losses["total"])
        val = trainer.run_epoch(loader, epoch=0, phase="val", verbose=False)
        assert np.isfinite(val["total"])


class TestCheckpoint:
    def test_roundtrip(self, setup, tmp_path):
        cfg, state, depth_model, pose_model = setup
        save_checkpoint(str(tmp_path), state, epoch=3, best_val_loss=0.5,
                        cfg=cfg, is_best=True)
        state2, epoch, best = load_checkpoint(str(tmp_path), state)
        assert epoch == 4 and best == 0.5
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(state2.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_load_best_resets(self, setup, tmp_path):
        cfg, state, depth_model, pose_model = setup
        save_checkpoint(str(tmp_path), state, epoch=7, best_val_loss=0.3,
                        cfg=cfg, is_best=True)
        _, epoch, best = load_checkpoint(str(tmp_path), state, load_best=True)
        assert epoch == 1 and best == 1e5
