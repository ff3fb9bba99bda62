"""Model tests: shapes, determinism, and pose-net parity vs the reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcsfm.models.depth import DepthNet
from tcsfm.models.pose import PoseNet

B, H, W = 2, 64, 96  # divisible by 32 for the encoder


def _rand(shape, seed=0):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32)


class TestDepthNet:
    def test_output_shapes(self):
        model = DepthNet(num_scales=1)
        x = jnp.asarray(_rand((B, H, W, 3)))
        variables = model.init(jax.random.PRNGKey(0), x)
        disps = model.apply(variables, x)
        assert len(disps) == 1
        assert disps[0].shape == (B, H, W, 1)
        d = np.asarray(disps[0])
        assert d.min() >= 0.0 and d.max() <= 1.0

    def test_multiscale_shapes(self):
        model = DepthNet(num_scales=3)
        x = jnp.asarray(_rand((1, H, W, 3)))
        variables = model.init(jax.random.PRNGKey(0), x)
        disps = model.apply(variables, x)
        assert len(disps) == 3
        assert disps[0].shape == (1, H, W, 1)
        assert disps[1].shape == (1, H // 2, W // 2, 1)
        assert disps[2].shape == (1, H // 4, W // 4, 1)

    def test_encode_decode_split(self):
        """PFT capability: encoder-only pass + decode from injected skips
        must equal the fused forward (depth_w_access.py:43-94)."""
        model = DepthNet(num_scales=1)
        x = jnp.asarray(_rand((B, H, W, 3), seed=1))
        variables = model.init(jax.random.PRNGKey(0), x)
        fused = model.apply(variables, x)
        skips = model.apply(variables, x, method=DepthNet.encode)
        assert len(skips) == 5
        split = model.apply(variables, skips, method=DepthNet.decode)
        np.testing.assert_allclose(np.asarray(fused[0]), np.asarray(split[0]),
                                   atol=1e-6)

    def test_subpixel_decoder_matches_literal(self):
        """The subpixel upconv fusion is EXACT: same params, same outputs
        as the literal upsample2x -> reflect-pad -> conv3x3 formulation,
        for every scale head."""
        x = jnp.asarray(_rand((2, H, W, 3), seed=4))
        fast = DepthNet(num_scales=3, subpixel=True)
        literal = DepthNet(num_scales=3, subpixel=False)
        variables = fast.init(jax.random.PRNGKey(0), x)
        # identical parameter trees: literal applies fast's params directly
        d_fast = fast.apply(variables, x)
        d_lit = literal.apply(variables, x)
        # single-layer equivalence is ~2e-6 (f32 reorder noise, borders
        # included — verified directly); stacked through 5 decoder stages
        # it accumulates to ~1e-4 on the [0,1] disparity outputs
        for a, b in zip(d_fast, d_lit):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4)

    def test_phase_tail_matches_fullres_tail(self):
        """The phase-space decoder tail (num_scales==1 hot path) is exact
        vs the full-resolution formulation, sharing one parameter tree."""
        x = jnp.asarray(_rand((2, H, W, 3), seed=7))
        phase = DepthNet(num_scales=1, phase_tail=True)
        full = DepthNet(num_scales=1, phase_tail=False)
        variables = phase.init(jax.random.PRNGKey(1), x)
        d_phase = phase.apply(variables, x)
        d_full = full.apply(variables, x)
        np.testing.assert_allclose(np.asarray(d_phase[0]),
                                   np.asarray(d_full[0]), atol=5e-5)

    def test_batchnorm_stats_update(self):
        model = DepthNet(num_scales=1)
        x = jnp.asarray(_rand((B, H, W, 3), seed=2))
        variables = model.init(jax.random.PRNGKey(0), x)
        _, updates = model.apply(variables, x, train=True,
                                 mutable=["batch_stats"])
        old = jax.tree_util.tree_leaves(variables["batch_stats"])
        new = jax.tree_util.tree_leaves(updates["batch_stats"])
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new)
        )


class TestStemConv:
    """The encoder stem's 2x2 space-to-depth rewrite must equal the
    literal 7x7s2 conv (same multiply-adds, different grouping)."""

    @pytest.mark.parametrize("shape", [(2, 32, 48, 3), (1, 64, 96, 6),
                                       (2, 32, 48, 8)])
    def test_s2d_matches_literal_conv(self, shape):
        from tcsfm.models.layers import StemConv

        x = jnp.asarray(_rand(shape, seed=11) - 0.5)
        m = StemConv(16)
        v = m.init(jax.random.PRNGKey(2), x)
        got = m.apply(v, x)
        ref = jax.lax.conv_general_dilated(
            x, v["params"]["kernel"], (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        assert got.shape == ref.shape == \
            (shape[0], shape[1] // 2, shape[2] // 2, 16)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)

    def test_odd_shapes_fall_back(self):
        from tcsfm.models.layers import StemConv

        x = jnp.asarray(_rand((1, 33, 47, 3), seed=4))
        m = StemConv(16)
        v = m.init(jax.random.PRNGKey(2), x)
        got = m.apply(v, x)                 # literal path, no crash
        assert got.shape == (1, 17, 24, 16)
        # parameter tree identical to nn.Conv: a single [7,7,C,O] kernel
        assert v["params"]["kernel"].shape == (7, 7, 3, 16)


class TestPoseNet:
    def test_output_shape_and_scale(self):
        model = PoseNet()
        x = jnp.asarray(_rand((B, H, W, 6)))
        variables = model.init(jax.random.PRNGKey(0), x)
        pose = model.apply(variables, x)
        assert pose.shape == (B, 6)
        # 0.01 output scaling keeps initial poses small
        assert np.abs(np.asarray(pose)).max() < 1.0

    def test_parity_with_reference_torch_model(self):
        """Convert the actual reference pose_model weights and require
        matching outputs — end-to-end conv/WS/GroupNorm parity."""
        torch = pytest.importorskip("torch")
        import sys

        sys.path.insert(0, "/root/reference")
        try:
            import models.pose_models as ref_pose
        except Exception:
            pytest.skip("reference pose model unavailable")

        from tcsfm.models.torch_import import convert_pose_state_dict

        torch.manual_seed(0)
        ref = ref_pose.pose_model({"flow_type": "none"})
        ref.eval()
        x = _rand((B, H, W, 6), seed=3)
        with torch.no_grad():
            expected = ref(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()

        params = convert_pose_state_dict(ref.state_dict())
        model = PoseNet()
        got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
        np.testing.assert_allclose(got, expected, atol=2e-5)


class TestImageNetWarmStart:
    """torchvision resnet18 ingestion (depth_models.py:110-119 warm start)."""

    def _fake_torchvision_sd(self, seed=7):
        """State dict with torchvision resnet18 key names and shapes."""
        rng = np.random.RandomState(seed)
        sd = {}

        def bn(prefix, c):
            sd[f"{prefix}.weight"] = rng.rand(c).astype(np.float32) + 0.5
            sd[f"{prefix}.bias"] = rng.rand(c).astype(np.float32)
            sd[f"{prefix}.running_mean"] = rng.randn(c).astype(np.float32)
            sd[f"{prefix}.running_var"] = rng.rand(c).astype(np.float32) + 0.5

        sd["conv1.weight"] = rng.randn(64, 3, 7, 7).astype(np.float32)
        bn("bn1", 64)
        widths = [64, 64, 128, 256, 512]
        for layer in range(1, 5):
            cin, cout = widths[layer - 1], widths[layer]
            for block in range(2):
                p = f"layer{layer}.{block}"
                c0 = cin if block == 0 else cout
                sd[f"{p}.conv1.weight"] = rng.randn(
                    cout, c0, 3, 3).astype(np.float32) * 0.05
                bn(f"{p}.bn1", cout)
                sd[f"{p}.conv2.weight"] = rng.randn(
                    cout, cout, 3, 3).astype(np.float32) * 0.05
                bn(f"{p}.bn2", cout)
                if block == 0 and cin != cout:
                    sd[f"{p}.downsample.0.weight"] = rng.randn(
                        cout, cin, 1, 1).astype(np.float32) * 0.05
                    bn(f"{p}.downsample.1", cout)
        sd["fc.weight"] = rng.randn(1000, 512).astype(np.float32)
        sd["fc.bias"] = rng.randn(1000).astype(np.float32)
        return sd

    def test_warm_start_shapes_and_effect(self):
        from tcsfm.models.torch_import import (convert_torchvision_resnet18,
                                               warm_start_encoder)

        enc_params, enc_stats = convert_torchvision_resnet18(
            self._fake_torchvision_sd())

        model = DepthNet()
        x = jnp.asarray(_rand((B, H, W, 3), seed=1))
        variables = model.init(jax.random.PRNGKey(0), x)
        params0 = variables["params"]
        stats0 = variables["batch_stats"]

        params1 = warm_start_encoder(params0, enc_params)
        stats1 = warm_start_encoder(stats0, enc_stats)

        # pytree structure and shapes unchanged (merge, not replace)
        s0 = jax.tree_util.tree_map(lambda a: a.shape, params0)
        s1 = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, params1)
        assert s0 == s1
        # encoder weights actually changed, decoder untouched
        assert not np.allclose(
            params1["encoder"]["conv1"]["kernel"],
            params0["encoder"]["conv1"]["kernel"])
        np.testing.assert_array_equal(
            np.asarray(params1["upconv0"]["Conv_0"]["kernel"]),
            np.asarray(params0["upconv0"]["Conv_0"]["kernel"]))

        # forward still runs and produces different (warm-started) output
        d0 = model.apply({"params": params0, "batch_stats": stats0}, x)[0]
        d1 = model.apply({"params": params1, "batch_stats": stats1}, x)[0]
        assert np.isfinite(np.asarray(d1)).all()
        assert not np.allclose(np.asarray(d0), np.asarray(d1))
