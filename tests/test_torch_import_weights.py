"""Torchvision-weights parity for the encoder warm-start (VERDICT r2 #8).

The reference warm-starts its depth encoder from torchvision's ImageNet
resnet18 (depth_models.py:110-119, README.md:54), so the converter's
numeric correctness against the REAL torchvision weights matters. This
environment ships neither torchvision nor the weights file, so the tests
here skip cleanly — they run (and gate layer-wise parity) the moment an
environment has either:

  * a resnet18 ``.pth`` state dict on disk (``TCSFM_RESNET18_WEIGHTS`` env
    var or the standard ``~/.cache/torch/hub/checkpoints/resnet18-*.pth``)
    — torch.load needs no torchvision; or
  * an importable ``torchvision`` (random-init parity: verifies the key
    mapping and conv/BN numerics against real torchvision module code).
"""

import glob
import os

import numpy as np
import pytest

import jax


def _find_weights_file():
    p = os.environ.get("TCSFM_RESNET18_WEIGHTS")
    if p and os.path.exists(p):
        return p
    hits = glob.glob(os.path.expanduser(
        "~/.cache/torch/hub/checkpoints/resnet18-*.pth"))
    return hits[0] if hits else None


def _torchvision():
    try:
        import torchvision
    except ImportError:
        return None
    # test_reference_parity stubs a fake torchvision module (resnet18 =
    # None) into sys.modules to import the reference code — only a REAL
    # torchvision counts here
    if not callable(getattr(getattr(torchvision, "models", None),
                            "resnet18", None)):
        return None
    return torchvision


def _flax_stage_features(sd_numpy, x_nchw):
    """Converted state dict + NCHW input → list of 5 NCHW stage features
    from the flax encoder."""
    import jax.numpy as jnp

    from tcsfm.models.resnet import ResNet18Encoder
    from tcsfm.models.torch_import import convert_torchvision_resnet18

    params, stats = convert_torchvision_resnet18(sd_numpy)
    enc = ResNet18Encoder(dtype=jnp.float32)
    x = jnp.asarray(np.moveaxis(x_nchw, 1, -1))          # NCHW → NHWC
    feats = enc.apply({"params": params["encoder"],
                       "batch_stats": stats["encoder"]}, x, train=False)
    return [np.moveaxis(np.asarray(f), -1, 1) for f in feats]


def _torch_stage_features(model, x_nchw):
    """The reference's stage slicing (depth_models.py:124-131)."""
    import torch

    model.eval()
    feats = []
    with torch.no_grad():
        x = torch.from_numpy(x_nchw)
        x = model.relu(model.bn1(model.conv1(x)))
        feats.append(x)
        x = model.layer1(model.maxpool(x))
        feats.append(x)
        for layer in (model.layer2, model.layer3, model.layer4):
            x = layer(x)
            feats.append(x)
    return [f.numpy() for f in feats]


def _assert_layerwise(torch_feats, flax_feats, tol=1e-4):
    assert len(torch_feats) == len(flax_feats) == 5
    for i, (tf, ff) in enumerate(zip(torch_feats, flax_feats)):
        assert tf.shape == ff.shape, (i, tf.shape, ff.shape)
        scale = max(float(np.abs(tf).max()), 1e-6)
        err = float(np.abs(tf - ff).max()) / scale
        assert err < tol, f"stage {i}: rel err {err:.2e}"


class TestTorchvisionParity:
    @pytest.mark.skipif(_torchvision() is None,
                        reason="torchvision not installed in this env")
    def test_random_init_layerwise_parity(self):
        """Key mapping + conv/BN numerics vs REAL torchvision module code
        (random init — no download needed)."""
        import torch
        import torchvision

        torch.manual_seed(0)
        model = torchvision.models.resnet18()
        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        x = np.random.RandomState(0).rand(2, 3, 64, 96).astype(np.float32)
        _assert_layerwise(_torch_stage_features(model, x),
                          _flax_stage_features(sd, x))

    @pytest.mark.skipif(_find_weights_file() is None,
                        reason="no resnet18 .pth weights on disk "
                               "(set TCSFM_RESNET18_WEIGHTS)")
    def test_imagenet_weights_convert_and_run(self):
        """ImageNet weights convert and produce finite, non-degenerate
        stage features; adds layer-wise parity when torchvision is also
        importable."""
        import torch

        sd_t = torch.load(_find_weights_file(), map_location="cpu")
        sd = {k: v.numpy() for k, v in sd_t.items()}
        x = np.random.RandomState(0).rand(2, 3, 64, 96).astype(np.float32)
        flax_feats = _flax_stage_features(sd, x)
        for f in flax_feats:
            assert np.all(np.isfinite(f))
            assert float(np.abs(f).max()) > 1e-3     # not collapsed
        tv = _torchvision()
        if tv is not None:
            model = tv.models.resnet18()
            model.load_state_dict(sd_t)
            _assert_layerwise(_torch_stage_features(model, x), flax_feats)
