"""Depth network: ResNet-18 encoder + multi-scale sigmoid-disparity decoder.

TPU-native re-design of the reference depth model (models/depth_models.py:
133-232) with the feature-access capability of models/depth_w_access.py
built in: ``encode`` and ``decode`` are separate flax methods, so PFT can
run the encoder once, optimize skips/bottleneck activations, or re-decode
from injected features — no duplicate "w_access" network needed.

Decoder (depth_models.py:144-151, 167-209):
  upconv stages [512→256→128→64→64→32], each = 2x nearest upsample +
  refl-pad conv3x3 + ELU, with *additive* skip connections for the first
  four stages, each followed by a refl conv3x3 + ELU ("iconv"); per-scale
  8-channel feature convs feed sigmoid disparity heads.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from tcsfm.models.layers import (DualReflConv, ReflConv, SubpixelUpConv,
                                 phase_to_space, resize_nearest,
                                 upsample2x_nearest)
from tcsfm.models.resnet import ResNet18Encoder

Dtype = Any

UPCONV_PLANES = (256, 128, 64, 64, 32)


class DepthNet(nn.Module):
    num_scales: int = 1
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None
    # Exact subpixel fusion of each upconv's upsample2x+reflconv — same
    # parameter tree, ~4x fewer conv positions (see layers._PhaseConv3x3).
    # False keeps the literal upsample->pad->conv formulation for parity
    # debugging; both paths share checkpoints.
    subpixel: bool = True
    # Evaluate the full-resolution decoder tail (iconv4 → feature conv →
    # disp head) entirely in phase space on the half-res grid — exact
    # (layers._DualConv3x3), same parameter tree, and avoids XLA's
    # lane-starved full-res 32/8/1-channel convs. num_scales==1 +
    # subpixel only; ignored otherwise.
    phase_tail: bool = True

    def setup(self):
        self.encoder = ResNet18Encoder(dtype=self.dtype,
                                       bn_axis_name=self.bn_axis_name)
        planes2 = (512,) + UPCONV_PLANES
        up_cls = SubpixelUpConv if self.subpixel else ReflConv
        self.upconvs = [
            up_cls(planes2[i + 1], dtype=self.dtype, name=f"upconv{i}")
            for i in range(len(UPCONV_PLANES))
        ]
        # DualReflConv == ReflConv for normal inputs (same parameter tree);
        # the tail instances additionally accept phase-form tensors
        self.iconvs = [
            DualReflConv(UPCONV_PLANES[i], dtype=self.dtype, name=f"iconv{i}")
            for i in range(len(UPCONV_PLANES))
        ]
        self.feature_convs = [
            DualReflConv(8, dtype=self.dtype, name=f"feature_conv{i}")
            for i in range(self.num_scales)
        ]
        self.disp_heads = [
            DualReflConv(1, dtype=self.dtype, name=f"disp_head{i}")
            for i in range(self.num_scales)
        ]

    # --- pieces -----------------------------------------------------------

    def encode(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        """Image [B, H, W, 3] → 5 skip features. Includes the reference's
        (x - 0.45) / 0.22 input normalization (depth_models.py:164)."""
        x = (x - 0.45) / 0.22
        return self.encoder(x.astype(self.dtype), train=train)

    def decode(self, skips: Sequence[jax.Array]) -> List[jax.Array]:
        """Skip features → list of sigmoid disparities [B, h_s, w_s, 1],
        finest scale first (depth_models.py:167-209)."""
        def upconv(i, x):
            # subpixel modules fuse the 2x upsample into the conv itself
            if not self.subpixel:
                x = upsample2x_nearest(x)
            return nn.elu(self.upconvs[i](x))

        out = skips[-1]
        depth_features = []
        for i in range(len(self.iconvs) - 1):
            depth_features.append(out)
            up = upconv(i, out)
            up = up + skips[-(i + 2)]
            out = nn.elu(self.iconvs[i](up))

        if self.subpixel and self.phase_tail and self.num_scales == 1:
            # whole tail on the half-res grid (exact; see _DualConv3x3)
            z = self.upconvs[-1](out, phase_form=True)
            x = nn.elu(self.iconvs[-1](nn.elu(z), phase_input=True))
            f = nn.elu(self.feature_convs[0](x, phase_input=True))
            d = nn.sigmoid(self.disp_heads[0](f, phase_input=True))
            return [phase_to_space(d)]

        depth_features.append(out)
        up = upconv(len(self.iconvs) - 1, out)
        out = nn.elu(self.iconvs[-1](up))
        depth_features.append(out)

        feats = depth_features[-self.num_scales:]
        feats = [nn.elu(self.feature_convs[i](f)) for i, f in enumerate(feats)]

        # merge features across scales: each head sees its scale's features
        # concatenated with all coarser scales upsized to it
        # (depth_models.py:192-206)
        merged = [feats[0]]
        for i in range(self.num_scales - 1, 0, -1):
            h, w = feats[-i].shape[1:3]
            ups = [resize_nearest(feats[j], h, w)
                   for j in range(self.num_scales - i)]
            merged.append(jnp.concatenate(ups + [feats[-i]], axis=-1))

        disps = []
        for i in range(self.num_scales, 0, -1):
            disps.append(nn.sigmoid(self.disp_heads[-i](merged[-i])))
        disps.reverse()
        return disps

    def decode_phase_tail(self, skips: Sequence[jax.Array]) -> jax.Array:
        """Decoder stages 0-3 plus the last upconv in PHASE FORM
        [B, H/2, W/2, 4*32] — the input of the experimental fused
        decoder-tail kernel (experiments/decoder_tail.py), which replaces
        the full-resolution iconv4/feature/head convs.
        num_scales == 1 and subpixel only."""
        assert self.subpixel and self.num_scales == 1
        out = skips[-1]
        for i in range(len(self.iconvs) - 1):
            up = nn.elu(self.upconvs[i](out))
            up = up + skips[-(i + 2)]
            out = nn.elu(self.iconvs[i](up))
        return self.upconvs[-1](out, phase_form=True)

    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        return self.decode(self.encode(x, train=train))


def tail_weights(depth_params) -> tuple:
    """(w1, b1, w2, b2, w3, b3) of the decoder tail from the params tree."""
    def wb(name):
        c = depth_params[name]["Conv_0"]
        return c["kernel"], c["bias"]

    w1, b1 = wb("iconv4")
    w2, b2 = wb("feature_conv0")
    w3, b3 = wb("disp_head0")
    return w1, b1, w2, b2, w3, b3


def make_depth_apply(depth_model: DepthNet, depth_vars):
    """imgs -> [disparities] callable for inference paths.

    The former ``use_tail_kernel`` knob is retired: the experimental
    fused Pallas tail kernel consistently measured SLOWER than the XLA
    phase-space tail it replaced (39.6 vs 30.3 ms depth net; 62.6 ms for
    its direct-accumulation variant — PERFORMANCE.md round 2) and now
    lives in experiments/decoder_tail.py as a documented negative
    result."""
    return lambda imgs: depth_model.apply(depth_vars, imgs)
