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

from tcsfm.models.layers import ReflConv, resize_nearest, upsample2x_nearest
from tcsfm.models.resnet import ResNet18Encoder

Dtype = Any

UPCONV_PLANES = (256, 128, 64, 64, 32)


class DepthNet(nn.Module):
    num_scales: int = 1
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    def setup(self):
        self.encoder = ResNet18Encoder(dtype=self.dtype,
                                       bn_axis_name=self.bn_axis_name)
        planes2 = (512,) + UPCONV_PLANES
        self.upconvs = [
            ReflConv(planes2[i + 1], dtype=self.dtype, name=f"upconv{i}")
            for i in range(len(UPCONV_PLANES))
        ]
        self.iconvs = [
            ReflConv(UPCONV_PLANES[i], dtype=self.dtype, name=f"iconv{i}")
            for i in range(len(UPCONV_PLANES))
        ]
        self.feature_convs = [
            ReflConv(8, dtype=self.dtype, name=f"feature_conv{i}")
            for i in range(self.num_scales)
        ]
        self.disp_heads = [
            ReflConv(1, dtype=self.dtype, name=f"disp_head{i}")
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
        out = skips[-1]
        depth_features = []
        for i in range(len(self.iconvs) - 1):
            depth_features.append(out)
            up = upsample2x_nearest(out)
            up = nn.elu(self.upconvs[i](up))
            up = up + skips[-(i + 2)]
            out = nn.elu(self.iconvs[i](up))

        depth_features.append(out)
        up = upsample2x_nearest(out)
        up = nn.elu(self.upconvs[-1](up))
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

    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        return self.decode(self.encode(x, train=train))
