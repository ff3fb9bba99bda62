"""Pose network: 7-stage weight-standardized conv stack → 6-DoF pose.

TPU-native re-design of the PackNet-SfM style pose model
(models/pose_models.py:88-147): stacked (target, source) image pair
[B, H, W, 6] (8 channels with classical flow) → conv_gn stages
[16, 32, 64, 128, 256, 256, 256] with kernels 7/5/3/3/3/3/3, all stride 2
→ 1x1 conv head → global mean pool → 0.01 * pose.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from tcsfm.models.layers import ConvGN, xavier_uniform

Dtype = Any

CONV_CHANNELS = (16, 32, 64, 128, 256, 256, 256)
CONV_KERNELS = (7, 5, 3, 3, 3, 3, 3)


class PoseNet(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, imgs: jax.Array) -> jax.Array:
        """imgs: [B, H, W, 6] stacked pair → [B, 6] pose [t, r] * 0.01.

        Includes the (x - 0.45) / 0.22 input normalization
        (pose_models.py:129).
        """
        x = (imgs - 0.45) / 0.22
        x = x.astype(self.dtype)
        for i, (ch, k) in enumerate(zip(CONV_CHANNELS, CONV_KERNELS)):
            x = ConvGN(ch, kernel=k, dtype=self.dtype, name=f"conv{i + 1}")(x)
        pose = nn.Conv(6, (1, 1), dtype=self.dtype,
                       kernel_init=xavier_uniform,
                       bias_init=nn.initializers.zeros,
                       name="pose_pred")(x)
        pose = jnp.mean(pose, axis=(1, 2))                     # [B, 6]
        return (0.01 * pose).astype(jnp.float32)
