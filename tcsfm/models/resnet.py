"""ResNet-18 encoder for the depth network (NHWC, flax.linen).

TPU-native implementation of the torchvision-based encoder used by the
reference (models/depth_models.py:50-131): conv1(7x7, s2) → BN → ReLU →
maxpool(3x3, s2) → 4 stages of BasicBlocks [64, 128, 256, 512], emitting
the 5 skip feature maps consumed by the decoder.

BatchNorm uses a mutable ``batch_stats`` collection; pass ``train=True``
to update running statistics. Under data parallelism the per-device batch
statistics are used as-is (the reference trains on a single device; for
exact cross-replica parity use ``axis_name='data'`` via ``bn_axis_name``
to psum the statistics).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from tcsfm.models.layers import Conv2D, StemConv, kaiming_out

Dtype = Any


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # BN computes in the model dtype (bf16): f32 normalization between
        # bf16 convs materializes full-size f32 feature maps and breaks
        # conv-epilogue fusion — measured 35 ms -> memory-bound encoder.
        # Statistics/params stay f32 (flax default param_dtype).
        norm = lambda: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, axis_name=self.bn_axis_name,
        )
        residual = x
        # Conv2D = nn.Conv parameter tree + the im2col GEMM lowering on
        # TPU backends (layers.conv2d_op); names pin nn.Conv's auto-names
        y = Conv2D(self.features, (3, 3),
                   strides=(self.stride, self.stride), padding=1,
                   use_bias=False, dtype=self.dtype,
                   kernel_init=kaiming_out, name="Conv_0")(x)
        y = norm()(y)
        y = nn.relu(y)
        y = Conv2D(self.features, (3, 3), padding=1, use_bias=False,
                   dtype=self.dtype, kernel_init=kaiming_out,
                   name="Conv_1")(y)
        y = norm()(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = Conv2D(self.features, (1, 1),
                              strides=(self.stride, self.stride),
                              use_bias=False, dtype=self.dtype,
                              kernel_init=kaiming_out, name="Conv_2")(x)
            residual = norm()(residual)
        return nn.relu(y + residual)


class ResNet18Encoder(nn.Module):
    """5-skip ResNet-18 feature extractor (depth_models.py:95-131)."""

    in_images: int = 1          # stacked input images (ResNetMultiImageInput)
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    # torchvision resnet18: [2, 2, 2, 2] blocks at [64, 128, 256, 512]
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    stage_features: Sequence[int] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = []
        # 7x7s2 stem via the exact 2x2 space-to-depth rewrite (StemConv);
        # parameter tree identical to the literal nn.Conv
        x = StemConv(64, dtype=self.dtype, kernel_init=kaiming_out,
                     name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         axis_name=self.bn_axis_name, name="bn1")(x)
        x = nn.relu(x)
        feats.append(x)                                       # H/2, 64

        # torch MaxPool2d(3, 2, padding=1) pads with -inf-equivalent zeros;
        # inputs are post-ReLU (>= 0) so a -inf pad and 0 pad agree.
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        for si, (n_blocks, f) in enumerate(
            zip(self.stage_sizes, self.stage_features)
        ):
            for bi in range(n_blocks):
                stride = 2 if (si > 0 and bi == 0) else 1
                x = BasicBlock(f, stride=stride, dtype=self.dtype,
                               bn_axis_name=self.bn_axis_name,
                               name=f"layer{si + 1}_{bi}")(x, train=train)
            feats.append(x)                                   # H/4..H/32

        return feats
