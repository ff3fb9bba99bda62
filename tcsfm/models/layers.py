"""Shared conv building blocks (NHWC, flax.linen).

TPU-native equivalents of the reference layer helpers:
  * ``ReflConv``      — reflection-pad + conv (models/depth_models.py:19-35)
  * ``WSConv``        — weight-standardized conv (models/pose_models.py:10-25)
  * ``conv_gn`` block — WSConv + GroupNorm(16) + ReLU (pose_models.py:62-84)

Normalization statistics are computed in float32 even under bfloat16
compute, matching standard mixed-precision practice on TPU.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")
xavier_uniform = nn.initializers.xavier_uniform()

# ---------------------------------------------------------------------------
# Conv lowering: XLA native conv vs explicit im2col GEMM
# ---------------------------------------------------------------------------
# MEASURED NEGATIVE RESULT (round 5, v5e) — native is the default.
# An isolated, un-chained microbenchmark of the phase-tail conv
# (128->128 3x3 at 18x96x320 bf16) showed the im2col GEMM at 0.76 ms vs
# 1.37 ms native — but that win is a single-dispatch fusion artifact:
# scan-chained, the same im2col conv costs 6.0 ms (the [M, 9*Cin] tap
# concat materializes at ~9x activation traffic instead of fusing into
# the GEMM's operand reads), and the FULL NETWORK under the im2col
# lowering regresses 2.6x (bench.py forward 36.3 -> 93.4 ms, train step
# 153 -> 488 ms, PFT 2.96 -> 0.77 w/s). XLA's native conv lowering is
# the right call at these shapes; per-layer data in
# scripts/probe_conv_im2col.py. TCSFM_CONV_IM2COL=1 re-enables the GEMM
# lowering on TPU for future re-evaluation (read once at import so jit
# retrace caching stays sound).

_CONV_IM2COL = os.environ.get("TCSFM_CONV_IM2COL", "") == "1"


def _use_im2col() -> bool:
    return _CONV_IM2COL and jax.default_backend() not in ("cpu",)


def conv2d_op(x: jax.Array, k: jax.Array,
              stride: Tuple[int, int] = (1, 1),
              padding=((0, 0), (0, 0)),
              prefer_im2col: Optional[bool] = None) -> jax.Array:
    """NHWC x HWIO conv via XLA's conv op or the im2col GEMM lowering.

    ``padding`` is [(top, bottom), (left, right)] zero padding (callers
    that need reflect/edge padding pre-pad and pass zeros here, as the
    existing layers already do)."""
    if prefer_im2col is None:
        prefer_im2col = _use_im2col()
    if not prefer_im2col:
        return jax.lax.conv_general_dilated(
            x, k, stride, [tuple(padding[0]), tuple(padding[1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    kh, kw, cin, cout = k.shape
    xp = jnp.pad(x, ((0, 0), tuple(padding[0]), tuple(padding[1]), (0, 0)))
    b, hp, wp, _ = xp.shape
    sh, sw = stride
    ho = (hp - kh) // sh + 1
    wo = (wp - kw) // sw + 1
    taps = jnp.concatenate(
        [xp[:, dy:dy + sh * (ho - 1) + 1:sh,
            dx:dx + sw * (wo - 1) + 1:sw, :]
         for dy in range(kh) for dx in range(kw)], -1)
    o = jnp.dot(taps.reshape(b * ho * wo, kh * kw * cin),
                k.reshape(kh * kw * cin, cout),
                preferred_element_type=jnp.float32)
    return o.reshape(b, ho, wo, cout).astype(x.dtype)


class Conv2D(nn.Module):
    """Drop-in for ``nn.Conv`` (same parameter tree: ``kernel`` [kh, kw,
    Cin, Cout] + optional ``bias``) that routes through ``conv2d_op`` so
    TPU backends get the im2col GEMM lowering. ``padding`` is an integer
    symmetric zero pad (the only form this framework uses with nn.Conv)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: int = 0
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    kernel_init: Callable = kaiming_out

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        w = self.param("kernel", self.kernel_init,
                       (kh, kw, x.shape[-1], self.features), jnp.float32)
        p = self.padding
        y = conv2d_op(x.astype(self.dtype), w.astype(self.dtype),
                      stride=tuple(self.strides), padding=((p, p), (p, p)))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
            y = y + b.astype(self.dtype)
        return y


class ReflConv(nn.Module):
    """Reflection-pad + VALID conv, the monodepth2 Conv3x3 (depth_models.py:19-35)."""

    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Dtype = jnp.float32
    kernel_init: Callable = kaiming_out

    @nn.compact
    def __call__(self, x):
        p = (self.kernel - 1) // 2
        x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
        # Conv2D with nn.Conv's auto-name: identical parameter tree
        return Conv2D(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            dtype=self.dtype, kernel_init=self.kernel_init,
            name="Conv_0",
        )(x)


class _PhaseConv3x3(nn.Module):
    """Subpixel phase conv: holds a standard ReflConv-compatible
    [3, 3, Cin, Cout] kernel + bias, but computes the EXACT equivalent of
    ``conv3x3_valid(reflect_pad1(upsample2x_nearest(x)))`` as a single
    conv on the low-res grid producing all 4 output phases.

    Why exact: on a nearest-upsampled image every 2x2 block repeats one
    source pixel, so each output phase's 3x3 window covers a fixed 2x2
    patch of low-res pixels with tap weights summed per source pixel; and
    reflect-padding the upsampled image reads the edge pixel's duplicate,
    i.e. replicate ('edge') padding of the low-res image. Net effect:
    4x fewer conv positions (2.25x fewer MACs) and no 4x-size upsampled
    intermediate — the decoder's upconvs were the depth net's hot spot
    (measured ~29 ms of the 36 ms depth forward at med-res/18 imgs).
    """

    features: int
    dtype: Dtype = jnp.float32
    kernel_init: Callable = kaiming_out

    @nn.compact
    def __call__(self, x, phase_form: bool = False):
        cin = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        k = kernel.astype(self.dtype)
        # scatter the 3x3 taps into per-phase 2x2 footprints (stored in a
        # [3, 3] offset grid relative to the edge-padded low-res input)
        kp = jnp.zeros((3, 3, cin, 4, self.features), self.dtype)
        for pi in range(2):
            for pj in range(2):
                for di in range(3):
                    for dj in range(3):
                        oi = (pi + di - 1) // 2 + 1
                        oj = (pj + dj - 1) // 2 + 1
                        kp = kp.at[oi, oj, :, 2 * pi + pj].add(k[di, dj])
        kp = kp.reshape(3, 3, cin, 4 * self.features)
        xp = jnp.pad(x.astype(self.dtype), ((0, 0), (1, 1), (1, 1), (0, 0)),
                     mode="edge")
        y = conv2d_op(xp, kp)
        y = y + jnp.tile(bias.astype(self.dtype), 4)
        if phase_form:
            # [N, Hl, Wl, 4*C] with channel = (2*pi + pj)*C + c — the
            # layout the fused decoder-tail kernel consumes
            return y
        n, h, w, _ = y.shape
        y = y.reshape(n, h, w, 2, 2, self.features)
        return y.transpose(0, 1, 3, 2, 4, 5).reshape(
            n, 2 * h, 2 * w, self.features)


class _DualConv3x3(nn.Module):
    """One [3, 3, Cin, Cout] reflect-conv parameter set, evaluated either
    literally (``phase_input=False`` — identical to the conv inside
    ``ReflConv``) or as its EXACT phase-space equivalent on a 4-phase
    half-resolution tensor [N, Hl, Wl, 4*Cin] (phase-major channels,
    ``(2*pi + pj)*Cin + c`` — the `_PhaseConv3x3` output layout).

    Phase-space form: full-res output pixel u = 2i + q reads full-res rows
    u + dy = half rows i + (q+dy)//2 at phase (q+dy) % 2, so the 3x3
    full-res conv becomes a 3x3 half-res conv with a DENSE phase-mixing
    kernel [3, 3, 4*Cin, 4*Cout] (each (in-phase, out-phase) pair holds
    one original tap or zero). 4x the MACs of the literal form, but the
    half-res positions are 1/4 as many and the channel dims are 4x wider
    — full-res 32/8/1-channel convs were measured lane-starved at ~3% MXU
    in XLA, while this shape tiles cleanly (PERFORMANCE.md round 2).
    Reflect padding of every full-res intermediate ≡ edge replication of
    its phase tensor (the ±1-tap argument in experiments/decoder_tail.py).
    """

    features: int
    dtype: Dtype = jnp.float32
    kernel_init: Callable = kaiming_out

    @nn.compact
    def __call__(self, x, phase_input: bool = False):
        cin = x.shape[-1] // (4 if phase_input else 1)
        kernel = self.param("kernel", self.kernel_init,
                            (3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        k = kernel.astype(self.dtype)
        if not phase_input:
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
            y = conv2d_op(xp.astype(self.dtype), k)
            return y + bias.astype(self.dtype)

        kp = jnp.zeros((3, 3, 4 * cin, 4 * self.features), self.dtype)
        for qi in range(2):
            for qj in range(2):
                q = 2 * qi + qj
                for dy in (-1, 0, 1):
                    di = (qi + dy) // 2 + 1
                    pi = (qi + dy) % 2
                    for dx in (-1, 0, 1):
                        dj = (qj + dx) // 2 + 1
                        pj = (qj + dx) % 2
                        p = 2 * pi + pj
                        # (di, dj, p) is unique per (q, dy, dx): set, not add
                        kp = kp.at[di, dj, p * cin:(p + 1) * cin,
                                   q * self.features:
                                   (q + 1) * self.features].set(
                                       k[dy + 1, dx + 1])
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        y = conv2d_op(xp.astype(self.dtype), kp)
        return y + jnp.tile(bias.astype(self.dtype), 4)


class DualReflConv(nn.Module):
    """Drop-in replacement for a 3x3 ``ReflConv`` (identical parameter
    tree ``<name>/Conv_0/{kernel, bias}`` and identical output at
    ``phase_input=False``) that can also consume/produce phase-form
    tensors — lets the decoder tail run entirely on the half-res grid."""

    features: int
    dtype: Dtype = jnp.float32
    kernel_init: Callable = kaiming_out

    @nn.compact
    def __call__(self, x, phase_input: bool = False):
        return _DualConv3x3(self.features, dtype=self.dtype,
                            kernel_init=self.kernel_init,
                            name="Conv_0")(x, phase_input=phase_input)


def phase_to_space(y: jax.Array) -> jax.Array:
    """[N, Hl, Wl, 4*C] phase-major ((2*pi + pj)*C + c) → [N, 2Hl, 2Wl, C]."""
    n, hl, wl, c4 = y.shape
    c = c4 // 4
    y = y.reshape(n, hl, wl, 2, 2, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * hl, 2 * wl, c)


class SubpixelUpConv(nn.Module):
    """Drop-in replacement for ``upsample2x_nearest`` + ``ReflConv`` with
    an identical parameter tree (``<name>/Conv_0/{kernel, bias}``), so
    checkpoints and the torch weight converter work unchanged."""

    features: int
    dtype: Dtype = jnp.float32
    kernel_init: Callable = kaiming_out

    @nn.compact
    def __call__(self, x, phase_form: bool = False):
        return _PhaseConv3x3(self.features, dtype=self.dtype,
                             kernel_init=self.kernel_init,
                             name="Conv_0")(x, phase_form=phase_form)


def _s2d16_embedding(k: int, pad: int):
    """Static 0/1 embedding E[kx, q, p, j] for the width-space-to-depth
    stride-2 conv rewrite (see WSConv): output x = 8*xk + j reads input
    x = 16*xk + d with d = 2j + kx - pad, and d maps to s2d column
    q ∈ {0,1,2} (xk-1, xk, xk+1) at plane p = d - 16*(q-1)."""
    import numpy as np

    E = np.zeros((k, 3, 16, 8), np.float32)
    for q in range(3):
        for p in range(16):
            d = p + 16 * (q - 1)
            for j in range(8):
                kx = d - 2 * j + pad
                if 0 <= kx < k:
                    E[kx, q, p, j] = 1.0
    return E


class WSConv(nn.Module):
    """Weight-standardized conv (pose_models.py:10-25).

    Per-output-channel: subtract the kernel mean and divide by the *sample*
    standard deviation (Bessel-corrected, +1e-5), exactly like the torch
    ``weight.view(O,-1).std(dim=1)`` in the reference. Zero padding.

    Lane-starved stride-2 entry convs (the pose net's 7x7s2 6->16 runs at
    ~12.5% MXU lane use: N = 16 of 128 lanes) take an EXACT
    width-space-to-depth rewrite: fold 16 input columns into channels
    (6 -> 96 in), embed the kernel so each matmul produces 8 output
    columns x C_out = full 128 lanes, and un-fold by reshape (the (xk, j)
    dims are already adjacent — no transpose). 48/k x redundant FLOPs
    (zeros in the embedded kernel) but measured 1.21 -> 0.36 ms on the
    pose conv1 at med-res — the same few-big-dense-ops lesson as the
    column-banded warp selectors. Same multiply-adds in a different
    grouping: equal to the literal conv up to f32 accumulation order.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    kernel_init: Callable = xavier_uniform

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kshape = (self.kernel, self.kernel, in_ch, self.features)  # HWIO
        w = self.param("kernel", self.kernel_init, kshape, jnp.float32)
        # standardize over (H, W, I) per output channel, in f32
        mean = jnp.mean(w, axis=(0, 1, 2), keepdims=True)
        wc = w - mean
        n = self.kernel * self.kernel * in_ch
        var = jnp.sum(wc * wc, axis=(0, 1, 2), keepdims=True) / (n - 1)
        w = wc / (jnp.sqrt(var) + 1e-5)

        W = x.shape[2]
        # conv1 (6 ch) always; conv2 (16 ch) only at bf16 compute — the
        # round-5 probe (scripts/probe_pose_layers.py) measured the conv2
        # rewrite at 0.35 ms vs 0.44 ms literal (lane occupancy 256 vs 32
        # of 128 output lanes beats the 48/k ~ 9.6x structural-zero
        # FLOPs), but enabling it at f32 compute flips the f32 summation
        # order of every CPU path and pushed the synthetic gate's
        # from-scratch 5-epoch training into the depth-collapse basin at
        # ALL THREE calibration seeds (disp saturates to 1, sigmoid
        # gradients underflow to exactly 0, PFT loss goes flat). bf16
        # compute is the TPU product path; f32 compute (CPU gates, the
        # warm gate's matched variant) keeps the literal conv and its
        # long-calibrated trajectories.
        wide_ok = in_ch <= 8 or (in_ch <= 16 and self.dtype == jnp.bfloat16)
        use_s2d = (self.stride == 2 and self.padding == (self.kernel - 1) // 2
                   and wide_ok and W % 16 == 0 and W >= 32)
        if use_s2d:
            E = jnp.asarray(_s2d16_embedding(self.kernel, self.padding))
            # [k, kx, ci, co] x [kx, q, p, j] -> [k, q, (p, ci), (j, co)]
            k_emb = jnp.einsum("yxic,xqpj->yqpijc", w, E).reshape(
                self.kernel, 3, 16 * in_ch, 8 * self.features)
            v = x.astype(self.dtype).reshape(
                x.shape[0], x.shape[1], W // 16, 16 * in_ch)
            y = conv2d_op(v, k_emb.astype(self.dtype), stride=(2, 1),
                          padding=((self.padding, self.padding), (1, 1)))
            y = y.reshape(y.shape[0], y.shape[1], W // 2, self.features)
        else:
            y = conv2d_op(
                x.astype(self.dtype), w.astype(self.dtype),
                stride=(self.stride, self.stride),
                padding=((self.padding, self.padding),
                         (self.padding, self.padding)))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32)
            y = y + b.astype(self.dtype)
        return y


class StemConv(nn.Module):
    """ResNet stem: 7x7 stride-2 conv via an exact 2x2 space-to-depth
    rewrite (the standard TPU ResNet stem transform).

    The literal stem (depth_models.py:95-131 / torchvision conv1) is a
    7x7s2 conv over 3 (or 3*in_images) channels — the tiny input-channel
    dim wastes most of the MXU contraction tile and the stride-2 halves
    data reuse. Exact rewrite: fold each 2x2 pixel block into channels
    (C -> 4C, [N,H,W,C] -> [N,H/2,W/2,4C]), zero-pad the kernel 7x7 ->
    8x8 at the leading row/column, and regroup it as 4x4 over the folded
    channels; the stride-2 7x7 conv becomes a stride-1 4x4 conv with
    asymmetric (2,1) padding. Same 7*7*C multiply-adds per output in a
    different grouping — equal to the literal conv up to f32 accumulation
    order (pinned in test_models).

    The parameter tree is IDENTICAL to the literal ``nn.Conv`` (a single
    ``kernel`` of shape [7,7,C,features]) so checkpoints and the
    torchvision importer (models/torch_import.py) are unaffected.
    """

    features: int = 64
    dtype: Dtype = jnp.float32
    kernel_init: Callable = kaiming_out

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        w = self.param("kernel", self.kernel_init,
                       (7, 7, in_ch, self.features), jnp.float32)
        n, h, wd = x.shape[0], x.shape[1], x.shape[2]
        if h % 2 == 0 and wd % 2 == 0 and in_ch <= 8:
            # input fold: channel = (row parity a)*2 + (col parity b), minor c
            v = x.astype(self.dtype).reshape(n, h // 2, 2, wd // 2, 2, in_ch)
            v = v.transpose(0, 1, 3, 2, 4, 5).reshape(
                n, h // 2, wd // 2, 4 * in_ch)
            # kernel fold: tap u = 2*pa + a - 1 (u = -1 is the zero pad row)
            kpad = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
            k2 = kpad.reshape(4, 2, 4, 2, in_ch, self.features)
            k2 = k2.transpose(0, 2, 1, 3, 4, 5).reshape(
                4, 4, 4 * in_ch, self.features)
            y = conv2d_op(v, k2.astype(self.dtype),
                          padding=((2, 1), (2, 1)))
        else:
            y = conv2d_op(x.astype(self.dtype), w.astype(self.dtype),
                          stride=(2, 2), padding=((3, 3), (3, 3)))
        return y


class GroupNorm16(nn.Module):
    """GroupNorm with 16 groups, f32 statistics (pose_models.py:49,82)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=16, epsilon=1e-5, dtype=jnp.float32)(
            x.astype(jnp.float32)
        ).astype(self.dtype)


class ConvGN(nn.Module):
    """WSConv(stride 2, same-ish pad) + GroupNorm(16) + ReLU (pose_models.py:62-84)."""

    features: int
    kernel: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = WSConv(
            self.features, kernel=self.kernel, stride=2,
            padding=(self.kernel - 1) // 2, dtype=self.dtype,
        )(x)
        x = GroupNorm16(dtype=self.dtype)(x)
        return nn.relu(x)


def upsample2x_nearest(x: jax.Array) -> jax.Array:
    """Nearest-neighbour 2x upsample, NHWC (depth_models.py:37-47).

    Implemented as reshape-broadcast (cheaper for XLA than gather-based
    ``jax.image.resize``).
    """
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def resize_nearest(x: jax.Array, h: int, w: int) -> jax.Array:
    """Nearest resize to (h, w) for NHWC, matching F.interpolate('nearest')."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, h, w, c), method="nearest")
