"""Fused decoder-tail Pallas kernel: the depth decoder's full-resolution
stage — ELU → iconv4 (3x3, 32→32) → ELU → feature conv (3x3, 32→8) → ELU →
disparity head (3x3, 8→1) → sigmoid — computed entirely in PHASE SPACE on
the half-resolution grid.

Why: these three reflect-pad convs run at full image resolution with 32/8/1
channels. XLA executes them lane-starved and layout-bound — measured
20.6 ms of the 30 ms depth forward at med-res/18 images (see
PERFORMANCE.md), despite ~140 MB of actual traffic (~0.2 ms at HBM speed).
The kernel reads the upconv's subpixel (pre-depth-to-space) output once,
keeps every intermediate in VMEM, and evaluates each conv as one im2col
matmul per output phase.

Exactness: a full-resolution 3x3 conv, evaluated at output pixel
u = 2i + q (phase q), reads full-res rows u+dy which map to half-res rows
i + (q+dy)//2 at phase (q+dy) mod 2 — a 2x2 half-res window per phase. The
reference's reflect padding maps full-res row -1 to row 1 = half-res row 0
phase 1, i.e. *edge replication of the phase tensor* reproduces reflect
padding exactly for the +/-1 taps used here (same argument as
layers._PhaseConv3x3, models/depth_models.py:19-35 semantics). All four
phases share one [9*Cin, Cout] weight matrix (the taps' im2col reshape);
only the slice offsets differ per phase.

Training: ``decoder_tail`` carries a custom VJP whose backward recomputes
through the XLA reference formulation (the kernel is used on the forward
hot path; gradients stay bit-faithful to the reference math).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 3   # chained 3x3 convs: out needs feat2 +-1, feat1 +-2, input +-3


def _elu(x):
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _phase_conv_layer(src_ref, patch_ref, dst, rows_out, cols_out, cin,
                      cout, w, b, act, src_elu=False):
    """One full-res 3x3 conv layer on phase-space VMEM refs.

    src_ref: [rows_out + 2, cols_out + 2, 4*cin] (1 halo row/col each
    side); taps are staged through ``patch_ref`` (im2col scratch) because
    Mosaic cannot concatenate lane-misaligned channel-block slices
    directly — stores re-layout. ``dst`` is either a scratch ref (channel
    blocks written per phase) or None, in which case the four phase
    outputs [rows_out, cols_out, cout] are returned as values.
    w: [9*cin, cout] (im2col reshape of the [3,3,cin,cout] kernel).
    """
    results = []
    for q in range(4):
        qi, qj = q // 2, q % 2
        t = 0
        for dy in (-1, 0, 1):
            di = (qi + dy) // 2 + 1          # src row offset (0..2)
            pi = (qi + dy) % 2
            for dx in (-1, 0, 1):
                dj = (qj + dx) // 2 + 1
                pj = (qj + dx) % 2
                p = 2 * pi + pj
                tap = src_ref[di:di + rows_out, dj:dj + cols_out,
                              p * cin:(p + 1) * cin]
                if src_elu:
                    tap = _elu(tap.astype(jnp.float32)).astype(jnp.bfloat16)
                patch_ref[0:rows_out, 0:cols_out,
                          t * cin:(t + 1) * cin] = tap
                t += 1
        patch = patch_ref[0:rows_out, 0:cols_out, 0:9 * cin]
        o = jnp.dot(patch.reshape(rows_out * cols_out, 9 * cin), w,
                    preferred_element_type=jnp.float32)
        o = act(o + b).reshape(rows_out, cols_out, cout)
        if dst is None:
            results.append(o)
        else:
            dst[0:rows_out, 0:cols_out,
                q * cout:(q + 1) * cout] = o.astype(jnp.bfloat16)
    return results


def _fix_bounds(ref, rows_used, cols_used, pad, is_first, is_last):
    """Edge-replicate a layer's halo where it falls outside the image.

    The reference re-applies reflect padding to every intermediate feature
    map; in phase space that is edge replication (module docstring). Halo
    values computed from out-of-image inputs are overwritten in-place:
    ``pad`` halo rows top/bottom (only at the first/last row tile) and
    ``pad`` halo cols left/right (every tile spans the full width).
    """
    for k in range(pad):
        ref[0:rows_used, k] = ref[0:rows_used, pad]
        ref[0:rows_used, cols_used - 1 - k] = ref[0:rows_used,
                                                  cols_used - 1 - pad]

    @pl.when(is_first)
    def _():
        for k in range(pad):
            ref[k, 0:cols_used] = ref[pad, 0:cols_used]

    @pl.when(is_last)
    def _():
        for k in range(pad):
            ref[rows_used - 1 - k, 0:cols_used] = ref[rows_used - 1 - pad,
                                                      0:cols_used]


def _tail_kernel(z_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                 out_ref, zbuf, patch, f1, f2, sem, *, rows, wl, c1, c2):
    n = pl.program_id(0)
    t = pl.program_id(1)
    is_first = t == 0
    is_last = t == pl.num_programs(1) - 1

    # rows [t*rows, t*rows + rows + 2*HALO) of the pre-padded input
    dma = pltpu.make_async_copy(
        z_ref.at[n, pl.ds(t * rows, rows + 2 * HALO), :, :], zbuf, sem)
    dma.start()
    dma.wait()

    # layer 1 (iconv4): ELU applied to taps as they are staged
    _phase_conv_layer(zbuf, patch, f1, rows + 4, wl + 4, c1, c1,
                      w1_ref[...], b1_ref[...], _elu, src_elu=True)
    # f1 covers image rows [t*rows - 2, t*rows + rows + 2) and cols
    # [-2, wl + 2): its outside-image halo must be replicated, not the
    # values computed from replicated z
    _fix_bounds(f1, rows + 4, wl + 4, 2, is_first, is_last)
    _phase_conv_layer(f1, patch, f2, rows + 2, wl + 2, c1, c2,
                      w2_ref[...], b2_ref[...], _elu)
    _fix_bounds(f2, rows + 2, wl + 2, 1, is_first, is_last)
    disp = _phase_conv_layer(f2, patch, None, rows, wl, c2, 1,
                             w3_ref[...], b3_ref[...], jax.nn.sigmoid)
    for q in range(4):
        out_ref[0, 0:rows, 0:wl, q:q + 1] = disp[q]     # [rows, wl, 1]


def _pick_rows(hl: int) -> int:
    # 8 rows keeps the tile's scratch + operand footprint well under the
    # VMEM budget (16 rows OOMed the 16 MB scoped limit at wl=320)
    for r in (8, 6, 4, 3, 2, 1):
        if hl % r == 0 and r <= hl:
            return r
    return hl


@functools.partial(jax.jit, static_argnames=("interpret",))
def _tail_forward(z, w1, b1, w2, b2, w3, b3, interpret: bool = False):
    n, hl, wl, c4 = z.shape
    c1 = c4 // 4
    c2 = w2.shape[-1]
    rows = _pick_rows(hl)

    # edge-replicate pre-pad (exact reflect, see module docstring); done in
    # XLA so the kernel's row DMA is one contiguous block. The padded
    # width is rounded up to the 8-sublane tile so the DMA slice is
    # tile-aligned (extra cols are dead).
    wp8 = -(-(wl + 2 * HALO) // 8) * 8
    zp = jnp.pad(z.astype(jnp.bfloat16),
                 ((0, 0), (HALO, HALO), (HALO, HALO), (0, 0)), mode="edge")
    zp = jnp.pad(zp, ((0, 0), (0, 0), (0, wp8 - (wl + 2 * HALO)), (0, 0)))

    w1r = w1.reshape(9 * c1, -1).astype(jnp.bfloat16)
    w2r = w2.reshape(9 * c1, -1).astype(jnp.bfloat16)
    w3r = w3.reshape(9 * c2, -1).astype(jnp.bfloat16)
    b1f = b1.astype(jnp.float32)
    b2f = b2.astype(jnp.float32)
    b3f = b3.astype(jnp.float32)

    kernel = functools.partial(_tail_kernel, rows=rows, wl=wl, c1=c1, c2=c2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n, hl // rows),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),        # zp (manual DMA)
            pl.BlockSpec(memory_space=pltpu.VMEM),       # w1r
            pl.BlockSpec(memory_space=pltpu.VMEM),       # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),       # w2r
            pl.BlockSpec(memory_space=pltpu.VMEM),       # b2
            pl.BlockSpec(memory_space=pltpu.VMEM),       # w3r
            pl.BlockSpec(memory_space=pltpu.VMEM),       # b3
        ],
        out_specs=pl.BlockSpec((1, rows, wl, 4),
                               lambda ni, ti: (ni, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * HALO, wp8, c4), jnp.bfloat16),
            pltpu.VMEM((rows + 4, wl + 4, 9 * c1), jnp.bfloat16),  # patch
            pltpu.VMEM((rows + 4, wl + 4, c4), jnp.bfloat16),      # f1
            pltpu.VMEM((rows + 2, wl + 2, 4 * c2), jnp.bfloat16),  # f2
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, hl, wl, 4), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(zp, w1r, b1f, w2r, b2f, w3r, b3f)


def _phase_to_space(y):
    """[N, Hl, Wl, 4] (phase = 2*pi + pj) → [N, 2*Hl, 2*Wl, 1]."""
    n, hl, wl, _ = y.shape
    y = y.reshape(n, hl, wl, 2, 2)
    return y.transpose(0, 1, 3, 2, 4).reshape(n, 2 * hl, 2 * wl, 1)


def _space_to_phase(x):
    """[N, H, W, C] → [N, H/2, W/2, 4*C] phase-block layout."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def decoder_tail_reference(z, w1, b1, w2, b2, w3, b3):
    """XLA reference: literal full-res formulation (d2s → reflect convs).

    Used for CPU paths, parity tests, and the kernel's backward pass.
    """
    n, hl, wl, c4 = z.shape
    c1 = c4 // 4
    x = z.reshape(n, hl, wl, 2, 2, c1).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(n, 2 * hl, 2 * wl, c1)

    def refl_conv(x, w, b):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        return jax.lax.conv_general_dilated(
            xp, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

    x = _elu(x.astype(jnp.float32))
    x = _elu(refl_conv(x, w1.astype(jnp.float32), b1))
    x = _elu(refl_conv(x, w2.astype(jnp.float32), b2))
    return jax.nn.sigmoid(refl_conv(x, w3.astype(jnp.float32), b3))


# test hook: CPU backends run the kernel in interpret mode
INTERPRET = False


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def decoder_tail(z, w1, b1, w2, b2, w3, b3):
    """Fused tail: phase input [N, Hl, Wl, 4*C1] → disparity [N, H, W, 1].

    Forward runs the Pallas kernel; backward differentiates the XLA
    reference formulation (identical math).
    """
    return _phase_to_space(
        _tail_forward(z, w1, b1, w2, b2, w3, b3, interpret=INTERPRET))


def _tail_fwd(z, w1, b1, w2, b2, w3, b3):
    return decoder_tail(z, w1, b1, w2, b2, w3, b3), (z, w1, b1, w2, b2, w3,
                                                     b3)


def _tail_bwd(res, g):
    _, vjp = jax.vjp(decoder_tail_reference, *res)
    return vjp(g)


decoder_tail.defvjp(_tail_fwd, _tail_bwd)


def make_tail_apply(depth_model, depth_vars):
    """imgs -> [disparity] through the fused tail kernel (the integration
    point that used to live in tcsfm.models.depth.make_depth_apply before
    this kernel was demoted to a documented negative result)."""
    from tcsfm.models.depth import DepthNet, tail_weights

    def apply_fn(imgs):
        skips = depth_model.apply(depth_vars, imgs, method=DepthNet.encode)
        z = depth_model.apply(depth_vars, skips,
                              method=DepthNet.decode_phase_tail)
        disp = decoder_tail(z, *tail_weights(depth_vars["params"]))
        return [disp.astype(z.dtype)]

    return apply_fn
