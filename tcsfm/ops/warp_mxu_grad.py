"""Backward pass of the MXU grid sampler — custom VJP kernels.

The gradients have the same banded-matmul structure as the forward
(tcsfm/ops/warp_mxu.py):

  dout/dx[j]  = Σ_v ty[v,j] · (S[v, ⌊x⌋+1] − S[v, ⌊x⌋])      (tap difference)
  dout/dy[j]  = Σ_v ty'[v,j] · bilinear_x(S)[v, j]
  d_img[r, c] = Σ_{i,j: r∈band(i)} ty[v,j]·g[ch,j]·(selector weights)

d_img is a transposed (scatter) matmul: per output row, the contribution
to the source band is ``(ty ⊗ g) · selᵀ`` — expressed via ``dot_general``
with a right-hand contraction so no matrix transpose materializes — and
bands of consecutive row groups overlap, so the kernel accumulates into
the d_img buffer with sequential read-modify-write DMAs (TPU grids run
grid steps in order on the core).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tcsfm.ops.warp_mxu import ROWS_PER_GROUP, _band_bases, _round_up


def _make_bwd_kernel(C: int, H: int, Wp: int, BV: int):
    G = ROWS_PER_GROUP

    def kernel(base_ref, x_ref, y_ref, g_ref, img_ref, dimg_zero_ref,
               dx_ref, dy_ref, dimg_ref, s_scratch, acc_scratch, io_scratch,
               sem):
        b = pl.program_id(0)
        g_idx = pl.program_id(1)
        base = pl.multiple_of(base_ref[b * (H // G) + g_idx], 8)

        # source band DMA (as in the forward)
        for ch in range(C):
            dma = pltpu.make_async_copy(
                img_ref.at[b, ch, pl.ds(base, BV), :],
                s_scratch.at[pl.ds(ch * BV, BV), :],
                sem,
            )
            dma.start()
            dma.wait()

        basef = base.astype(jnp.float32)
        v_ids = lax.broadcasted_iota(jnp.int32, (BV, Wp), 0).astype(jnp.float32)
        ci = lax.broadcasted_iota(jnp.int32, (Wp, Wp), 0)

        S = s_scratch[:, :]
        S_hi = S.astype(jnp.bfloat16)
        S_lo = (S - S_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        S2 = jnp.concatenate([S_hi, S_lo], axis=0)          # hi/lo split:
        # single-pass bf16 tap values cost ~2% on d_coords (cancellation in
        # Rs - Rm); the split restores f32-level accuracy
        M = C * BV

        acc_scratch[:, :] = jnp.zeros_like(acc_scratch)

        for r in range(G):
            x = x_ref[0, r, :].reshape(1, Wp)
            y = y_ref[0, r, :].reshape(1, Wp)
            xi = jnp.floor(x)
            f = x - xi
            xi_i = xi.astype(jnp.int32)
            A0 = (ci == xi_i).astype(jnp.bfloat16)
            A1 = (ci == xi_i + 1).astype(jnp.bfloat16)
            AA = jnp.concatenate([A0, A1], axis=1)          # [Wp, 2Wp]

            R4 = jnp.dot(S2, AA, preferred_element_type=jnp.float32)
            Rm = R4[0:M, 0:Wp] + R4[M:2 * M, 0:Wp]
            Rs = R4[0:M, Wp:] + R4[M:2 * M, Wp:]
            Rcomb = Rm * (1.0 - f) + Rs * f                 # [M, Wp]

            ydiff = y - (v_ids + basef)                     # [BV, Wp]
            ty = jnp.maximum(0.0, 1.0 - jnp.abs(ydiff))
            dty = jnp.where(jnp.abs(ydiff) < 1.0, -jnp.sign(ydiff), 0.0)

            # assemble (ty ⊗ g) and (ty' ⊗ g), channel-major rows
            gty_parts = []
            gdty_parts = []
            for ch in range(C):
                g_row = g_ref[0, ch, r, :].reshape(1, Wp)
                gty_parts.append(ty * g_row)
                gdty_parts.append(dty * g_row)
            gty = jnp.concatenate(gty_parts, axis=0)        # [M, Wp]
            gdty = jnp.concatenate(gdty_parts, axis=0)

            dx_ref[0, r, :] = jnp.sum(gty * (Rs - Rm), axis=0)
            dy_ref[0, r, :] = jnp.sum(gdty * Rcomb, axis=0)

            # d_band += gty·(1-f) @ A0ᵀ + gty·f @ A1ᵀ  (contraction over j,
            # expressed with a right-hand contraction — no transpose)
            W01 = jnp.concatenate(
                [(gty * (1.0 - f)), (gty * f)], axis=1
            ).astype(jnp.bfloat16)                          # [M, 2Wp]
            contrib = lax.dot_general(
                W01, AA,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                               # [M, Wp(c)]
            acc_scratch[:, :] += contrib

        # read-modify-write the overlapping d_img band, per channel
        for ch in range(C):
            dma = pltpu.make_async_copy(
                dimg_ref.at[b, ch, pl.ds(base, BV), :],
                io_scratch.at[pl.ds(0, BV), :],
                sem,
            )
            dma.start()
            dma.wait()
            io_scratch[pl.ds(0, BV), :] += acc_scratch[pl.ds(ch * BV, BV), :]
            dma = pltpu.make_async_copy(
                io_scratch.at[pl.ds(0, BV), :],
                dimg_ref.at[b, ch, pl.ds(base, BV), :],
                sem,
            )
            dma.start()
            dma.wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("band", "interpret"))
def grid_sample_mxu_bwd(img_chw: jax.Array, x_p: jax.Array, y_p: jax.Array,
                        base: jax.Array, g_chw: jax.Array,
                        band: int, interpret: bool = False):
    """Raw backward launcher (operands already in kernel layout).

    img_chw/g_chw: [B, C, H, Wp]; x_p/y_p: [B, H, Wp] pixel coords;
    base: [B*H/8] int32. Returns (d_img_chw [B, C, H, Wp],
    dx [B, H, Wp], dy [B, H, Wp]) in PIXEL units.
    """
    B, C, H, Wp = img_chw.shape
    BV = band
    G = ROWS_PER_GROUP

    kernel = _make_bwd_kernel(C, H, Wp, BV)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H // G),
        in_specs=[
            pl.BlockSpec((1, G, Wp), lambda b, g, base: (b, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, Wp), lambda b, g, base: (b, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, G, Wp), lambda b, g, base: (b, 0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # img
            pl.BlockSpec(memory_space=pltpu.ANY),   # dimg zeros (aliased)
        ],
        out_specs=[
            pl.BlockSpec((1, G, Wp), lambda b, g, base: (b, g, 0),
                         memory_space=pltpu.VMEM),   # dx
            pl.BlockSpec((1, G, Wp), lambda b, g, base: (b, g, 0),
                         memory_space=pltpu.VMEM),   # dy
            pl.BlockSpec(memory_space=pltpu.ANY),    # d_img accumulator
        ],
        scratch_shapes=[
            pltpu.VMEM((C * BV, Wp), jnp.float32),   # S band
            pltpu.VMEM((C * BV, Wp), jnp.float32),   # accumulation
            pltpu.VMEM((BV, Wp), jnp.float32),       # r/m/w staging
            pltpu.SemaphoreType.DMA,
        ],
    )
    zeros = jnp.zeros((B, C, H, Wp), jnp.float32)
    dx, dy, dimg = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Wp), jnp.float32),
            jax.ShapeDtypeStruct((B, H, Wp), jnp.float32),
            jax.ShapeDtypeStruct((B, C, H, Wp), jnp.float32),
        ),
        grid_spec=grid_spec,
        # zeros input (index 5 incl. the scalar-prefetch arg) aliases the
        # d_img output (index 2)
        input_output_aliases={5: 2},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(base, x_p, y_p, g_chw, img_chw, zeros)
    return dimg, dx, dy
