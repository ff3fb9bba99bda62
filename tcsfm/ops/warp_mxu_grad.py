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

from tcsfm.ops.warp_mxu import (LANE, ROWS_PER_GROUP, _band_bases,
                                _col_bases, _round_up)


def _make_bwd_kernel(C: int, H: int, Wp: int, BV: int):
    """Backward kernel with the forward's column banding: per 128-col
    output tile, all 8 rows' (row, tap) selector columns batch into one
    matmul N dim, and only the ≤2 source-column chunks under the tile's
    scalar-prefetched base run — for BOTH the tap-value matmul (R4, feeds
    d_coords) and the transposed d_img contraction (which additionally
    sums over the 8 rows inside one dot_general)."""
    G = ROWS_PER_GROUP
    T = Wp // LANE
    NCHUNK = min(3, T)
    NW = G * 2 * LANE                # (row, tap)-batched N width

    def kernel(base_ref, cb_ref, x_ref, y_ref, g_ref, img_ref, dimg_zero_ref,
               dx_ref, dy_ref, dimg_ref, s_scratch, acc_scratch, racc,
               io_scratch, sem):
        b = pl.program_id(0)
        g_idx = pl.program_id(1)
        idx = b * (H // G) + g_idx
        base = pl.multiple_of(base_ref[idx], 8)

        # source band DMA: one fused strided [C, BV, Wp] copy (forward's
        # round-3 fix — C separate copies paid C issue/wait round-trips)
        dma = pltpu.make_async_copy(
            img_ref.at[b, :, pl.ds(base, BV), :],
            s_scratch,
            sem,
        )
        dma.start()
        dma.wait()

        basef = base.astype(jnp.float32)
        v_ids = lax.broadcasted_iota(jnp.int32, (BV, LANE), 0).astype(
            jnp.float32)
        ci = lax.broadcasted_iota(jnp.int32, (LANE, NW), 0)

        S = s_scratch[...].reshape(C * BV, Wp)
        S_hi = S.astype(jnp.bfloat16)
        S_lo = (S - S_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        S2 = jnp.concatenate([S_hi, S_lo], axis=0)          # hi/lo split:
        # single-pass bf16 tap values cost ~2% on d_coords (cancellation in
        # Rs - Rm); the split restores f32-level accuracy
        M = C * BV

        acc_scratch[:, :] = jnp.zeros_like(acc_scratch)

        for t in range(T):
            sl = slice(t * LANE, (t + 1) * LANE)
            # per-row f, ty, ty' and the (row, tap)-batched selector cols
            xi_pieces, tys, dtys, fs = [], [], [], []
            for r in range(G):
                x = x_ref[0, r, sl].reshape(1, LANE)
                y = y_ref[0, r, sl].reshape(1, LANE)
                xi_r = jnp.floor(x)
                fs.append(x - xi_r)
                xi_i = xi_r.astype(jnp.int32)
                xi_pieces.append(xi_i)
                xi_pieces.append(xi_i + 1)
                ydiff = y - (v_ids + basef)                 # [BV, LANE]
                tys.append(jnp.maximum(0.0, 1.0 - jnp.abs(ydiff)))
                dtys.append(jnp.where(jnp.abs(ydiff) < 1.0,
                                      -jnp.sign(ydiff), 0.0))
            xi_flat = jnp.concatenate(xi_pieces, axis=1)    # [1, NW]

            # (ty ⊗ g) per row, channel-major; W01 in the AA column layout
            gtys, gdtys, w01_pieces = [], [], []
            for r in range(G):
                gty_parts, gdty_parts = [], []
                for ch in range(C):
                    g_row = g_ref[0, ch, r, sl].reshape(1, LANE)
                    gty_parts.append(tys[r] * g_row)
                    gdty_parts.append(dtys[r] * g_row)
                gty = jnp.concatenate(gty_parts, axis=0)    # [M, LANE]
                gtys.append(gty)
                gdtys.append(jnp.concatenate(gdty_parts, axis=0))
                w01_pieces.append((gty * (1.0 - fs[r])).astype(jnp.bfloat16))
                w01_pieces.append((gty * fs[r]).astype(jnp.bfloat16))
            W01 = jnp.concatenate(w01_pieces, axis=1)       # [M, NW]

            cbv = cb_ref[idx, t]
            cb0 = cbv // LANE
            n3 = cbv % 2                    # third-chunk bit (_col_bases)
            racc[...] = jnp.zeros_like(racc)

            def chunk_body(c):
                cig = ci + c * LANE
                AA = (cig == xi_flat).astype(jnp.bfloat16)  # [LANE, NW]
                racc[...] += jnp.dot(S2[:, c * LANE:(c + 1) * LANE], AA,
                                     preferred_element_type=jnp.float32)
                # d_band[:, chunk] += Σ_{r,tap,j} W01·selᵀ — the row sum
                # rides the contraction (right-hand, no transpose)
                acc_scratch[:, c * LANE:(c + 1) * LANE] += lax.dot_general(
                    W01, AA,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                           # [M, LANE(c)]

            for c in range(T):
                if T > NCHUNK:
                    pl.when((c == cb0) | (c == cb0 + 1)
                            | ((c == cb0 + 2) & (n3 == 1)))(
                        functools.partial(chunk_body, c))
                else:
                    chunk_body(c)

            R4 = racc[...]
            for r in range(G):
                o0, o1 = 2 * r * LANE, (2 * r + 1) * LANE
                Rm = R4[0:M, o0:o0 + LANE] + R4[M:2 * M, o0:o0 + LANE]
                Rs = R4[0:M, o1:o1 + LANE] + R4[M:2 * M, o1:o1 + LANE]
                Rcomb = Rm * (1.0 - fs[r]) + Rs * fs[r]     # [M, LANE]
                dx_ref[0, r, sl] = jnp.sum(gtys[r] * (Rs - Rm), axis=0)
                dy_ref[0, r, sl] = jnp.sum(gdtys[r] * Rcomb, axis=0)

        # read-modify-write the overlapping d_img band: one fused read,
        # one vector add over all channels, one fused write (was 2C DMAs)
        dma = pltpu.make_async_copy(
            dimg_ref.at[b, :, pl.ds(base, BV), :],
            io_scratch,
            sem,
        )
        dma.start()
        dma.wait()
        io_scratch[...] += acc_scratch[...].reshape(C, BV, Wp)
        dma = pltpu.make_async_copy(
            io_scratch,
            dimg_ref.at[b, :, pl.ds(base, BV), :],
            sem,
        )
        dma.start()
        dma.wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("band", "interpret"))
def grid_sample_mxu_bwd(img_chw: jax.Array, x_p: jax.Array, y_p: jax.Array,
                        base: jax.Array, colbase: jax.Array, g_chw: jax.Array,
                        band: int, interpret: bool = False):
    """Raw backward launcher (operands already in kernel layout).

    img_chw/g_chw: [B, C, H, Wp]; x_p/y_p: [B, H, Wp] pixel coords;
    base: [B*H/8] int32; colbase: [B*H/8, Wp/128] int32 (from
    ``_col_bases``). Returns (d_img_chw [B, C, H, Wp],
    dx [B, H, Wp], dy [B, H, Wp]) in PIXEL units.
    """
    B, C, H, Wp = img_chw.shape
    BV = band
    G = ROWS_PER_GROUP

    kernel = _make_bwd_kernel(C, H, Wp, BV)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, H // G),
        in_specs=[
            pl.BlockSpec((1, G, Wp), lambda b, g, base, cb: (b, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, Wp), lambda b, g, base, cb: (b, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, G, Wp), lambda b, g, base, cb: (b, 0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # img
            pl.BlockSpec(memory_space=pltpu.ANY),   # dimg zeros (aliased)
        ],
        out_specs=[
            pl.BlockSpec((1, G, Wp), lambda b, g, base, cb: (b, g, 0),
                         memory_space=pltpu.VMEM),   # dx
            pl.BlockSpec((1, G, Wp), lambda b, g, base, cb: (b, g, 0),
                         memory_space=pltpu.VMEM),   # dy
            pl.BlockSpec(memory_space=pltpu.ANY),    # d_img accumulator
        ],
        scratch_shapes=[
            pltpu.VMEM((C, BV, Wp), jnp.float32),    # S band
            pltpu.VMEM((C * BV, Wp), jnp.float32),   # accumulation
            pltpu.VMEM((2 * C * BV, G * 2 * LANE), jnp.float32),  # racc
            pltpu.VMEM((C, BV, Wp), jnp.float32),    # r/m/w staging
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
        # zeros input (index 6 incl. the scalar-prefetch args) aliases the
        # d_img output (index 2)
        input_output_aliases={6: 2},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(base, colbase, x_p, y_p, g_chw, img_chw, zeros)
    return dimg, dx, dy
