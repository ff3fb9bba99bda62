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

``grad_ch`` restricts the d_img computation to the channels whose
cotangent is actually consumed. In this framework the sampled RGB
channels are always *data* (source video frames — no parameter ever
feeds them), so the training graph only needs d_img for the resampled
source-DEPTH channel (losses) or for no channel at all (the solver's
pose-only warps). Skipping the dead channels removes their transposed
matmuls, their (ty ⊗ g) staging, and — for ``grad_ch=()`` — the whole
sequential read-modify-write DMA chain, leaving a pure dx/dy kernel.
d_coords is unaffected: it sums the upstream gradient over ALL channels.

Tap-value precision: channels in ``u8_ch`` (k/255-valued uint8-sourced
frames — the forward's "uint8" mode) use the same 255x-integer
single-pass trick as the forward: f32-exact tap values at HALF the
matmul rows of the hi/lo split. Every other channel always runs hi/lo
regardless of the forward's speed mode — gradient quality never follows
a lossy forward setting (single-pass bf16 taps cost ~2% on d_coords via
cancellation in Rs − Rm).
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


def _make_bwd_kernel(C: int, H: int, Wp: int, BV: int, grad_ch: tuple,
                     u8_ch: tuple):
    """Backward kernel with the forward's column banding: per 128-col
    output tile, all 8 rows' (row, tap) selector columns batch into one
    matmul N dim, and only the ≤2 source-column chunks under the tile's
    scalar-prefetched base run — for BOTH the tap-value matmul (R4, feeds
    d_coords) and the transposed d_img contraction (which additionally
    sums over the 8 rows inside one dot_general). The d_img side runs
    only for ``grad_ch`` channels; tap values run 255x-exact for
    ``u8_ch`` channels and hi/lo for the rest (see module docstring)."""
    G = ROWS_PER_GROUP
    T = Wp // LANE
    NCHUNK = min(3, T)
    NW = G * 2 * LANE                # (row, tap)-batched N width
    Cg = len(grad_ch)
    u8_ch = tuple(sorted(u8_ch))
    hilo_ch = tuple(c for c in range(C) if c not in u8_ch)

    def kernel(base_ref, cb_ref, x_ref, y_ref, g_ref, img_ref, *rest):
        if Cg:
            (dimg_zero_ref, dx_ref, dy_ref, dimg_ref,
             s_scratch, acc_scratch, racc, io_scratch, sem) = rest
        else:
            dx_ref, dy_ref, s_scratch, racc, sem = rest

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
        if u8_ch:
            # 255x-integer rows for uint8-sourced channels (exact in bf16;
            # the readout folds 1/255 into the per-channel g weight)
            row_ch = lax.broadcasted_iota(jnp.int32, (C * BV, Wp), 0) // BV
            is_u8 = row_ch == u8_ch[0]
            for ch in u8_ch[1:]:
                is_u8 = is_u8 | (row_ch == ch)
            S_hi = jnp.where(is_u8, jnp.round(S * 255.0),
                             S).astype(jnp.bfloat16)
        else:
            S_hi = S.astype(jnp.bfloat16)
        M = C * BV
        if hilo_ch:
            S_lo = (S - S_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            lo_blocks = [S_lo[ch * BV:(ch + 1) * BV, :] for ch in hilo_ch]
            S2 = jnp.concatenate([S_hi] + lo_blocks, axis=0)
        else:
            S2 = S_hi

        if Cg:
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

            # per-(row, channel) g-weighted tents; W01 (d_img only) holds
            # just the grad_ch channels in the AA column layout
            gtys, gdtys, w01_pieces = [], [], []
            for r in range(G):
                gty_ch, gdty_ch, gty_grad_parts = [], [], []
                for ch in range(C):
                    g_row = g_ref[0, ch, r, sl].reshape(1, LANE)
                    gty = tys[r] * g_row
                    if ch in grad_ch:
                        gty_grad_parts.append(gty)
                    if ch in u8_ch:
                        # fold the 255x undo into the d_coords weights
                        # (NOT into W01 — d_img never touches S)
                        gty_ch.append(gty * (1.0 / 255.0))
                        gdty_ch.append(dtys[r] * g_row * (1.0 / 255.0))
                    else:
                        gty_ch.append(gty)
                        gdty_ch.append(dtys[r] * g_row)
                gtys.append(gty_ch)
                gdtys.append(gdty_ch)
                if Cg:
                    gg = jnp.concatenate(gty_grad_parts, axis=0)
                    w01_pieces.append((gg * (1.0 - fs[r])).astype(jnp.bfloat16))
                    w01_pieces.append((gg * fs[r]).astype(jnp.bfloat16))
            if Cg:
                W01 = jnp.concatenate(w01_pieces, axis=1)   # [Cg·BV, NW]

            cbv = cb_ref[idx, t]
            cb0 = cbv // LANE
            n3 = cbv % 2                    # third-chunk bit (_col_bases)
            racc[...] = jnp.zeros_like(racc)

            def chunk_body(c):
                cig = ci + c * LANE
                AA = (cig == xi_flat).astype(jnp.bfloat16)  # [LANE, NW]
                racc[...] += jnp.dot(S2[:, c * LANE:(c + 1) * LANE], AA,
                                     preferred_element_type=jnp.float32)
                if Cg:
                    # d_band[:, chunk] += Σ_{r,tap,j} W01·selᵀ — the row
                    # sum rides the contraction (right-hand, no transpose)
                    acc_scratch[:, c * LANE:(c + 1) * LANE] += lax.dot_general(
                        W01, AA,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                                       # [Cg·BV, LANE(c)]

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
                dx_acc = None
                dy_acc = None
                for ch in range(C):
                    Rm = R4[ch * BV:(ch + 1) * BV, o0:o0 + LANE]
                    Rs = R4[ch * BV:(ch + 1) * BV, o1:o1 + LANE]
                    if ch in hilo_ch:
                        k = M + hilo_ch.index(ch) * BV
                        Rm = Rm + R4[k:k + BV, o0:o0 + LANE]
                        Rs = Rs + R4[k:k + BV, o1:o1 + LANE]
                    Rcomb = Rm * (1.0 - fs[r]) + Rs * fs[r]  # [BV, LANE]
                    dxc = jnp.sum(gtys[r][ch] * (Rs - Rm), axis=0)
                    dyc = jnp.sum(gdtys[r][ch] * Rcomb, axis=0)
                    dx_acc = dxc if dx_acc is None else dx_acc + dxc
                    dy_acc = dyc if dy_acc is None else dy_acc + dyc
                dx_ref[0, r, sl] = dx_acc
                dy_ref[0, r, sl] = dy_acc

        if Cg:
            # read-modify-write the overlapping d_img band: one fused read,
            # one vector add over all grad channels, one fused write
            dma = pltpu.make_async_copy(
                dimg_ref.at[b, :, pl.ds(base, BV), :],
                io_scratch,
                sem,
            )
            dma.start()
            dma.wait()
            io_scratch[...] += acc_scratch[...].reshape(Cg, BV, Wp)
            dma = pltpu.make_async_copy(
                io_scratch,
                dimg_ref.at[b, :, pl.ds(base, BV), :],
                sem,
            )
            dma.start()
            dma.wait()

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("band", "interpret", "grad_ch", "u8"))
def grid_sample_mxu_bwd(img_chw: jax.Array, x_p: jax.Array, y_p: jax.Array,
                        base: jax.Array, colbase: jax.Array, g_chw: jax.Array,
                        band: int, interpret: bool = False,
                        grad_ch=None, u8: tuple = ()):
    """Raw backward launcher (operands already in kernel layout).

    img_chw/g_chw: [B, C, H, Wp]; x_p/y_p: [B, H, Wp] pixel coords;
    base: [B*H/8] int32; colbase: [B*H/8, Wp/128] int32 (from
    ``_col_bases``). ``grad_ch``: channels whose d_img is computed
    (None → all). ``u8``: k/255-valued channels (255x single-pass exact
    tap values; the rest run hi/lo). Returns (d_img_chw
    [B, len(grad_ch), H, Wp] or None, dx [B, H, Wp], dy [B, H, Wp]) in
    PIXEL units.
    """
    B, C, H, Wp = img_chw.shape
    BV = band
    G = ROWS_PER_GROUP
    grad_ch = tuple(range(C)) if grad_ch is None else tuple(
        sorted(int(c) for c in grad_ch))
    u8_ch = tuple(sorted(int(c) for c in u8))
    Cg = len(grad_ch)
    R = (2 * C - len(u8_ch)) * BV    # hi rows + lo rows for non-u8 channels

    kernel = _make_bwd_kernel(C, H, Wp, BV, grad_ch, u8_ch)
    row_spec = pl.BlockSpec((1, G, Wp), lambda b, g, base, cb: (b, g, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [
        row_spec,                                   # x
        row_spec,                                   # y
        pl.BlockSpec((1, C, G, Wp), lambda b, g, base, cb: (b, 0, g, 0),
                     memory_space=pltpu.VMEM),      # g
        pl.BlockSpec(memory_space=pltpu.ANY),       # img
    ]
    out_specs = [row_spec, row_spec]                # dx, dy
    out_shape = [
        jax.ShapeDtypeStruct((B, H, Wp), jnp.float32),
        jax.ShapeDtypeStruct((B, H, Wp), jnp.float32),
    ]
    scratch = [pltpu.VMEM((C, BV, Wp), jnp.float32)]     # S band
    if Cg:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))  # dimg zeros
        out_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))  # d_img acc
        out_shape.append(jax.ShapeDtypeStruct((B, Cg, H, Wp), jnp.float32))
        scratch.append(pltpu.VMEM((Cg * BV, Wp), jnp.float32))  # accumulation
    scratch.append(pltpu.VMEM((R, G * 2 * LANE), jnp.float32))  # racc
    if Cg:
        scratch.append(pltpu.VMEM((Cg, BV, Wp), jnp.float32))  # r/m/w staging
    scratch.append(pltpu.SemaphoreType.DMA)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, H // G),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    if Cg:
        zeros = jnp.zeros((B, Cg, H, Wp), jnp.float32)
        # zeros input (index 6 incl. the scalar-prefetch args) aliases the
        # d_img output (index 2)
        dx, dy, dimg = pl.pallas_call(
            kernel,
            out_shape=tuple(out_shape),
            grid_spec=grid_spec,
            input_output_aliases={6: 2},
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(base, colbase, x_p, y_p, g_chw, img_chw, zeros)
        return dimg, dx, dy
    dx, dy = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid_spec=grid_spec,
        interpret=interpret,
    )(base, colbase, x_p, y_p, g_chw, img_chw)
    return None, dx, dy
