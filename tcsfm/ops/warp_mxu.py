"""MXU-based bilinear grid sampling — the framework's flagship Pallas kernel.

Why: XLA's TPU gather is pathologically slow for per-pixel bilinear
sampling (~100 ms for a 24x192x640 warp batch — measured; the gather unit
streams single elements). This kernel re-expresses the sampler as dense
math the TPU is built for:

  bilinear(y, x) = Σ_r Σ_c tent(y-r) · tent(x-c) · I[r, c]

For each group of 8 output rows, the source rows live in a narrow vertical
BAND (SfM warps are smooth: vertical parallax within a few output rows
spans a few source rows). The kernel:
  1. DMAs the band of source rows (contiguous!) into VMEM,
  2. builds the horizontal tent-weight matrix A[c, j] = tent(x_j - c)
     from an iota (no gather),
  3. computes R = S @ A on the MXU — every "gather" is now a matmul,
  4. applies the vertical tent weights on the VPU and writes the row.

Zeros-padding semantics (torch grid_sample align_corners=False) fall out
naturally: out-of-image tent taps hit zero-padded columns / missing rows
and contribute 0, and coordinates pushed out by the reference's OOB rule
(stn.py:224-228) land outside every tent support.

Exactness: results are exact bilinear whenever each 8-row group's vertical
source spread fits in ``band`` rows; pixels whose true source rows fall
outside the band sample as zeros (flagged by ``vertical_band_ok``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS_PER_GROUP = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


LANE = 128


def _make_kernel(C: int, H: int, Wp: int, BV: int, out_dtype,
                 exact_ch: tuple = (), u8_ch: tuple = (),
                 with_grads: bool = False):
    """Build the 8-output-rows-per-step sampling kernel.

    base_ref: [B*H/8] int32 (scalar prefetch) — vertical band start per
    row group. cb_ref: [B*H/8, T] int32 (scalar prefetch) — horizontal
    source-column chunk base per (group, 128-col output tile),
    128-aligned.
    x_ref, y_ref: [1, 8, Wp] f32 blocks — source coords for the group.
    img_ref: [B, C, H, Wp] in ANY/HBM — source image, channel-major.
    out_ref: [1, C, 8, Wp] output block.
    s_scratch: [C*BV, Wp] VMEM — the DMA'd source band, channel-major.
    racc: [R, G*2*LANE] f32 VMEM — per-tile matmul accumulator; all 8
    rows' (row, tap) selector columns are batched into one matmul N dim.
    exact_ch: channel indices sampled f32-exact (hi/lo split); the rest
    sample in one bf16 pass (~2e-3 abs — below 8-bit image quantization).
    u8_ch: channels whose values are k/255 with k uint8 (JPEG-decoded
    frames): sampled f32-exact in ONE bf16 pass — the block stores
    round(255*S) (integers <= 255 are exact in bf16, the two-tap selector
    sums <= 510 are exact in f32) and the read-out divides by 255. Half
    the matmul rows of the hi/lo split at identical accuracy for
    uint8-sourced data.

    Column banding: for each 128-wide tile of output columns, the source
    columns that its horizontal tents can touch span ≤ ~128 px of
    parallax in practice, so only the 2-3 source chunks covering
    [cb, cb+3*LANE) enter the matmul (the third conditionally, see
    ``_col_bases``) — the selector matrices for every other chunk are
    identically zero. The static chunk loop + a scalar ``pl.when`` keeps
    all slices lane-aligned; out-of-band pixels are flagged by
    ``band_coverage_mask`` exactly like the vertical band.

    ``with_grads``: additionally emit the spatial derivatives
    ∂out/∂x = Σ_v ty·(R₁−R₀) and ∂out/∂y = Σ_v ty'·blend(R₀,R₁) (pixel
    units) as two extra outputs — pure VPU readouts of the SAME matmul
    results (both taps are already computed), so the value+Jacobian
    sampler costs ~the value alone. This is what makes the sampler
    forward-mode differentiable (custom_jvp) for the Gauss-Newton/LM
    solvers, whose 7 jvps per iteration would otherwise pay 7 warps.
    """
    G = ROWS_PER_GROUP
    T = Wp // LANE
    NCHUNK = min(3, T)           # chunks that [cb, cb+CB) can span
    exact_ch = tuple(sorted(exact_ch))
    u8_ch = tuple(sorted(u8_ch))
    assert not set(exact_ch) & set(u8_ch), "a channel is hi/lo OR uint8"

    def kernel(base_ref, cb_ref, x_ref, y_ref, img_ref, *rest):
        if with_grads:
            out_ref, gx_ref, gy_ref, s_scratch, racc, sem = rest
        else:
            out_ref, s_scratch, racc, sem = rest
            gx_ref = gy_ref = None
        b = pl.program_id(0)
        g = pl.program_id(1)
        idx = b * (H // G) + g
        # bases are pre-rounded to sublane multiples; hint the compiler so
        # the strided DMA slice is provably tile-aligned
        base = pl.multiple_of(base_ref[idx], 8)

        # 1. DMA the vertical band: ONE strided [C, BV, Wp] copy (fused
        #    across channels — C separate copies paid C issue/wait
        #    round-trips for the same bytes)
        dma = pltpu.make_async_copy(
            img_ref.at[b, :, pl.ds(base, BV), :],
            s_scratch,
            sem,
        )
        dma.start()
        dma.wait()

        basef = base.astype(jnp.float32)
        # Mosaic iota must be integer-typed; cast to f32 where needed
        v_ids = lax.broadcasted_iota(jnp.int32, (BV, LANE), 0).astype(
            jnp.float32)
        ci = lax.broadcasted_iota(jnp.int32, (LANE, G * 2 * LANE), 0)

        # 2. Decompose the horizontal tent into BINARY selection:
        #      tent(x - c) = eq(c, ⌊x⌋)·(1-f) + eq(c, ⌊x⌋+1)·f,  f = x-⌊x⌋
        #    The matmul operands become exact 0/1 matrices (bf16-exact);
        #    the fractional weights apply as a cheap f32 column scale AFTER
        #    the matmul. Channels in ``exact_ch`` append an S_lo residual
        #    block so two plain-bf16 MXU passes reconstruct full f32
        #    accuracy; the rest sample from S_hi alone.
        # [C, BV, Wp] → [C*BV, Wp]: merging C into sublanes is layout-free
        # (BV is a sublane multiple)
        S = s_scratch[...].reshape(C * BV, Wp)
        if u8_ch:
            # uint8-sourced channels: store round(255*S) — exact integers
            # in bf16; the read-out divides by 255 (see docstring). The
            # round() recovers k exactly from the f32 representation of
            # k/255. Row mask from an iota (Pallas kernels cannot capture
            # array constants).
            row_ch = lax.broadcasted_iota(jnp.int32, (C * BV, Wp), 0) // BV
            is_u8 = row_ch == u8_ch[0]
            for ch in u8_ch[1:]:
                is_u8 = is_u8 | (row_ch == ch)
            S_hi = jnp.where(is_u8, jnp.round(S * 255.0),
                             S).astype(jnp.bfloat16)
        else:
            S_hi = S.astype(jnp.bfloat16)
        M = C * BV
        if exact_ch:
            S_lo = (S - S_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            lo_blocks = [S_lo[ch * BV:(ch + 1) * BV, :] for ch in exact_ch]
            S2 = jnp.concatenate([S_hi] + lo_blocks, axis=0)
        else:
            S2 = S_hi

        for t in range(T):
            # all 8 rows' tap columns batched into the matmul N dim:
            # xi_flat [1, G*2*LANE] = (row, tap) pairs of ⌊x⌋ values
            pieces = []
            for r in range(G):
                x_r = x_ref[0, r, t * LANE:(t + 1) * LANE].reshape(1, LANE)
                xi_r = jnp.floor(x_r).astype(jnp.int32)
                pieces.append(xi_r)
                pieces.append(xi_r + 1)
            xi_flat = jnp.concatenate(pieces, axis=1)       # [1, G*2*LANE]

            cbv = cb_ref[idx, t]
            cb0 = cbv // LANE                               # first chunk id
            n3 = cbv % 2                                    # third-chunk bit
            racc[...] = jnp.zeros_like(racc)

            def chunk_body(c):
                cig = ci + c * LANE                         # global col ids
                AA = (cig == xi_flat).astype(jnp.bfloat16)  # [LANE, G*2*L]
                racc[...] += jnp.dot(
                    S2[:, c * LANE:(c + 1) * LANE], AA,
                    preferred_element_type=jnp.float32)

            for c in range(T):
                if T > NCHUNK:
                    # static chunk loop + scalar guard: the 2 chunks under
                    # [cb, cb+2*LANE) always run; the third only when some
                    # tap in the tile reaches it (near-identity warps
                    # straddle the boundary; far-parallax tiles don't)
                    pl.when((c == cb0) | (c == cb0 + 1)
                            | ((c == cb0 + 2) & (n3 == 1)))(
                        functools.partial(chunk_body, c))
                else:
                    chunk_body(c)

            R2 = racc[...]
            for r in range(G):
                x = x_ref[0, r, t * LANE:(t + 1) * LANE].reshape(1, LANE)
                f = x - jnp.floor(x)                        # [1, LANE] f32
                y = y_ref[0, r, t * LANE:(t + 1) * LANE].reshape(1, LANE)
                ydiff = y - (v_ids + basef)                 # [BV, LANE]
                ty_t = jnp.maximum(0.0, 1.0 - jnp.abs(ydiff))
                if with_grads:
                    # d tent/dy per band row (subgradient 0 at |ydiff|=0/1,
                    # same convention as the backward kernel)
                    tyd_t = jnp.where(jnp.abs(ydiff) < 1.0,
                                      -jnp.sign(ydiff), 0.0)
                o0, o1 = 2 * r * LANE, (2 * r + 1) * LANE
                for ch in range(C):
                    Rc0 = R2[ch * BV:(ch + 1) * BV, o0:o0 + LANE]
                    Rc1 = R2[ch * BV:(ch + 1) * BV, o1:o1 + LANE]
                    if ch in exact_ch:
                        k = M + exact_ch.index(ch) * BV
                        Rc0 = Rc0 + R2[k:k + BV, o0:o0 + LANE]
                        Rc1 = Rc1 + R2[k:k + BV, o1:o1 + LANE]
                    if ch in u8_ch:
                        # undo the 255x integer scaling per tap, BEFORE
                        # the blend — mirrors the f32 path's fl(k/255)
                        Rc0 = Rc0 / 255.0
                        Rc1 = Rc1 / 255.0
                    Rc = Rc0 * (1.0 - f) + Rc1 * f          # [BV, LANE]
                    row = jnp.sum(ty_t * Rc, axis=0, keepdims=True)
                    sl_t = slice(t * LANE, (t + 1) * LANE)
                    out_ref[0, ch, r, sl_t] = row[0, :].astype(out_dtype)
                    if with_grads:
                        gx = jnp.sum(ty_t * (Rc1 - Rc0), axis=0,
                                     keepdims=True)
                        gy = jnp.sum(tyd_t * Rc, axis=0, keepdims=True)
                        gx_ref[0, ch, r, sl_t] = gx[0, :].astype(out_dtype)
                        gy_ref[0, ch, r, sl_t] = gy[0, :].astype(out_dtype)

    return kernel


def _band_bases(y: jax.Array, H: int, BV: int) -> jax.Array:
    """Band start per 8-row group: cover floor(min y) of non-pushed coords
    over the whole group, clipped to valid rows. y: [B, H, W]."""
    B, Hh, W = y.shape
    G = ROWS_PER_GROUP
    yg = y.reshape(B, Hh // G, G * W)
    pushed = yg > (H + 0.5)          # the OOB push lands at 1.5H - 0.5
    y_eff = jnp.where(pushed, jnp.float32(H), yg)
    ymin = jnp.min(y_eff, axis=-1)                        # [B, H/G]
    base = jnp.clip(jnp.floor(ymin), 0, max(H - BV, 0)).astype(jnp.int32)
    # round down to a sublane multiple so the band DMA is tile-aligned
    # (the +8 margin is budgeted into the caller's band size)
    return (base // 8) * 8


def _col_bases(x: jax.Array, W: int, Wp: int) -> jax.Array:
    """Horizontal chunk base per (8-row group, 128-col output tile):
    128-aligned start of the (≤ 3·LANE)-wide source-column window that
    the tile's horizontal tents read. x: [B, H, Wp] pixel coords
    (padded output columns hold far values).

    The window is nominally 2 chunks; a THIRD chunk flag is packed into
    the value's low bit when any tap reaches past base + 2·LANE — the
    128-alignment of the base can waste up to 127 columns, and a
    near-identity warp straddles the chunk boundary by a few pixels on
    EVERY tile (taps at 128·t ± ε span chunks t-1, t, t+1), so a hard
    2-chunk window would mask out ~1% of pixels at tile boundaries.

    Returns [B·H/G, T] int32: 128-aligned base + need-third-chunk bit.
    """
    B, Hh, Wpx = x.shape
    G = ROWS_PER_GROUP
    T = Wp // LANE
    CB = LANE * min(3, T)
    xt = x.reshape(B, Hh // G, G, T, LANE)
    pushed = xt > (W + 0.5)          # OOB-pushed coords land at 1.5W - 0.5
    x_lo = jnp.where(pushed, jnp.float32(W), xt)
    x_hi = jnp.where(pushed, jnp.float32(-W), xt)
    xmin = jnp.min(x_lo, axis=(2, 4))                     # [B, H/G, T]
    xmax = jnp.max(x_hi, axis=(2, 4))
    base = jnp.clip(jnp.floor(xmin), 0, max(Wp - CB, 0)).astype(jnp.int32)
    base = (base // LANE) * LANE
    # highest tap column actually read (in-image: taps outside [0, W-1]
    # contribute zero under the padding semantics)
    top = jnp.minimum(jnp.floor(xmax), W - 1.0).astype(jnp.int32) + 1
    need3 = (top >= base + 2 * LANE).astype(jnp.int32)
    return (base + need3).reshape(B * (Hh // G), T)


def band_coverage_mask(coords: jax.Array, H: int, band: int,
                       W: int = 0, Wp: int = 0) -> jax.Array:
    """Per-pixel flag: all source taps lie inside the windows the pixel's
    8-row group will read — i.e. the banded kernel's result for this pixel
    is exact bilinear. Pixels outside (including the pushed-OOB ones) may
    sample zeros; callers AND this into the warp valid mask so such
    pixels are treated like out-of-view instead of corrupting losses.

    Vertical: both y taps within the group's ``band``-row DMA window.
    Horizontal (when W/Wp given): both x taps within the column tile's
    chunk window [cb, cb + 2·LANE).

    Args: coords [B, H, W, 2] normalized; band = the BV actually used
    (from ``band_geometry``). Returns [B, H, W] bool.
    """
    y = ((coords[..., 1] + 1.0) * H - 1.0) * 0.5
    base = _band_bases(y, H, band)                        # [B, H/G]
    base_full = jnp.repeat(base, ROWS_PER_GROUP, axis=1)[..., None]
    # only IN-IMAGE taps need covering: out-of-image taps are zero by the
    # padding semantics in the banded and XLA samplers alike (valid
    # pixels can reach y in [-0.5, H-0.5) under the reference's
    # align_corners normalization quirk), and ceil (not floor+1) keeps
    # integer y at the band's last row exact (second tap weight 0).
    lo = jnp.maximum(jnp.floor(y), 0.0)
    hi = jnp.minimum(jnp.ceil(y), H - 1.0)
    ok = (lo >= base_full) & (hi <= base_full + band - 1)

    if W:
        B, Hh, Wx = y.shape
        T = Wp // LANE
        CB = LANE * min(3, T)
        if CB >= Wp:
            return ok                 # single window covers every column
        x = ((coords[..., 0] + 1.0) * W - 1.0) * 0.5
        x_p = jnp.pad(x, ((0, 0), (0, 0), (0, Wp - Wx)),
                      constant_values=jnp.float32(3 * Wp))
        cb = _col_bases(x_p, W, Wp).reshape(B, Hh // ROWS_PER_GROUP, T)
        cb = (cb // LANE) * LANE      # strip the need-third-chunk bit
        cb = jnp.repeat(cb, ROWS_PER_GROUP, axis=1)       # [B, H, T]
        cb = jnp.repeat(cb, LANE, axis=2)[:, :, :Wx].astype(jnp.float32)
        # the window is [cb, cb + 3*LANE): the third chunk runs exactly
        # when some tap in the tile needs it (same _col_bases bit)
        xlo = jnp.maximum(jnp.floor(x), 0.0)
        xhi = jnp.minimum(jnp.ceil(x), W - 1.0)
        ok = ok & (xlo >= cb) & (xhi <= cb + CB - 1)
    return ok


def horizontal_band_ok(coords: jax.Array, W: int, Wp: int) -> jax.Array:
    """Diagnostic: per-(group, tile) flag that the ≤3-chunk column window
    covers all valid source columns (conservative on chunk alignment)."""
    x = ((coords[..., 0] + 1.0) * W - 1.0) * 0.5
    B, Hh, Wx = x.shape
    T = Wp // LANE
    CB = LANE * min(3, T)
    if CB >= Wp:
        return jnp.ones((B, Hh // ROWS_PER_GROUP, 1), bool)
    pushed = x > (W + 0.5)
    x_lo = jnp.pad(jnp.where(pushed, jnp.float32(W), x),
                   ((0, 0), (0, 0), (0, Wp - Wx)),
                   constant_values=jnp.float32(W))
    x_hi = jnp.pad(jnp.where(pushed, jnp.float32(-W), x),
                   ((0, 0), (0, 0), (0, Wp - Wx)),
                   constant_values=jnp.float32(-W))
    G = ROWS_PER_GROUP
    xmin = jnp.min(x_lo.reshape(B, Hh // G, G, T, LANE), axis=(2, 4))
    xmax = jnp.max(x_hi.reshape(B, Hh // G, G, T, LANE), axis=(2, 4))
    # -2 for the bilinear taps, -(LANE-1) for chunk alignment of the base
    return (xmax - xmin) <= (CB - LANE - 2)


def vertical_band_ok(coords: jax.Array, H: int, band: int = 32) -> jax.Array:
    """Diagnostic: per-group flag that the band covers all valid source rows."""
    y = ((coords[..., 1] + 1.0) * H - 1.0) * 0.5
    B, Hh, W = y.shape
    G = ROWS_PER_GROUP
    yg = y.reshape(B, Hh // G, G * W)
    pushed = yg > (H + 0.5)
    y_min = jnp.min(jnp.where(pushed, jnp.float32(H), yg), axis=-1)
    y_max = jnp.max(jnp.where(pushed, jnp.float32(-H), yg), axis=-1)
    # -2 for the bilinear tap, -7 for the sublane rounding of the base
    return (y_max - y_min) <= (band - 9)


def band_geometry(H: int, W: int, band: int):
    """(BV, Wp): sublane-aligned band size and lane-padded width.

    Minimum viable band: 8 output rows/group + 2 bilinear taps + up to 7
    rows lost to sublane rounding of the base → 17, aligned up to 24.
    """
    assert H % ROWS_PER_GROUP == 0, f"H={H} must be a multiple of 8"
    BV = min(max(band, ROWS_PER_GROUP + 2 + 7), H)
    BV = max(_round_up(BV, 8), ROWS_PER_GROUP)
    return BV, _round_up(W, 128)


def _prep_layout(img: jax.Array, coords: jax.Array, BV: int, Wp: int):
    """Shared fwd/bwd layout prep: channel-major lane-padded image, padded
    pixel coords, per-group band bases."""
    B, H, W, C = img.shape
    x = ((coords[..., 0] + 1.0) * W - 1.0) * 0.5           # [B, H, W]
    y = ((coords[..., 1] + 1.0) * H - 1.0) * 0.5
    base = _band_bases(y, H, BV).reshape(-1)               # [B*H/8]

    img_chw = jnp.pad(
        img.transpose(0, 3, 1, 2).astype(jnp.float32),
        ((0, 0), (0, 0), (0, 0), (0, Wp - W)),
    )
    # pad x with a far value so the padded output columns sample zero
    pad_x = jnp.full((B, H, Wp - W), jnp.float32(3 * Wp))
    x_p = jnp.concatenate([x.astype(jnp.float32), pad_x], axis=-1)
    y_p = jnp.pad(y.astype(jnp.float32), ((0, 0), (0, 0), (0, Wp - W)))
    return img_chw, x_p, y_p, base


def _norm_exact(exact, u8, C: int) -> tuple:
    """Normalize the precision knobs to (exact_ch, u8_ch) tuples.

    exact: True → all channels hi/lo f32-exact; False → none (single
    bf16 pass); "uint8" → every channel via the 255x-integer single-pass
    exact path (uint8-sourced data); a tuple of channel indices → those
    channels hi/lo. u8: channel indices for the 255x path (removed from
    the hi/lo set)."""
    u8_ch = tuple(sorted(int(c) for c in u8))
    if exact == "uint8":
        return (), tuple(range(C))
    if exact is True:
        ex = tuple(range(C))
    elif exact is False:
        ex = ()
    else:
        ex = tuple(sorted(int(c) for c in exact))
    return tuple(c for c in ex if c not in u8_ch), u8_ch


@functools.partial(jax.jit,
                   static_argnames=("band", "interpret", "exact", "u8"))
def grid_sample_mxu(img: jax.Array, coords: jax.Array, band: int = 32,
                    interpret: bool = False, exact=True,
                    u8: tuple = ()) -> jax.Array:
    """Bilinear sampling with zeros padding, align_corners=False — MXU path.

    Args:
      img:    [B, H, W, C] source image. H must be a multiple of 8.
      coords: [B, H, W, 2] normalized (x, y) in the reference convention
              (2*(u/(W-1)) - 1, OOB pushed to 2.0).
      band:   vertical band size (source rows per 8-row output group).
      exact:  f32-accurate values (hi/lo split): True = all channels,
              False = none (single bf16 pass, ~2e-3 abs, half the matmul
              cost), "uint8" = all channels via the single-pass 255x
              integer path (f32-exact for uint8-sourced values k/255 at
              the single-pass cost), or a tuple of channel indices for
              mixed precision (only those channels pay the
              residual-matmul rows).
      u8:     channel indices routed through the 255x integer path
              (overrides their membership in ``exact``).

    Returns [B, H, W, C]; float32.
    """
    B, H, W, C = img.shape
    BV, Wp = band_geometry(H, W, band)
    img_chw, x_p, y_p, base = _prep_layout(img, coords, BV, Wp)
    colbase = _col_bases(x_p, W, Wp)

    exact_ch, u8_ch = _norm_exact(exact, u8, C)
    G = ROWS_PER_GROUP
    kernel = _make_kernel(C, H, Wp, BV, jnp.float32, exact_ch=exact_ch,
                          u8_ch=u8_ch)
    R = (C + len(exact_ch)) * BV      # S2 row count (hi + lo blocks)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, H // G),
        in_specs=[
            pl.BlockSpec((1, G, Wp), lambda b, g, base, cb: (b, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, Wp), lambda b, g, base, cb: (b, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, C, G, Wp),
                               lambda b, g, base, cb: (b, 0, g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((C, BV, Wp), jnp.float32),
            pltpu.VMEM((R, G * 2 * LANE), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, C, H, Wp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(base, colbase, x_p, y_p, img_chw)

    return out[:, :, :, :W].transpose(0, 2, 3, 1)


@functools.partial(jax.jit,
                   static_argnames=("band", "interpret", "exact", "u8"))
def grid_sample_mxu_with_grads(img: jax.Array, coords: jax.Array,
                               band: int = 32, interpret: bool = False,
                               exact=True, u8: tuple = ()):
    """One kernel pass returning (out, dout/dcx, dout/dcy).

    Same semantics/precision knobs as ``grid_sample_mxu``; the spatial
    derivatives are w.r.t. the NORMALIZED coords (chain-ruled from the
    kernel's pixel-unit readouts) and cost ~nothing extra — both
    horizontal taps are already in the matmul results, so the Jacobian
    is two more VPU readouts. Feeds the forward-mode (custom_jvp)
    sampler used by the Gauss-Newton/LM refiners, where each solver
    iteration takes 7 jvps of the residual.
    """
    B, H, W, C = img.shape
    BV, Wp = band_geometry(H, W, band)
    img_chw, x_p, y_p, base = _prep_layout(img, coords, BV, Wp)
    colbase = _col_bases(x_p, W, Wp)

    exact_ch, u8_ch = _norm_exact(exact, u8, C)
    G = ROWS_PER_GROUP
    kernel = _make_kernel(C, H, Wp, BV, jnp.float32, exact_ch=exact_ch,
                          u8_ch=u8_ch, with_grads=True)
    R = (C + len(exact_ch)) * BV
    out_spec = pl.BlockSpec((1, C, G, Wp),
                            lambda b, g, base, cb: (b, 0, g, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, H // G),
        in_specs=[
            pl.BlockSpec((1, G, Wp), lambda b, g, base, cb: (b, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, Wp), lambda b, g, base, cb: (b, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[out_spec, out_spec, out_spec],
        scratch_shapes=[
            pltpu.VMEM((C, BV, Wp), jnp.float32),
            pltpu.VMEM((R, G * 2 * LANE), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    shp = jax.ShapeDtypeStruct((B, C, H, Wp), jnp.float32)
    out, gx, gy = pl.pallas_call(
        kernel,
        out_shape=(shp, shp, shp),
        grid_spec=grid_spec,
        interpret=interpret,
    )(base, colbase, x_p, y_p, img_chw)

    def to_nhwc(a):
        return a[:, :, :, :W].transpose(0, 2, 3, 1)

    # pixel → normalized chain rule (x_pix = ((cx+1)·W − 1)/2)
    return to_nhwc(out), to_nhwc(gx) * (W / 2.0), to_nhwc(gy) * (H / 2.0)


@functools.partial(jax.custom_jvp, nondiff_argnums=(2, 3, 4, 5))
def grid_sample_mxu_fwd_diff(img: jax.Array, coords: jax.Array,
                             band: int = 32, interpret: bool = False,
                             exact=True, u8: tuple = ()) -> jax.Array:
    """grid_sample_mxu with a FORWARD-mode (jvp) rule.

    The custom_vjp sampler (``grid_sample_mxu_diff``) cannot be jvp'd —
    JAX forbids forward-mode through custom_vjp — but the Gauss-Newton/
    LM refiners (solver/ba.py, solver/gauss_newton.py) build their
    Jacobian blocks from jvps. This wrapper's jvp rule evaluates the
    value + spatial derivatives in ONE kernel pass
    (``grid_sample_mxu_with_grads``) and assembles

        dout = ∂out/∂cx · ċx + ∂out/∂cy · ċy  [+ sample(img_dot) if the
               image itself carries a tangent — skipped symbolically
               when it is data]

    Reverse-mode callers should keep using ``grid_sample_mxu_diff``
    (its hand-written transposed-matmul backward is cheaper than
    transposing this jvp).
    """
    return grid_sample_mxu(img, coords, band=band, interpret=interpret,
                           exact=exact, u8=u8)


def _gsm_jvp(band, interpret, exact, u8, primals, tangents):
    img, coords = primals
    img_dot, coords_dot = tangents
    zero = jax.custom_derivatives.SymbolicZero
    if type(coords_dot) is not zero:
        out, gx, gy = grid_sample_mxu_with_grads(
            img, coords, band=band, interpret=interpret, exact=exact, u8=u8)
        dout = gx * coords_dot[..., 0:1] + gy * coords_dot[..., 1:2]
    else:
        out = grid_sample_mxu(img, coords, band=band, interpret=interpret,
                              exact=exact, u8=u8)
        dout = jnp.zeros_like(out)
    if type(img_dot) is not zero:
        # image tangents are NOT k/255-valued: sample them with the exact
        # hi/lo path regardless of the primal's speed mode — a 'uint8'
        # primal would compute round(tangent*255), silently quantizing
        # (or zeroing, for |t| < 0.5/255) arbitrary tangents
        dout = dout + grid_sample_mxu(img_dot.astype(img.dtype), coords,
                                      band=band, interpret=interpret,
                                      exact=True, u8=())
    return out, dout


grid_sample_mxu_fwd_diff.defjvp(_gsm_jvp, symbolic_zeros=True)


# --------------------------------------------------------------------------
# differentiable wrapper (backward kernels in tcsfm/ops/warp_mxu_grad.py)
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def grid_sample_mxu_diff(img: jax.Array, coords: jax.Array, band: int = 32,
                         interpret: bool = False,
                         exact: bool = True, u8: tuple = (),
                         grad_ch=None) -> jax.Array:
    """grid_sample_mxu with a custom VJP (d_img and d_coords as Pallas
    kernels with the same banded-matmul structure as the forward).

    The backward's tap values follow only the forward's *uint8* channels
    (255x single-pass — f32-exact for k/255 data at half the hi/lo rows);
    all other channels run hi/lo even when the forward picked a lossy
    speed mode — gradient quality never degrades with the sampling mode.

    ``grad_ch`` (static) names the img channels whose d_img cotangent the
    surrounding graph actually consumes (None → all). Channels outside it
    receive an exact ZERO d_img without paying their transposed-matmul /
    read-modify-write cost — only correct when those channels are data
    leaves (true for every sampled RGB stream in this framework). d_coords
    is always full-precision over all channels."""
    return grid_sample_mxu(img, coords, band=band, interpret=interpret,
                           exact=exact, u8=u8)


def _gsm_fwd(img, coords, band, interpret, exact, u8, grad_ch):
    out = grid_sample_mxu(img, coords, band=band, interpret=interpret,
                          exact=exact, u8=u8)
    return out, (img, coords)


def _gsm_bwd(band, interpret, exact, u8, grad_ch, res, g):
    from tcsfm.ops.warp_mxu_grad import grid_sample_mxu_bwd

    img, coords = res
    B, H, W, C = img.shape
    BV, Wp = band_geometry(H, W, band)
    img_chw, x_p, y_p, base = _prep_layout(img, coords, BV, Wp)
    colbase = _col_bases(x_p, W, Wp)
    g_chw = jnp.pad(
        g.transpose(0, 3, 1, 2).astype(jnp.float32),
        ((0, 0), (0, 0), (0, 0), (0, Wp - W)),
    )
    gch = tuple(range(C)) if grad_ch is None else tuple(
        sorted(int(c) for c in grad_ch))
    # the backward follows only the forward's *uint8* channels (they are
    # exact at single-pass cost); every other channel runs hi/lo even if
    # the forward picked a lossy speed mode — gradient quality never
    # degrades with the sampling mode.
    _, u8_ch = _norm_exact(exact, u8, C)
    dimg_g, dx, dy = grid_sample_mxu_bwd(
        img_chw, x_p, y_p, base, colbase, g_chw, band=BV,
        interpret=interpret, grad_ch=gch, u8=u8_ch)

    if len(gch) == C:
        dimg_chw = dimg_g
    elif len(gch) == 0:
        dimg_chw = jnp.zeros_like(img_chw)
    else:
        dimg_chw = (jnp.zeros((B, C, H, Wp), jnp.float32)
                    .at[:, list(gch)].set(dimg_g))
    d_img = dimg_chw[:, :, :, :W].transpose(0, 2, 3, 1).astype(img.dtype)
    # chain rule pixel→normalized: x_pix = ((cx+1)·W - 1)/2 → d/dcx = W/2.
    # Pushed-OOB coords already get zero gradient (selectors/tents vanish),
    # matching the reference's detached masked assignment (stn.py:224-228).
    dcx = dx[:, :, :W] * (W / 2.0)
    dcy = dy[:, :, :W] * (H / 2.0)
    d_coords = jnp.stack([dcx, dcy], axis=-1).astype(coords.dtype)
    return d_img, d_coords


grid_sample_mxu_diff.defvjp(_gsm_fwd, _gsm_bwd)
