"""Photometric bundle adjustment: joint pose + per-pixel depth refinement
with an exact Schur complement over the depth block.

The BASELINE north star recasts the reference's Adam-on-weights PFT as
nonlinear least squares over poses AND structure. Key structural fact:
the photometric residual at pixel i depends only on the depth at pixel i
(through that pixel's reprojection), so the depth Hessian block is
DIAGONAL and the Schur complement is closed-form:

  H = [ H_pp  H_pd ]   δ = [δp]   H_pp: [6,6]   H_dd: diag[Npix]
      [ H_pdᵀ H_dd ]       [δd]

  reduced pose system:  (H_pp − Σ_i h_i h_iᵀ / H_dd_i) δp = −(g_p − Σ_i h_i g_d_i / H_dd_i)
  depth back-subst:     δd_i = −(g_d_i + h_iᵀ δp) / H_dd_i

with h_i = J_p_iᵀ J_d_i ∈ R⁶ per pixel — everything is jvp products and
einsum reductions; no [Npix, 6] system is ever materialized or solved.

TPU design: the pose Jacobian comes from 6 warp jvps (se(3) basis), the
depth Jacobian diagonal from ONE jvp with a ones-tangent (diagonality
makes the full jvp equal the diagonal), and all reductions are MXU/VPU
einsums. Batched over windows; windows shard over the mesh's data axis.
Inter-window shared-pose coupling (full sequence BA via psum of the
reduced camera systems) builds on this block — see docs/ROADMAP.md.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tcsfm.geom.warp import inverse_warp2


class BAResult(NamedTuple):
    pose: jax.Array          # [B, 6]
    depth: jax.Array         # [B, H, W, 1] refined target depth
    cost: jax.Array          # [iters+1, B]
    pose_info: jax.Array     # [B, 6, 6] reduced pose information matrix
    #   (Gauss-Newton Hessian after marginalizing depth) at the solution —
    #   the per-window block of the sequence-level reduced camera system


def _f32(*xs):
    """Cast solver inputs to f32: BA is a second-order method (Hessian
    blocks, Schur complements, LM accept tests) and must solve in f32
    even when the upstream networks ran in bf16 (bf16 depths/frames
    otherwise poison the scan carries with mixed dtypes)."""
    out = tuple(jnp.asarray(x, jnp.float32) for x in xs)
    return out[0] if len(out) == 1 else out


def _residual(pose, depth, target_img, source_img, src_depth, K):
    warped, valid, _, _ = inverse_warp2(source_img, depth, src_depth,
                                        -pose, K)
    return (target_img - warped) * valid


def _make_mxu_residual(exact, band: int, interpret: bool):
    """MXU-sampled photometric residual (drop-in for ``_residual``).

    The GN/LM blocks are built from jvps, which JAX forbids through the
    custom_vjp sampler — this path rides the forward-mode sampler
    ``grid_sample_mxu_fwd_diff`` instead (value + spatial Jacobian in one
    kernel pass), replacing 7 XLA gather warps per LM iteration with one
    Pallas call plus VPU products. The banded kernel's coverage mask
    folds into the residual's valid mask exactly like the coupled
    solver's (out-of-band pixels contribute nothing). ``src_depth`` is
    accepted for signature parity but never sampled — the BA residual
    ignores the projected depth (the XLA path samples and discards it).
    """
    from tcsfm.geom.camera import backproject
    from tcsfm.geom.se3 import pose_vec2mat
    from tcsfm.geom.warp import _project_with_mask
    from tcsfm.ops.warp_mxu import (band_coverage_mask, band_geometry,
                                    grid_sample_mxu_fwd_diff)

    u8 = ()
    if exact == "uint8":
        exact, u8 = (), (0, 1, 2)
    elif exact == "mixed":
        exact = False            # RGB-only sampling here (no depth channel)

    def residual(pose, depth, target_img, source_img, src_depth, K):
        del src_depth
        b, h, w, _ = source_img.shape
        cam = backproject(depth, K)
        pose_mat = pose_vec2mat(-pose[..., :6])
        coords, _, valid = _project_with_mask(cam, K, pose_mat, h, w)
        warped = grid_sample_mxu_fwd_diff(source_img, coords, band,
                                          interpret, exact, u8)
        bv, wp = band_geometry(h, w, band)
        in_band = jax.lax.stop_gradient(
            band_coverage_mask(coords, h, bv, W=w, Wp=wp))
        v = (valid & in_band)[..., None].astype(warped.dtype)
        return (target_img - warped) * v

    return residual


def _pick_residual(use_mxu_warp, mxu_exact, mxu_band, interpret):
    if use_mxu_warp:
        return _make_mxu_residual(mxu_exact, mxu_band, interpret)
    return _residual


def _gn_blocks(r_fn, pose, depth):
    """Gauss-Newton blocks of one residual family vs (pose, depth).

    The pose Jacobian comes from 6 jvps against the se(3) basis; the depth
    Jacobian diagonal from ONE ones-tangent jvp (residual_i depends only on
    depth_i, so the full jvp IS the diagonal). All reductions are MXU/VPU
    einsums; nothing bigger than [B, H, W, 6] is materialized.

    Returns (H_pp [B,6,6], g_p [B,6], h [B,H,W,6], H_dd [B,H,W],
    g_d [B,H,W]) — WITHOUT any prior terms; callers add those.
    """
    b = pose.shape[0]
    eye6 = jnp.eye(6)
    r0 = r_fn(pose, depth)                             # [B, H, W, 3]
    cols = []
    for k in range(6):
        tangent = jnp.broadcast_to(eye6[k], (b, 6))
        _, Jk = jax.jvp(lambda p: r_fn(p, depth), (pose,), (tangent,))
        cols.append(Jk)
    Jp = jnp.stack(cols, axis=-1)                      # [B, H, W, 3, 6]
    _, Jd = jax.jvp(lambda d: r_fn(pose, d), (depth,),
                    (jnp.ones_like(depth),))           # [B, H, W, 3]
    H_pp = jnp.einsum("bhwck,bhwcl->bkl", Jp, Jp)      # [B, 6, 6]
    g_p = jnp.einsum("bhwck,bhwc->bk", Jp, r0)         # [B, 6]
    h = jnp.einsum("bhwck,bhwc->bhwk", Jp, Jd)         # [B, H, W, 6]
    H_dd = jnp.sum(Jd * Jd, axis=-1)                   # [B, H, W]
    g_d = jnp.sum(Jd * r0, axis=-1)                    # [B, H, W]
    return H_pp, g_p, h, H_dd, g_d


def photometric_ba(
    pose0: jax.Array,
    depth0: jax.Array,
    target_img: jax.Array,
    source_img: jax.Array,
    src_depth: jax.Array,
    K: jax.Array,
    iters: int = 8,
    pose_damping: float = 1e-2,
    depth_damping: float = 1e-2,
    depth_prior_weight: float = 1.0,
    use_mxu_warp: bool = False,
    mxu_exact=True,
    mxu_band: int = 32,
    interpret: bool = False,
) -> BAResult:
    """Jointly refine [B, 6] pose and [B, H, W, 1] target depth.

    ``depth_prior_weight`` adds a quadratic prior pulling depth toward its
    initial value (the network prediction) — the BA analogue of the
    reference PFT's ``l_depth_init`` SSIM prior (optimizer.py:89-90),
    and it keeps textureless pixels (J_d ≈ 0) well-conditioned.
    ``use_mxu_warp`` routes the residual through the forward-mode MXU
    sampler (see ``_make_mxu_residual``).
    """
    pose0, depth0, target_img, source_img, src_depth, K = _f32(
        pose0, depth0, target_img, source_img, src_depth, K)
    b = pose0.shape[0]
    res_fn = _pick_residual(use_mxu_warp, mxu_exact, mxu_band, interpret)

    def r_of(pose, depth):
        return res_fn(pose, depth, target_img, source_img, src_depth, K)

    def cost_of(pose, depth):
        r = r_of(pose, depth)
        prior = depth_prior_weight * jnp.sum(
            (depth - depth0) ** 2, axis=(1, 2, 3))
        return jnp.sum(r * r, axis=(1, 2, 3)) + prior

    def blocks_of(pose, depth):
        """Gauss-Newton blocks of the joint (pose, depth) system."""
        H_pp, g_p, h, H_dd, g_d = _gn_blocks(r_of, pose, depth)
        H_dd = H_dd + depth_prior_weight
        g_d = g_d + depth_prior_weight * ((depth - depth0)[..., 0])
        return H_pp, g_p, h, H_dd, g_d

    def step(carry, _):
        pose, depth, lam, cost = carry
        H_pp, g_p, h, H_dd, g_d = blocks_of(pose, depth)

        # LM damping on both blocks
        H_dd = H_dd * (1.0 + lam)[:, None, None] + depth_damping
        inv_Hdd = 1.0 / H_dd

        # Schur complement of the diagonal depth block
        S = H_pp - jnp.einsum("bhwk,bhw,bhwl->bkl", h, inv_Hdd, h)
        rhs = g_p - jnp.einsum("bhwk,bhw,bhw->bk", h, inv_Hdd, g_d)
        S = S + (pose_damping * (1.0 + lam))[:, None, None] * (
            S * jnp.eye(6) + jnp.eye(6))
        dp = -jnp.linalg.solve(S, rhs[..., None])[..., 0]       # [B, 6]

        # depth back-substitution
        dd = -(g_d + jnp.einsum("bhwk,bk->bhw", h, dp)) * inv_Hdd
        new_pose = pose + dp
        new_depth = jnp.maximum(depth + dd[..., None], 1e-3)

        new_cost = cost_of(new_pose, new_depth)
        better = new_cost < cost
        pose = jnp.where(better[:, None], new_pose, pose)
        depth = jnp.where(better[:, None, None, None], new_depth, depth)
        cost = jnp.where(better, new_cost, cost)
        lam = jnp.clip(jnp.where(better, lam * 0.3, lam * 5.0), 1e-4, 1e6)
        return (pose, depth, lam, cost), cost

    lam0 = jnp.ones((b,))
    cost0 = cost_of(pose0, depth0)
    (pose, depth, _, _), costs = jax.lax.scan(
        step, (pose0, depth0, lam0, cost0), None, length=iters)

    # reduced pose information at the solution (undamped Schur complement)
    # — the per-window 6x6 block of the sequence reduced camera system
    H_pp, _, h, H_dd, _ = blocks_of(pose, depth)
    info = H_pp - jnp.einsum("bhwk,bhw,bhwl->bkl", h, 1.0 / H_dd, h)

    return BAResult(pose=pose, depth=depth,
                    cost=jnp.concatenate([cost0[None], costs], axis=0),
                    pose_info=info)


# --------------------------------------------------------------------------
# sequence-level BA: information-weighted fwd/inv fusion over a pose chain
# --------------------------------------------------------------------------


def fuse_pose_estimates(xi_fwd: jax.Array, info_fwd: jax.Array,
                        xi_inv: jax.Array, info_inv: jax.Array,
                        damping: float = 1e-8) -> jax.Array:
    """Information-weighted fusion of the two estimates of one relative pose.

    Each frame pair (t, t+1) is measured twice — by the forward window
    (target t, source t+1) and by the inverse window (target t+1,
    source t, giving ~the negated twist for small motions). The fused
    estimate solves

        min_xi ||xi - xi_fwd||^2_{I_f} + ||xi + xi_inv||^2_{I_i}
        =>  (I_f + I_i) xi = I_f xi_fwd - I_i xi_inv

    with I_* the reduced (depth-marginalized) Gauss-Newton information
    from `photometric_ba`. This is the BA-grade generalization of the
    reference's unweighted fusion ``(fwd - inv) / 2``
    (evaluate_vo_model.py:140) — and reduces to exactly that when the two
    information matrices are equal.

    Args: all [B, 6] / [B, 6, 6]. Returns fused [B, 6].
    """
    A = info_fwd + info_inv + damping * jnp.eye(6)
    rhs = (jnp.einsum("bkl,bl->bk", info_fwd, xi_fwd)
           - jnp.einsum("bkl,bl->bk", info_inv, xi_inv))
    return jnp.linalg.solve(A, rhs[..., None])[..., 0]


class SequenceBAResult(NamedTuple):
    fused_pose: jax.Array    # [N-1, 6] information-fused t -> t+1 twists
    fwd: BAResult            # per-pair forward refinement
    inv: BAResult            # per-pair inverse refinement


def sequence_ba(frames: jax.Array, depths: jax.Array, K: jax.Array,
                pose0_fwd: jax.Array, pose0_inv: jax.Array,
                iters: int = 8, residual_variance_weighting: bool = True,
                **ba_kwargs) -> SequenceBAResult:
    """Refine a whole pose chain: batched fwd+inv per-pair BA, then
    information-weighted fusion of each pair's two estimates.

    The TPU-native distributed-BA path (SURVEY.md §5.7): the window axis
    is embarrassingly parallel, so sharding ``frames``/``depths``/poses
    over the mesh's ``data`` axis (e.g. ``dist.mesh.batch_sharding``)
    makes XLA partition the whole solve SPMD — the per-pair 6x6 reduced
    systems are the assembled "reduced camera system", and the fusion
    solve is its (block-diagonal) solution. Validated on a virtual
    8-device mesh in tests/test_ba.py.

    Args:
      frames:    [N, H, W, 3] consecutive frames of one sequence block.
      depths:    [N, H, W, 1] per-frame (network) depth.
      K:         [3, 3] shared intrinsics (or [N-1, 3, 3] per pair).
      pose0_fwd: [N-1, 6] initial t -> t+1 twists (coupled-solver output).
      pose0_inv: [N-1, 6] initial t+1 -> t twists.
      residual_variance_weighting: scale each window's information by
        1 / sigma^2 with sigma^2 = final cost / Npix (the GN information
        assumes unit-variance residuals; estimating the actual noise
        level per window automatically distrusts a direction that
        converged to a poor photometric minimum — a wrong-basin gate).
    """
    tgt_f, src_f = frames[:-1], frames[1:]
    d_tgt, d_src = depths[:-1], depths[1:]
    n = tgt_f.shape[0]
    K_b = jnp.broadcast_to(K, (n, 3, 3)) if K.ndim == 2 else K

    fwd = photometric_ba(pose0_fwd, d_tgt, tgt_f, src_f, d_src, K_b,
                         iters=iters, **ba_kwargs)
    inv = photometric_ba(pose0_inv, d_src, src_f, tgt_f, d_tgt, K_b,
                         iters=iters, **ba_kwargs)
    info_f, info_i = fwd.pose_info, inv.pose_info
    if residual_variance_weighting:
        npix = float(np.prod(tgt_f.shape[1:]))
        info_f = info_f / jnp.maximum(fwd.cost[-1] / npix,
                                      1e-12)[:, None, None]
        info_i = info_i / jnp.maximum(inv.cost[-1] / npix,
                                      1e-12)[:, None, None]
    fused = fuse_pose_estimates(fwd.pose, info_f, inv.pose, info_i)
    return SequenceBAResult(fused_pose=fused, fwd=fwd, inv=inv)


# --------------------------------------------------------------------------
# cross-window shared-pose coupling: 3-frame window BA with a SHARED target
# depth + the block-tridiagonal reduced camera system over the pose chain
# --------------------------------------------------------------------------


class WindowBAResult(NamedTuple):
    """Joint refinement of one 3-frame window (prev, target, next).

    The two pair constraints share the window's target depth, so after
    marginalizing the (diagonal) depth block the reduced pose system is a
    12x12 with a NON-ZERO cross block — the per-window unit of the
    sequence reduced camera system.
    """
    pose_prev: jax.Array     # [B, 6] refined target -> prev twist
    pose_next: jax.Array     # [B, 6] refined target -> next twist
    depth: jax.Array         # [B, H, W, 1] refined target depth
    cost: jax.Array          # [iters+1, B]
    S_aa: jax.Array          # [B, 6, 6] reduced info, prev-pose block
    S_ab: jax.Array          # [B, 6, 6] reduced cross block (prev, next)
    S_bb: jax.Array          # [B, 6, 6] reduced info, next-pose block


def window_ba(
    pose_prev0: jax.Array,
    pose_next0: jax.Array,
    depth0: jax.Array,
    target_img: jax.Array,
    prev_img: jax.Array,
    next_img: jax.Array,
    prev_depth: jax.Array,
    next_depth: jax.Array,
    K: jax.Array,
    iters: int = 8,
    pose_damping: float = 1e-2,
    depth_damping: float = 1e-2,
    depth_prior_weight: float = 1.0,
    use_mxu_warp: bool = False,
    mxu_exact=True,
    mxu_band: int = 32,
    interpret: bool = False,
) -> WindowBAResult:
    """Jointly refine both window poses and the SHARED target depth.

    Upgrades `photometric_ba` from one pair to the reference's full
    3-frame window (train_mono.py windows: target t, sources t-1/t+1):
    residuals r_a (target vs prev) and r_b (target vs next) both depend on
    the same target depth, so depth marginalization produces the coupled
    12x12 reduced system

        S = [ H_aa - h_a h_aT/H_dd     - h_a h_bT/H_dd      ]
            [     ...T                 H_bb - h_b h_bT/H_dd ]

    whose off-diagonal block is what `chain_ba` chains into the
    block-tridiagonal sequence system (SURVEY.md §5.7 north star).
    All blocks come from jvp products; nothing bigger than [B, H, W, 6]
    is materialized (TPU: einsum reductions ride the MXU/VPU).
    """
    (pose_prev0, pose_next0, depth0, target_img, prev_img, next_img,
     prev_depth, next_depth, K) = _f32(
        pose_prev0, pose_next0, depth0, target_img, prev_img, next_img,
        prev_depth, next_depth, K)
    b = pose_prev0.shape[0]

    res_fn = _pick_residual(use_mxu_warp, mxu_exact, mxu_band, interpret)

    def r_a_fn(p, d):
        return res_fn(p, d, target_img, prev_img, prev_depth, K)

    def r_b_fn(p, d):
        return res_fn(p, d, target_img, next_img, next_depth, K)

    def cost_of(pa, pb, depth):
        r_a, r_b = r_a_fn(pa, depth), r_b_fn(pb, depth)
        prior = depth_prior_weight * jnp.sum(
            (depth - depth0) ** 2, axis=(1, 2, 3))
        return (jnp.sum(r_a * r_a, axis=(1, 2, 3))
                + jnp.sum(r_b * r_b, axis=(1, 2, 3)) + prior)

    def blocks_of(pa, pb, depth):
        H_aa, g_a, h_a, Hdd_a, gd_a = _gn_blocks(r_a_fn, pa, depth)
        H_bb, g_b, h_b, Hdd_b, gd_b = _gn_blocks(r_b_fn, pb, depth)
        H_dd = Hdd_a + Hdd_b + depth_prior_weight
        g_d = gd_a + gd_b + depth_prior_weight * ((depth - depth0)[..., 0])
        return H_aa, H_bb, g_a, g_b, h_a, h_b, H_dd, g_d

    def reduced(H_aa, H_bb, h_a, h_b, inv_Hdd):
        S_aa = H_aa - jnp.einsum("bhwk,bhw,bhwl->bkl", h_a, inv_Hdd, h_a)
        S_ab = -jnp.einsum("bhwk,bhw,bhwl->bkl", h_a, inv_Hdd, h_b)
        S_bb = H_bb - jnp.einsum("bhwk,bhw,bhwl->bkl", h_b, inv_Hdd, h_b)
        return S_aa, S_ab, S_bb

    def step(carry, _):
        pa, pb, depth, lam, cost = carry
        H_aa, H_bb, g_a, g_b, h_a, h_b, H_dd, g_d = blocks_of(pa, pb, depth)

        H_dd = H_dd * (1.0 + lam)[:, None, None] + depth_damping
        inv_Hdd = 1.0 / H_dd
        S_aa, S_ab, S_bb = reduced(H_aa, H_bb, h_a, h_b, inv_Hdd)
        rhs_a = g_a - jnp.einsum("bhwk,bhw,bhw->bk", h_a, inv_Hdd, g_d)
        rhs_b = g_b - jnp.einsum("bhwk,bhw,bhw->bk", h_b, inv_Hdd, g_d)

        S = jnp.concatenate([
            jnp.concatenate([S_aa, S_ab], axis=-1),
            jnp.concatenate([jnp.swapaxes(S_ab, 1, 2), S_bb], axis=-1),
        ], axis=1)                                       # [B, 12, 12]
        damp = (pose_damping * (1.0 + lam))[:, None, None]
        S = S + damp * (S * jnp.eye(12) + jnp.eye(12))
        rhs = jnp.concatenate([rhs_a, rhs_b], axis=-1)
        dp = -jnp.linalg.solve(S, rhs[..., None])[..., 0]  # [B, 12]
        dpa, dpb = dp[:, :6], dp[:, 6:]

        dd = -(g_d + jnp.einsum("bhwk,bk->bhw", h_a, dpa)
               + jnp.einsum("bhwk,bk->bhw", h_b, dpb)) * inv_Hdd
        new_pa, new_pb = pa + dpa, pb + dpb
        new_depth = jnp.maximum(depth + dd[..., None], 1e-3)

        new_cost = cost_of(new_pa, new_pb, new_depth)
        better = new_cost < cost
        pa = jnp.where(better[:, None], new_pa, pa)
        pb = jnp.where(better[:, None], new_pb, pb)
        depth = jnp.where(better[:, None, None, None], new_depth, depth)
        cost = jnp.where(better, new_cost, cost)
        lam = jnp.clip(jnp.where(better, lam * 0.3, lam * 5.0), 1e-4, 1e6)
        return (pa, pb, depth, lam, cost), cost

    lam0 = jnp.ones((b,))
    cost0 = cost_of(pose_prev0, pose_next0, depth0)
    (pa, pb, depth, _, _), costs = jax.lax.scan(
        step, (pose_prev0, pose_next0, depth0, lam0, cost0), None,
        length=iters)

    # undamped reduced system at the solution — the window's contribution
    # to the sequence reduced camera system
    H_aa, H_bb, _, _, h_a, h_b, H_dd, _ = blocks_of(pa, pb, depth)
    S_aa, S_ab, S_bb = reduced(H_aa, H_bb, h_a, h_b, 1.0 / H_dd)

    return WindowBAResult(
        pose_prev=pa, pose_next=pb, depth=depth,
        cost=jnp.concatenate([cost0[None], costs], axis=0),
        S_aa=S_aa, S_ab=S_ab, S_bb=S_bb)


def block_tridiag_solve(D: jax.Array, U: jax.Array, b: jax.Array):
    """Solve the block-tridiagonal system (block Thomas algorithm).

    D [E, 6, 6] diagonal blocks, U [E-1, 6, 6] super-diagonal blocks
    (lower diagonal = U^T by symmetry), b [E, 6]. Two `lax.scan`s of 6x6
    solves — O(E) with tiny per-step work; the heavy (per-pixel) part of
    the reduced system was already marginalized per window.
    """
    E = D.shape[0]
    U_pad = jnp.concatenate([U, jnp.zeros((1, 6, 6))], axis=0)

    def fwd_step(carry, inp):
        C_prev, d_prev = carry
        Di, Ui, bi, Ui_prev = inp
        M = Di - jnp.swapaxes(Ui_prev, 0, 1) @ C_prev
        Ci = jnp.linalg.solve(M, Ui)
        di = jnp.linalg.solve(
            M, (bi - (jnp.swapaxes(Ui_prev, 0, 1) @ d_prev[:, None])[:, 0]
                )[:, None])[:, 0]
        return (Ci, di), (Ci, di)

    U_prev = jnp.concatenate([jnp.zeros((1, 6, 6)), U], axis=0)
    (_, _), (C, d) = jax.lax.scan(
        fwd_step, (jnp.zeros((6, 6)), jnp.zeros(6)),
        (D, U_pad, b, U_prev))

    def bwd_step(x_next, inp):
        Ci, di = inp
        xi = di - (Ci @ x_next[:, None])[:, 0]
        return xi, xi

    _, xs = jax.lax.scan(bwd_step, jnp.zeros(6), (C, d), reverse=True)
    return xs


class ChainBAResult(NamedTuple):
    edge_pose: jax.Array     # [N-1, 6] jointly refined t -> t+1 twists
    depth: jax.Array         # [N, H, W, 1] refined per-frame depths
    cost: jax.Array          # [iters+1] total photometric cost (finest level)


def _scale_intrinsics(K: jax.Array, s: float) -> jax.Array:
    """Pixel-unit intrinsics under s-times image scaling (pixel-center
    convention: a pixel center u maps to (u + 0.5) * s - 0.5)."""
    out = jnp.zeros_like(K)
    out = out.at[..., 0, 0].set(K[..., 0, 0] * s)
    out = out.at[..., 1, 1].set(K[..., 1, 1] * s)
    out = out.at[..., 0, 2].set((K[..., 0, 2] + 0.5) * s - 0.5)
    out = out.at[..., 1, 2].set((K[..., 1, 2] + 0.5) * s - 0.5)
    return out.at[..., 2, 2].set(1.0)


def _downsample(x: jax.Array, factor: int) -> jax.Array:
    """Antialiased bilinear downsample of [N, H, W, C] by an integer factor."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, h // factor, w // factor, c),
                            method="linear", antialias=True)


def _chain_level(frames, depths, K, x0, iters, pose_damping, depth_damping,
                 depth_prior_weight, residual_variance_weighting,
                 res_fn=_residual):
    """One pyramid level of `chain_ba`: the joint LM loop at fixed
    resolution. Returns (edge twists, [N,H,W,1] refined depth, costs)."""
    if frames.shape[1] % 8:
        res_fn = _residual        # MXU kernel needs H % 8 == 0
    tgt = frames[1:-1]
    prv, nxt = frames[:-2], frames[2:]
    depth0_mid, depth0_bnd = depths[1:-1], depths[jnp.array([0, -1])]
    d_prv, d_nxt = depths[:-2], depths[2:]
    w = tgt.shape[0]
    n_edges = w + 1
    K_b = jnp.broadcast_to(K, (w, 3, 3)) if K.ndim == 2 else K
    # boundary half-windows: targets (0, N-1), sources (1, N-2)
    tgt_bnd = frames[jnp.array([0, -1])]
    src_bnd = frames[jnp.array([1, -2])]
    d_src_bnd = depths[jnp.array([1, -2])]
    K_bnd = (jnp.stack([K, K]) if K.ndim == 2
             else K[jnp.array([0, -1])])
    npix = float(np.prod(tgt.shape[1:]))

    def r_a_fn(p, d):
        return res_fn(p, d, tgt, prv, d_prv, K_b)

    def r_b_fn(p, d):
        return res_fn(p, d, tgt, nxt, d_nxt, K_b)

    def r_bnd_fn(p, d):
        return res_fn(p, d, tgt_bnd, src_bnd, d_src_bnd, K_bnd)

    def poses_of(x):
        # interior: pa_w = -x_w, pb_w = x_{w+1}; boundary: (x_0, -x_{E-1})
        return -x[:-1], x[1:], jnp.stack([x[0], -x[-1]])

    def costs_of(x, d_mid, d_bnd):
        pa, pb, pc = poses_of(x)
        r_a, r_b = r_a_fn(pa, d_mid), r_b_fn(pb, d_mid)
        r_c = r_bnd_fn(pc, d_bnd)
        prior_mid = depth_prior_weight * jnp.sum(
            (d_mid - depth0_mid) ** 2, axis=(1, 2, 3))
        prior_bnd = depth_prior_weight * jnp.sum(
            (d_bnd - depth0_bnd) ** 2, axis=(1, 2, 3))
        cost_mid = (jnp.sum(r_a * r_a, axis=(1, 2, 3))
                    + jnp.sum(r_b * r_b, axis=(1, 2, 3)) + prior_mid)
        cost_bnd = jnp.sum(r_c * r_c, axis=(1, 2, 3)) + prior_bnd
        return cost_mid, cost_bnd

    def step(carry, _):
        x, d_mid, d_bnd, lam_mid, lam_bnd, cost_mid, cost_bnd = carry
        pa, pb, pc = poses_of(x)

        # -- interior windows: shared-depth 12x12 reduced blocks
        H_aa, g_a, h_a, Hdd_a, gd_a = _gn_blocks(r_a_fn, pa, d_mid)
        H_bb, g_b, h_b, Hdd_b, gd_b = _gn_blocks(r_b_fn, pb, d_mid)
        H_dd = Hdd_a + Hdd_b + depth_prior_weight
        g_d = gd_a + gd_b + depth_prior_weight * (
            (d_mid - depth0_mid)[..., 0])
        H_dd = H_dd * (1.0 + lam_mid[:, None, None]) + depth_damping
        inv_Hdd = 1.0 / H_dd

        S_aa = H_aa - jnp.einsum("bhwk,bhw,bhwl->bkl", h_a, inv_Hdd, h_a)
        S_ab = -jnp.einsum("bhwk,bhw,bhwl->bkl", h_a, inv_Hdd, h_b)
        S_bb = H_bb - jnp.einsum("bhwk,bhw,bhwl->bkl", h_b, inv_Hdd, h_b)
        rhs_a = g_a - jnp.einsum("bhwk,bhw,bhw->bk", h_a, inv_Hdd, g_d)
        rhs_b = g_b - jnp.einsum("bhwk,bhw,bhw->bk", h_b, inv_Hdd, g_d)

        # -- boundary half-windows: single-pose 6x6 reduced blocks
        H_cc, g_c, h_c, Hdd_c, gd_c = _gn_blocks(r_bnd_fn, pc, d_bnd)
        Hdd_c = Hdd_c + depth_prior_weight
        gd_c = gd_c + depth_prior_weight * ((d_bnd - depth0_bnd)[..., 0])
        Hdd_c = Hdd_c * (1.0 + lam_bnd[:, None, None]) + depth_damping
        inv_Hdd_c = 1.0 / Hdd_c
        S_cc = H_cc - jnp.einsum("bhwk,bhw,bhwl->bkl", h_c, inv_Hdd_c, h_c)
        rhs_c = g_c - jnp.einsum("bhwk,bhw,bhw->bk", h_c, inv_Hdd_c, gd_c)

        if residual_variance_weighting:
            w_mid = 1.0 / jnp.maximum(cost_mid / (2.0 * npix), 1e-12)
            w_bnd = 1.0 / jnp.maximum(cost_bnd / npix, 1e-12)
            norm = jnp.mean(jnp.concatenate([w_mid, w_bnd]))
            w_mid, w_bnd = w_mid / norm, w_bnd / norm
            S_aa = S_aa * w_mid[:, None, None]
            S_ab = S_ab * w_mid[:, None, None]
            S_bb = S_bb * w_mid[:, None, None]
            rhs_a = rhs_a * w_mid[:, None]
            rhs_b = rhs_b * w_mid[:, None]
            S_cc = S_cc * w_bnd[:, None, None]
            rhs_c = rhs_c * w_bnd[:, None]

        # chain rule pa_w = -x_w: gradient wrt x_w flips sign, the
        # (x_w, x_{w+1}) cross block flips once, diagonal blocks don't;
        # boundary: d pc_0/d x_0 = +I, d pc_1/d x_{E-1} = -I
        D = (jnp.zeros((n_edges, 6, 6))
             .at[:-1].add(S_aa).at[1:].add(S_bb)
             .at[0].add(S_cc[0]).at[-1].add(S_cc[1]))
        U = -S_ab                                     # [E-1, 6, 6]
        g = (jnp.zeros((n_edges, 6))
             .at[:-1].add(-rhs_a).at[1:].add(rhs_b)
             .at[0].add(rhs_c[0]).at[-1].add(-rhs_c[1]))

        # per-window LM damping entered the depth blocks above; damp the
        # assembled pose diagonal with the mean window lambda per edge
        lam_edge = (jnp.zeros((n_edges,))
                    .at[:-1].add(lam_mid).at[1:].add(lam_mid)
                    .at[0].add(lam_bnd[0]).at[-1].add(lam_bnd[1])) / (
            jnp.zeros((n_edges,)).at[:-1].add(1.0).at[1:].add(1.0)
            .at[0].add(1.0).at[-1].add(1.0))
        damp = (pose_damping * (1.0 + lam_edge))[:, None, None]
        D = D + damp * (D * jnp.eye(6) + jnp.eye(6))
        dx = -block_tridiag_solve(D, U, g)            # [E, 6]

        # depth back-substitution
        dpa, dpb = -dx[:-1], dx[1:]
        dd_mid = -(g_d + jnp.einsum("bhwk,bk->bhw", h_a, dpa)
                   + jnp.einsum("bhwk,bk->bhw", h_b, dpb)) * inv_Hdd
        dpc = jnp.stack([dx[0], -dx[-1]])
        dd_bnd = -(gd_c
                   + jnp.einsum("bhwk,bk->bhw", h_c, dpc)) * inv_Hdd_c

        new_x = x + dx
        new_d_mid = jnp.maximum(d_mid + dd_mid[..., None], 1e-3)
        new_d_bnd = jnp.maximum(d_bnd + dd_bnd[..., None], 1e-3)

        new_cost_mid, new_cost_bnd = costs_of(new_x, new_d_mid, new_d_bnd)
        total_new = jnp.sum(new_cost_mid) + jnp.sum(new_cost_bnd)
        total_old = jnp.sum(cost_mid) + jnp.sum(cost_bnd)
        better = total_new < total_old
        x = jnp.where(better, new_x, x)
        d_mid = jnp.where(better, new_d_mid, d_mid)
        d_bnd = jnp.where(better, new_d_bnd, d_bnd)
        cost_mid2 = jnp.where(better, new_cost_mid, cost_mid)
        cost_bnd2 = jnp.where(better, new_cost_bnd, cost_bnd)
        # per-window lambda: relax where the window improved, stiffen
        # where it got worse (even inside an accepted global step)
        lam_mid = jnp.clip(
            jnp.where(better & (new_cost_mid < cost_mid),
                      lam_mid * 0.3, lam_mid * 5.0), 1e-4, 1e6)
        lam_bnd = jnp.clip(
            jnp.where(better & (new_cost_bnd < cost_bnd),
                      lam_bnd * 0.3, lam_bnd * 5.0), 1e-4, 1e6)
        return ((x, d_mid, d_bnd, lam_mid, lam_bnd, cost_mid2, cost_bnd2),
                jnp.sum(cost_mid2) + jnp.sum(cost_bnd2))

    cost_mid0, cost_bnd0 = costs_of(x0, depth0_mid, depth0_bnd)
    carry0 = (x0, depth0_mid, depth0_bnd,
              jnp.ones((w,)), jnp.ones((2,)), cost_mid0, cost_bnd0)
    (x, d_mid, d_bnd, _, _, _, _), costs = jax.lax.scan(
        step, carry0, None, length=iters)

    full_depth = (jnp.concatenate([d_bnd[:1], d_mid, d_bnd[1:]], axis=0))
    total0 = jnp.sum(cost_mid0) + jnp.sum(cost_bnd0)
    return x, full_depth, jnp.concatenate([total0[None], costs], axis=0)


def chain_ba(frames: jax.Array, depths: jax.Array, K: jax.Array,
             pose0_prev: jax.Array, pose0_next: jax.Array,
             iters: int = 8, pose_damping: float = 1e-2,
             depth_damping: float = 1e-2, depth_prior_weight: float = 1.0,
             residual_variance_weighting: bool = True,
             pyramid_levels: int = 1,
             coarse_iters: int = 6,
             use_mxu_warp: bool = False,
             mxu_exact=True,
             mxu_band: int = 32,
             interpret: bool = False) -> ChainBAResult:
    """Joint sequence BA over the window chain (SURVEY §5.7 north star).

    Solves ONE nonlinear least-squares problem over all N-1 edge twists
    x_e (frame e -> e+1) and all N per-frame depths simultaneously.
    Interior window w (target t = w+1) contributes residuals against its
    prev frame — whose pose is exactly -x_w, since exp(-xi) = exp(xi)^-1
    — and its next frame (pose x_{w+1}), both through the SHARED target
    depth. Two boundary half-windows (target 0 vs source 1, pose x_0;
    target N-1 vs source N-2, pose -x_{E-1}) give every edge exactly two
    photometric constraints, matching the information content of per-pair
    fwd/inv `sequence_ba`. Each LM iteration:

      1. Per-window linearization (batched over windows — the per-pixel
         heavy part; windows shard over the mesh's ``data`` axis).
      2. Schur-marginalize the diagonal depth block per target, giving
         12x12 reduced blocks with a NON-ZERO pose-pose cross term
         S_ab = -h_a H_dd^-1 h_b^T (the shared-depth coupling).
      3. Chain-rule to edge coordinates (pa_w = -x_w flips g_a and S_ab)
         and scatter-add into the block-tridiagonal reduced camera
         system over edges — interior edges accumulate BOTH adjacent
         windows' photometric information *within* the solve, which
         per-pair fusion can only approximate after the fact.
      4. Solve with the block Thomas algorithm (tiny, replicated),
         back-substitute per-frame depth updates, and accept/reject the
         global step. LM lambdas are PER WINDOW (a stuck window
         contributes conservative, heavily damped blocks while converged
         neighbors relax) with a single global accept on total cost.

    ``pyramid_levels > 1`` prepends coarse-to-fine pre-alignment: the
    same joint solve runs on 2x-downsampled pyramids (``coarse_iters``
    each, coarsest first), carrying only the edge twists between levels.
    A bilinear-warp basin is ~1 px wide, so each coarse level doubles the
    basin in metric units — initializations far outside the full-res
    photometric basin (wrong-basin VO failures) are recovered where a
    single-level solve stalls in a local minimum.

    Distributed story: the linearization is embarrassingly parallel over
    windows; assembly/solve operate on [E, 6, 6] arrays — the
    cross-device cost is one gather of 6x6 blocks per iteration,
    regardless of image size.

    Args:
      frames: [N, H, W, 3]; depths: [N, H, W, 1]; K: [3,3] or [N-2, 3, 3].
      pose0_prev/pose0_next: [N-2, 6] initial target->prev / target->next
        twists for windows with targets 1..N-2 (coupled-solver outputs);
        edges are initialized from the mean of their available
        measurements (interior edges get two).
      residual_variance_weighting: IRLS-style per-window weight
        1/sigma^2 with sigma^2 = current window cost / Nresiduals,
        mean-normalized — windows stuck at a poor photometric minimum are
        downweighted in the assembled system each iteration.
    """
    frames, depths, K, pose0_prev, pose0_next = _f32(
        frames, depths, K, pose0_prev, pose0_next)
    n_edges = frames.shape[0] - 1
    # edge init: mean of the available measurements per edge
    cnt = jnp.zeros((n_edges, 1)).at[:-1].add(1.0).at[1:].add(1.0)
    x0 = (jnp.zeros((n_edges, 6))
          .at[:-1].add(-pose0_prev).at[1:].add(pose0_next)) / cnt

    res_fn = _pick_residual(use_mxu_warp, mxu_exact, mxu_band, interpret)
    # coarse pyramid levels sample ANTIALIASED-DOWNSAMPLED frames whose
    # values are no longer k/255 — the uint8 255x-integer mode would
    # silently quantize them (~2e-3/value). Coarse levels force hi/lo.
    coarse_exact = True if mxu_exact == "uint8" else mxu_exact
    coarse_res_fn = _pick_residual(use_mxu_warp, coarse_exact, mxu_band,
                                   interpret)
    for level in range(pyramid_levels - 1, 0, -1):
        f = 2 ** level
        x0, _, _ = _chain_level(
            _downsample(frames, f), _downsample(depths, f),
            _scale_intrinsics(K, 1.0 / f), x0, coarse_iters,
            pose_damping, depth_damping, depth_prior_weight,
            residual_variance_weighting, res_fn=coarse_res_fn)

    x, depth, costs = _chain_level(
        frames, depths, K, x0, iters, pose_damping, depth_damping,
        depth_prior_weight, residual_variance_weighting, res_fn=res_fn)
    return ChainBAResult(edge_pose=x, depth=depth, cost=costs)
