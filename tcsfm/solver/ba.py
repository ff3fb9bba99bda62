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


def _residual(pose, depth, target_img, source_img, src_depth, K):
    warped, valid, _, _ = inverse_warp2(source_img, depth, src_depth,
                                        -pose, K)
    return (target_img - warped) * valid


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
) -> BAResult:
    """Jointly refine [B, 6] pose and [B, H, W, 1] target depth.

    ``depth_prior_weight`` adds a quadratic prior pulling depth toward its
    initial value (the network prediction) — the BA analogue of the
    reference PFT's ``l_depth_init`` SSIM prior (optimizer.py:89-90),
    and it keeps textureless pixels (J_d ≈ 0) well-conditioned.
    """
    b = pose0.shape[0]
    eye6 = jnp.eye(6)

    def r_of(pose, depth):
        return _residual(pose, depth, target_img, source_img, src_depth, K)

    def cost_of(pose, depth):
        r = r_of(pose, depth)
        prior = depth_prior_weight * jnp.sum(
            (depth - depth0) ** 2, axis=(1, 2, 3))
        return jnp.sum(r * r, axis=(1, 2, 3)) + prior

    def blocks_of(pose, depth):
        """Gauss-Newton blocks of the joint (pose, depth) system."""
        r0 = r_of(pose, depth)                         # [B, H, W, 3]

        # pose Jacobian: 6 jvps against the se(3) basis
        cols = []
        for k in range(6):
            tangent = jnp.broadcast_to(eye6[k], (b, 6))
            _, Jk = jax.jvp(lambda p: r_of(p, depth), (pose,), (tangent,))
            cols.append(Jk)
        Jp = jnp.stack(cols, axis=-1)                  # [B, H, W, 3, 6]

        # depth Jacobian diagonal: residual_i depends only on depth_i, so
        # a ones-tangent jvp IS the diagonal
        _, Jd = jax.jvp(lambda d: r_of(pose, d), (depth,),
                        (jnp.ones_like(depth),))       # [B, H, W, 3]

        # blocks (per window)
        H_pp = jnp.einsum("bhwck,bhwcl->bkl", Jp, Jp)          # [B, 6, 6]
        g_p = jnp.einsum("bhwck,bhwc->bk", Jp, r0)             # [B, 6]
        h = jnp.einsum("bhwck,bhwc->bhwk", Jp, Jd)             # [B, H, W, 6]
        H_dd = jnp.sum(Jd * Jd, axis=-1) + depth_prior_weight  # [B, H, W]
        g_d = jnp.sum(Jd * r0, axis=-1) + depth_prior_weight * (
            (depth - depth0)[..., 0])                          # [B, H, W]
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
