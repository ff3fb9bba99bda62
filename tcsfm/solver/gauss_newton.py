"""Gauss-Newton / Levenberg-Marquardt photometric pose refinement.

Beyond-reference capability (BASELINE.json north star): the reference's
PFT refines poses *indirectly* by running ~20 Adam steps on network
weights (optimization_experiments/optimizer.py). Here the pose refinement
is recast as damped Gauss-Newton on the photometric objective directly:

  r(ξ) = sqrt(w) · (I_tgt − warp(I_src; D, ξ))          per pixel
  δ    = −(JᵀJ + λ·diag(JᵀJ))⁻¹ Jᵀ r,   ξ ← ξ ∘ δ

with the 6-column Jacobian computed by jax.jvp against the se(3) basis —
six warp forward passes, no materialized [Npix, 6] matrix beyond the
reduction J^T J ([6, 6] via einsum, a pure MXU reduction).

TPU design: everything is batched over windows ([B] poses refined in one
jitted `lax.scan`); windows shard over the mesh's ``data`` axis for the
distributed sequence-refinement story (SURVEY.md §5.7). The [6, 6] solve
is a closed-form Cholesky on-device.

This is the single-pose building block of distributed bundle adjustment:
the per-pixel depth block is diagonal, so the reduced camera system after
the Schur complement is exactly these JᵀJ pose blocks plus inter-window
coupling — to be assembled with psum over the window mesh in a later
round.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from tcsfm.geom.warp import inverse_warp2


class GNResult(NamedTuple):
    pose: jax.Array          # [B, 6] refined pose
    cost: jax.Array          # [iters+1, B] photometric cost per iteration
    delta_norm: jax.Array    # [iters, B] update magnitudes


def _residuals(pose, target_img, source_img, tgt_depth, src_depth, K):
    """Masked photometric residuals r [B, H, W, 3] and weights [B, H, W, 1].

    Uses the same L1 image-difference objective the coupled solver is
    trained on; the warp convention matches solve_pose_iteratively
    (warp with -pose).
    """
    warped, valid, _, _ = inverse_warp2(
        source_img, tgt_depth, src_depth, -pose, K)
    r = (target_img - warped) * valid
    return r, valid


def gauss_newton_pose(
    pose0: jax.Array,
    target_img: jax.Array,
    source_img: jax.Array,
    tgt_depth: jax.Array,
    src_depth: jax.Array,
    K: jax.Array,
    iters: int = 10,
    damping: float = 1e-3,
    use_mxu_warp: bool = False,
    mxu_exact=True,
    mxu_band: int = 32,
    interpret: bool = False,
) -> GNResult:
    """Refine [B, 6] poses by damped Gauss-Newton on photometric residuals.

    Args:
      pose0: [B, 6] initial poses (solver convention).
      target_img/source_img: [B, H, W, 3]; depths [B, H, W, 1]; K [B, 3, 3].
      iters: static GN iterations.
      damping: Levenberg-Marquardt diagonal damping.
    """
    b = pose0.shape[0]
    eye6 = jnp.eye(6)
    if use_mxu_warp:
        # forward-mode MXU sampler (value + spatial Jacobian in one
        # kernel pass) — see solver/ba.py::_make_mxu_residual
        from tcsfm.solver.ba import _make_mxu_residual
        mxu_res = _make_mxu_residual(mxu_exact, mxu_band, interpret)

        def _res(pose, target_img, source_img, tgt_depth, src_depth, K):
            r = mxu_res(pose, tgt_depth, target_img, source_img,
                        src_depth, K)
            return r, None
    else:
        _res = _residuals

    def cost_of(pose):
        r, _ = _res(pose, target_img, source_img, tgt_depth,
                    src_depth, K)
        return jnp.sum(r * r, axis=(1, 2, 3))

    def step(carry, _):
        pose, lam, cost = carry
        r0, _ = _res(pose, target_img, source_img, tgt_depth,
                     src_depth, K)

        # J columns via jvp against the 6 basis directions (forward mode:
        # 6 extra warps, each cheap; no [Npix, 6] materialization beyond
        # what the einsum reductions consume)
        def r_of(p):
            return _res(p, target_img, source_img, tgt_depth,
                        src_depth, K)[0]

        cols = []
        for k in range(6):
            tangent = jnp.broadcast_to(eye6[k], (b, 6))
            _, Jk = jax.jvp(r_of, (pose,), (tangent,))
            cols.append(Jk)
        J = jnp.stack(cols, axis=-1)                  # [B, H, W, 3, 6]

        JtJ = jnp.einsum("bhwck,bhwcl->bkl", J, J)    # [B, 6, 6]
        Jtr = jnp.einsum("bhwck,bhwc->bk", J, r0)     # [B, 6]

        # Marquardt scaling: A = JtJ + λ·diag(JtJ) (+ small absolute floor)
        diag = JtJ * jnp.eye(6)
        A = JtJ + lam[:, None, None] * diag + 1e-8 * jnp.eye(6)
        # J here is ∂r/∂ξ, so the normal-equations step is δ = −A⁻¹ Jᵀ r
        delta = -jnp.linalg.solve(A, Jtr[..., None])[..., 0]
        new_pose = pose + delta

        # per-window trust region: accept + shrink λ, or reject + grow λ
        new_cost = cost_of(new_pose)
        better = new_cost < cost
        pose = jnp.where(better[:, None], new_pose, pose)
        cost = jnp.where(better, new_cost, cost)
        lam = jnp.where(better, lam * 0.3, lam * 5.0)
        lam = jnp.clip(lam, 1e-6, 1e6)
        return (pose, lam, cost), (cost, jnp.linalg.norm(delta, axis=-1))

    lam0 = jnp.full((b,), damping)
    cost0 = cost_of(pose0)
    (pose_final, _, _), (costs, dnorms) = jax.lax.scan(
        step, (pose0, lam0, cost0), None, length=iters)
    all_costs = jnp.concatenate([cost0[None], costs], axis=0)
    return GNResult(pose=pose_final, cost=all_costs, delta_norm=dnorms)
