"""Batched SE(3)/SO(3) operations in pure JAX.

First-party replacement for the external ``liegroups`` dependency and the
Euler-angle utilities of the reference (models/stn.py:81-158,
utils/geometry_helpers.py:5-40). Everything here is jit/vmap/grad friendly:
batched, static-shaped, and built from closed-form series with Taylor
fallbacks near theta = 0 so gradients stay finite.

Conventions (matching the reference):
  * 6-DoF pose vectors are ``[tx ty tz rx ry rz]`` (translation first).
  * ``euler2mat`` composes ``R = Rx @ Ry @ Rz`` (models/stn.py:115).
  * ``se3_exp``/``se3_log`` use the *translation-first* xi = [rho, phi]
    ordering so they round-trip the reference's ``SE3.exp(pose_vec)``
    trajectory integration (validate.py:64-68).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_EPS = 1e-8

# Geometry matmuls are tiny (3x3) but accuracy-critical: on TPU the default
# f32 matmul precision is bf16-based and costs ~1e-3 error, which is fatal
# for pose composition. Pin to HIGHEST (full f32) — negligible FLOPs.
_mm = functools.partial(jnp.matmul, precision=lax.Precision.HIGHEST)


def _stack33(rows):
    """Build [..., 3, 3] from 9 same-shaped entries (row major)."""
    return jnp.stack(
        [jnp.stack(rows[0:3], axis=-1),
         jnp.stack(rows[3:6], axis=-1),
         jnp.stack(rows[6:9], axis=-1)],
        axis=-2,
    )


def euler2mat(angle: jax.Array) -> jax.Array:
    """Euler angles [..., 3] (rx, ry, rz) → rotation matrices [..., 3, 3].

    Composition order R = Rx @ Ry @ Rz, identical to models/stn.py:81-116.
    """
    x, y, z = angle[..., 0], angle[..., 1], angle[..., 2]
    o = jnp.ones_like(x)
    zr = jnp.zeros_like(x)

    cz, sz = jnp.cos(z), jnp.sin(z)
    zmat = _stack33([cz, -sz, zr, sz, cz, zr, zr, zr, o])
    cy, sy = jnp.cos(y), jnp.sin(y)
    ymat = _stack33([cy, zr, sy, zr, o, zr, -sy, zr, cy])
    cx, sx = jnp.cos(x), jnp.sin(x)
    xmat = _stack33([o, zr, zr, zr, cx, -sx, zr, sx, cx])
    return _mm(_mm(xmat, ymat), zmat)


def quat2mat(quat: jax.Array) -> jax.Array:
    """[..., 3] imaginary quaternion coeffs → [..., 3, 3] rotations.

    The real part is fixed at 1 before normalization (models/stn.py:119-140).
    """
    w = jnp.ones_like(quat[..., :1])
    q = jnp.concatenate([w, quat], axis=-1)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return _stack33([
        w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
        2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
        2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
    ])


def pose_vec2mat(vec: jax.Array, rotation_mode: str = "euler") -> jax.Array:
    """6-DoF pose vector [..., 6] → [..., 3, 4] transform (models/stn.py:143-158)."""
    t = vec[..., :3, None]
    rot = vec[..., 3:6]
    if rotation_mode == "euler":
        R = euler2mat(rot)
    elif rotation_mode == "quat":
        R = quat2mat(rot)
    else:
        raise ValueError(rotation_mode)
    return jnp.concatenate([R, t], axis=-1)


def pose_vec2mat44(vec: jax.Array, rotation_mode: str = "euler") -> jax.Array:
    """6-DoF pose vector [..., 6] → [..., 4, 4] homogeneous transform."""
    T34 = pose_vec2mat(vec, rotation_mode)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], T34.dtype), T34.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([T34, bottom], axis=-2)


# --------------------------------------------------------------------------
# SO(3) / SE(3) exponential and logarithm maps
# --------------------------------------------------------------------------

def skew(v: jax.Array) -> jax.Array:
    """[..., 3] → [..., 3, 3] cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zr = jnp.zeros_like(x)
    return _stack33([zr, -z, y, z, zr, -x, -y, x, zr])


def _safe_theta(theta2):
    """(small_mask, safe_theta2, theta): double-where guard so the gradient of
    the *unselected* branch never sees theta=0 (where-NaN-grad pitfall)."""
    small = theta2 < 1e-8
    safe_theta2 = jnp.where(small, jnp.ones_like(theta2), theta2)
    return small, safe_theta2, jnp.sqrt(safe_theta2)


def _sin_theta_over_theta(theta2):
    """sin(t)/t with Taylor fallback; takes theta^2 to stay differentiable."""
    small, t2, theta = _safe_theta(theta2)
    return jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)


def _one_minus_cos_over_theta2(theta2):
    small, t2, theta = _safe_theta(theta2)
    return jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / t2)


def _theta_minus_sin_over_theta3(theta2):
    small, t2, theta = _safe_theta(theta2)
    return jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (t2 * theta)
    )


def so3_exp(phi: jax.Array) -> jax.Array:
    """Rotation-vector [..., 3] → [..., 3, 3] via Rodrigues' formula."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    K = skew(phi)
    A = _sin_theta_over_theta(theta2)[..., None, None]
    B = _one_minus_cos_over_theta2(theta2)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + A * K + B * _mm(K, K)


def so3_log(R: jax.Array) -> jax.Array:
    """[..., 3, 3] rotation → [..., 3] rotation vector.

    Stable for theta in [0, pi); the SfM use case only sees small
    inter-frame rotations, matching the reference's use of liegroups
    ``SO3.log`` on frame-to-frame transforms.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_theta)
    vee = jnp.stack(
        [R[..., 2, 1] - R[..., 1, 2],
         R[..., 0, 2] - R[..., 2, 0],
         R[..., 1, 0] - R[..., 0, 1]],
        axis=-1,
    )
    # vee = 2 sin(theta) * axis ; phi = theta * axis
    theta2 = theta * theta
    small = theta2 < 1e-8
    safe_theta = jnp.where(small, jnp.ones_like(theta), theta)
    scale = 0.5 / jnp.where(
        small, 1.0 - theta2 / 6.0, jnp.sin(safe_theta) / safe_theta
    )
    return scale[..., None] * vee


def _left_jacobian(phi: jax.Array) -> jax.Array:
    """SO(3) left Jacobian J_l(phi): V matrix of the SE(3) exp."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    K = skew(phi)
    B = _one_minus_cos_over_theta2(theta2)[..., None, None]
    C = _theta_minus_sin_over_theta3(theta2)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + B * K + C * _mm(K, K)


def _left_jacobian_inv(phi: jax.Array) -> jax.Array:
    theta2 = jnp.sum(phi * phi, axis=-1)
    small, t2, theta = _safe_theta(theta2)
    K = skew(phi)
    half = 0.5 * theta
    cot_coeff = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.sin(half)) / t2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye - 0.5 * K + cot_coeff[..., None, None] * _mm(K, K)


def se3_exp(xi: jax.Array) -> jax.Array:
    """se(3) vector [..., 6] = [rho, phi] → [..., 4, 4] transform.

    Translation-first ordering matches liegroups' ``SE3.exp`` as used for
    trajectory integration at validate.py:64.
    """
    rho, phi = xi[..., :3], xi[..., 3:6]
    R = so3_exp(phi)
    t = _mm(_left_jacobian(phi), rho[..., None])[..., 0]
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], xi.dtype), xi.shape[:-1] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_log(T: jax.Array) -> jax.Array:
    """[..., 4, 4] transform → [..., 6] = [rho, phi]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    phi = so3_log(R)
    rho = _mm(_left_jacobian_inv(phi), t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def se3_inv(T: jax.Array) -> jax.Array:
    """[..., 4, 4] rigid transform inverse (uses R^T, no general solve)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    t_inv = -_mm(Rt, t[..., None])
    top = jnp.concatenate([Rt, t_inv], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], T.dtype), T.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_from_matrix(T: jax.Array, normalize: bool = True) -> jax.Array:
    """Project a noisy [..., 4, 4] onto SE(3) (liegroups from_matrix(normalize=True)).

    Uses SVD orthogonalization of the rotation block.
    """
    if not normalize:
        return T
    R = T[..., :3, :3]
    U, _, Vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(_mm(U, Vt))
    D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    Rn = _mm(U, D[..., :, None] * Vt)
    top = jnp.concatenate([Rn, T[..., :3, 3:4]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], T.dtype), T.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)
