"""Pinhole camera back-projection / projection in NHWC layout.

TPU-native equivalents of the reference's pixel2cam/cam2pixel pair
(models/stn.py:33-78) and of DNet's BackprojectDepth/Project3D
(models/dnet_layers.py:133-191), expressed as batched matmuls over a
flattened pixel grid so XLA can fuse them with surrounding elementwise work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

# Full-f32 matmul: geometry projection error must stay at float32 level on
# TPU (the default matmul precision there is bf16-based).
_mm = functools.partial(jnp.matmul, precision=lax.Precision.HIGHEST)


@functools.lru_cache(maxsize=None)
def _pixel_grid_cached(h: int, w: int):
    """Homogeneous pixel grid [3, H*W] with rows (x, y, 1). Host-side cache."""
    import numpy as np

    xs, ys = np.meshgrid(np.arange(w), np.arange(h))  # [H, W]
    grid = np.stack([xs.ravel(), ys.ravel(), np.ones(h * w)], axis=0)
    return grid.astype(np.float32)


def pixel_grid(h: int, w: int, dtype=jnp.float32) -> jax.Array:
    """Homogeneous pixel coordinates [3, H*W], rows (x, y, 1)."""
    return jnp.asarray(_pixel_grid_cached(h, w), dtype=dtype)


def inv_intrinsics(K: jax.Array) -> jax.Array:
    """Closed-form inverse of [..., 3, 3] pinhole intrinsics (no solve)."""
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    s = K[..., 0, 1]
    zr = jnp.zeros_like(fx)
    o = jnp.ones_like(fx)
    inv_fx, inv_fy = 1.0 / fx, 1.0 / fy
    row0 = jnp.stack([inv_fx, -s * inv_fx * inv_fy, (s * cy - cx * fy) * inv_fx * inv_fy], -1)
    row1 = jnp.stack([zr, inv_fy, -cy * inv_fy], -1)
    row2 = jnp.stack([zr, zr, o], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def backproject(depth: jax.Array, K: jax.Array) -> jax.Array:
    """Depth [B, H, W] (or [B, H, W, 1]) + intrinsics [B, 3, 3] → [B, 3, H*W] points.

    cam = depth * K^{-1} [x y 1]^T  (models/stn.py:33-48, dnet_layers.py:159-165).
    """
    if depth.ndim == 4:
        depth = depth[..., 0]
    b, h, w = depth.shape
    grid = pixel_grid(h, w, depth.dtype)              # [3, HW]
    rays = _mm(inv_intrinsics(K), grid)               # [B, 3, HW]
    return rays * depth.reshape(b, 1, h * w)


def project(points: jax.Array, K: jax.Array, h: int, w: int,
            eps: float = 1e-3) -> tuple[jax.Array, jax.Array]:
    """Project [B, 3, HW] camera points with intrinsics → normalized coords.

    Returns (coords [B, H, W, 2] in [-1, 1] convention 2*(u/(W-1))-1, depth
    [B, H, W]). Matches cam2pixel's normalization (models/stn.py:71-78).
    """
    b = points.shape[0]
    pix = _mm(K, points)                               # [B, 3, HW]
    X, Y = pix[:, 0], pix[:, 1]
    Z = jnp.maximum(pix[:, 2], eps)
    x_norm = 2.0 * (X / Z) / (w - 1) - 1.0
    y_norm = 2.0 * (Y / Z) / (h - 1) - 1.0
    coords = jnp.stack([x_norm, y_norm], axis=-1).reshape(b, h, w, 2)
    return coords, Z.reshape(b, h, w)
