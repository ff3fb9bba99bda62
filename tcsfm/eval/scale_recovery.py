"""DNet ground-plane scale recovery, jittable with static shapes.

TPU-native re-design of ScaleRecovery (models/dnet_layers.py:249-327):
back-project depth, estimate surface normals from 4 cross-product
stencils, mask near-vertical normals below the camera, and take the
median masked per-pixel camera height; scale = real_height / est_height.

The reference's boolean ``masked_select`` + ``torch.median`` is dynamic-
shaped; here the masked median is a k-th order statistic on a sorted
array with invalid entries pushed to +inf (k = (n_valid - 1) // 2, the
lower median — exactly torch.median's convention), keeping shapes static
under jit.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax

from tcsfm.geom.camera import backproject

_mm = functools.partial(jnp.matmul, precision=lax.Precision.HIGHEST)


def _normalize(v, axis, eps=1e-12):
    return v / jnp.sqrt(
        jnp.maximum(jnp.sum(v * v, axis=axis, keepdims=True), eps)
    )


def surface_normals(points: jax.Array) -> jax.Array:
    """Per-pixel surface normals from 3D points [B, H, W, 3] → [B, H, W, 3].

    Four cross-product stencils over ±1-pixel neighbours, averaged and
    normalized, then reflection-padded back to full size
    (dnet_layers.py:260-291).
    """
    c = points[:, 1:-1, 1:-1]
    x0 = points[:, 1:-1, :-2] - c
    x1 = points[:, 1:-1, 2:] - c
    y0 = points[:, :-2, 1:-1] - c
    y1 = points[:, 2:, 1:-1] - c
    x0y0 = points[:, :-2, :-2] - c
    x0y1 = points[:, 2:, :-2] - c
    x1y0 = points[:, :-2, 2:] - c
    x1y1 = points[:, 2:, 2:] - c

    n0 = _normalize(jnp.cross(x0, y0), axis=-1)
    n1 = _normalize(jnp.cross(x1, y1), axis=-1)
    n2 = _normalize(jnp.cross(x0y0, x0y1), axis=-1)
    n3 = _normalize(jnp.cross(x1y0, x1y1), axis=-1)
    normals = _normalize((n0 + n1 + n2 + n3) / 4.0, axis=-1)
    return jnp.pad(normals, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")


def ground_mask(points: jax.Array, normals: jax.Array,
                threshold_deg: float = 5.0) -> jax.Array:
    """Near-vertical-normal pixels below the camera (dnet_layers.py:293-307).

    points, normals: [B, H, W, 3]. Returns bool [B, H, W].
    """
    thr = math.cos(math.radians(threshold_deg))
    n = _normalize(normals, axis=-1, eps=1e-12)
    cos_sim = n[..., 1]  # dot with vertical (0, 1, 0)
    vertical = (cos_sim > thr) | (cos_sim < -thr)
    return vertical & (points[..., 1] > 0)


def masked_median(values: jax.Array, mask: jax.Array) -> jax.Array:
    """Lower median of ``values`` where ``mask`` — static shapes.

    torch.median convention: for even counts the lower middle is returned.
    """
    flat_v = values.reshape(-1)
    flat_m = mask.reshape(-1)
    n_valid = jnp.sum(flat_m)
    sortable = jnp.where(flat_m, flat_v, jnp.inf)
    s = jnp.sort(sortable)
    k = jnp.maximum((n_valid - 1) // 2, 0).astype(jnp.int32)
    return s[k]


def scale_recovery(depth: jax.Array, K: jax.Array,
                   real_cam_height: float | jax.Array) -> jax.Array:
    """Estimate the metric scale factor from ground-plane geometry.

    Args:
      depth: [B, H, W] or [B, H, W, 1] predicted depth.
      K:     [B, 3, 3] intrinsics.
      real_cam_height: true camera height in the depth's metric units.

    Returns scalar scale factor (dnet_layers.py:309-327). The median is
    taken over the whole batch, as in the reference.
    """
    if depth.ndim == 4:
        depth = depth[..., 0]
    b, h, w = depth.shape
    pts = backproject(depth, K).reshape(b, 3, h, w).transpose(0, 2, 3, 1)
    normals = surface_normals(pts)
    gmask = ground_mask(pts, normals)
    heights = jnp.abs(jnp.sum(pts * normals, axis=-1))
    cam_height = masked_median(heights, gmask)
    return real_cam_height / cam_height
