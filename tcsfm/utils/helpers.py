"""Small numeric helpers shared across the framework.

Replacements for utils/learning_helpers.py:77-123 in the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def disp_to_depth(disp: jax.Array, min_depth: float, max_depth: float):
    """Sigmoid disparity → (scaled_disp, depth) (learning_helpers.py:77-86).

    d = 1 / (1/max + (1/min - 1/max) * disp)
    """
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    return scaled_disp, 1.0 / scaled_disp


def depth_to_disp(depth: jax.Array, min_depth: float, max_depth: float):
    """Inverse of disp_to_depth (learning_helpers.py:89-98)."""
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    return (1.0 / depth - min_disp) / (max_disp - min_disp)


def post_process_disparity(l_disp: jax.Array, r_disp: jax.Array) -> jax.Array:
    """Monodepth1 flip-merge post-processing (learning_helpers.py:115-123).

    l_disp, r_disp: [B, H, W] — disparity of the image and of the flipped
    image (already un-flipped). Blends with edge-favouring ramp masks.
    """
    b, h, w = l_disp.shape
    m_disp = 0.5 * (l_disp + r_disp)
    ramp = jnp.linspace(0.0, 1.0, w)[None, None, :]
    l_mask = 1.0 - jnp.clip(20.0 * (ramp - 0.05), 0.0, 1.0)
    r_mask = l_mask[:, :, ::-1]
    return r_mask * l_disp + l_mask * r_disp + (1.0 - l_mask - r_mask) * m_disp
