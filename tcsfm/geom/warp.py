"""Differentiable inverse warping (the per-pixel hot loop of the framework).

TPU-native re-design of the reference warp stack (models/stn.py:161-273):
backproject → rigid transform → project → bilinear gather, in NHWC layout,
fully jittable with static shapes. JAX has no ``grid_sample``; the bilinear
sampler here reproduces torch's ``F.grid_sample(..., align_corners=False,
padding_mode='zeros')`` semantics exactly (corner-weighted gather with
out-of-bounds taps contributing zero), including the reference's
align_corners=True *normalization* at stn.py:221-222 feeding an
align_corners=False *sampler* at stn.py:266.

A fused Pallas kernel for the same computation lives in
``tcsfm.ops.warp_pallas``; this module is the XLA reference implementation
used for parity tests and as the fallback path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from tcsfm.geom.camera import backproject, inv_intrinsics, pixel_grid
from tcsfm.geom.se3 import pose_vec2mat

_mm = functools.partial(jnp.matmul, precision=lax.Precision.HIGHEST)


def grid_sample(img: jax.Array, coords: jax.Array) -> jax.Array:
    """Bilinear sampling with zeros padding, align_corners=False.

    Args:
      img:    [B, H, W, C] source image.
      coords: [B, H, W, 2] normalized (x, y) in [-1, 1].
    Returns:
      [B, H, W, C] sampled image; out-of-bounds taps contribute 0.
    """
    b, h, w, c = img.shape
    # align_corners=False un-normalization: x = ((g + 1) * W - 1) / 2
    x = ((coords[..., 0] + 1.0) * w - 1.0) * 0.5
    y = ((coords[..., 1] + 1.0) * h - 1.0) * 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wx0 = 1.0 - wx1
    wy1 = y - y0
    wy0 = 1.0 - wy1

    def gather(ix, iy):
        """Gather img[b, iy, ix, :] with zero padding for OOB indices."""
        inb = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
        ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        flat = (iyc * w + ixc).reshape(b, h * w)                   # [B, HW]
        vals = jnp.take_along_axis(
            img.reshape(b, h * w, c), flat[..., None], axis=1
        ).reshape(b, h, w, c)
        return vals * inb[..., None].astype(img.dtype)

    out = (
        gather(x0, y0) * (wx0 * wy0)[..., None]
        + gather(x1, y0) * (wx1 * wy0)[..., None]
        + gather(x0, y1) * (wx0 * wy1)[..., None]
        + gather(x1, y1) * (wx1 * wy1)[..., None]
    )
    return out


def _project_with_mask(cam_coords, K, pose_mat, h, w, zeros_padding=True):
    """Transform + project points, emitting coords, computed depth and mask.

    Mirrors cam2pixel2 (models/stn.py:198-231): Z clamped at 1e-3, the
    align_corners=True style normalization, and — for zeros padding — the
    out-of-bounds push to 2.0 with a stopped gradient (the torch masked
    assignment at stn.py:224-228 detaches the mask).
    """
    P = _mm(K, pose_mat)                               # [B, 3, 4]
    rot, tr = P[..., :3], P[..., 3:4]
    pcoords = _mm(rot, cam_coords) + tr                # [B, 3, HW]
    X, Y = pcoords[:, 0], pcoords[:, 1]
    Z = jnp.maximum(pcoords[:, 2], 1e-3)

    x_norm = 2.0 * (X / Z) / (w - 1) - 1.0
    y_norm = 2.0 * (Y / Z) / (h - 1) - 1.0
    if zeros_padding:
        x_oob = jnp.abs(x_norm) > 1.0
        y_oob = jnp.abs(y_norm) > 1.0
        # where() zeroes the gradient on the pushed branch, matching the
        # detached masked assignment in the reference.
        x_norm = jnp.where(x_oob, 2.0, x_norm)
        y_norm = jnp.where(y_oob, 2.0, y_norm)

    b = cam_coords.shape[0]
    coords = jnp.stack([x_norm, y_norm], axis=-1).reshape(b, h, w, 2)
    valid = (jnp.maximum(jnp.abs(x_norm), jnp.abs(y_norm)) <= 1.0).reshape(b, h, w)
    return coords, Z.reshape(b, h, w), valid


def inverse_warp2_mxu(img: jax.Array, depth: jax.Array, ref_depth: jax.Array,
                      pose: jax.Array, K: jax.Array, band: int = 32,
                      exact=True, guard=True, sample_depth: bool = True,
                      img_grad: bool = True, interpret: bool = False):
    """inverse_warp2 on the MXU sampling kernel (differentiable).

    Fuses the image and source-depth resampling into ONE 4-channel kernel
    call (the reference runs two grid_samples, stn.py:266,271). ~10-20x
    faster than the XLA gather path on TPU; gradients w.r.t. the sampled
    image/depth and the coordinates flow through the custom-VJP Pallas
    backward kernels (tcsfm/ops/warp_mxu_grad.py).

    ``exact``: True → all 4 packed channels f32-exact (hi/lo split);
    False → single bf16 pass; "mixed" → RGB in one bf16 pass (error below
    the 8-bit source quantization) while the sampled source DEPTH stays
    f32-exact (it feeds the depth-consistency term and the solver's
    projected-depth comparison, where bf16's 0.4% relative error is NOT
    below the data's noise floor). Mixed costs 5/8 of exact's matmul rows.
    "uint8" → RGB via the single-pass 255x integer path — f32-EXACT for
    uint8-sourced frames (JPEG-decoded k/255 values; see
    ops/warp_mxu.grid_sample_mxu) at mixed's cost — and the source depth
    hi/lo f32-exact. The right mode whenever the CLEAN image stream feeds
    the warp (VO eval, PFT, ScanNet); jittered augmentation streams are
    not uint8-quantized and should keep exact=True.

    ``sample_depth=False`` skips resampling the source depth entirely
    (the packed call becomes 3-channel; ``projected_depth`` returns None)
    — the right mode for pure pose inference, where only the warped image
    and valid mask are consumed. 3/4 of the matmul rows + DMA traffic.

    ``img_grad=False`` declares ``img`` a data leaf (a video frame, not a
    network output): the backward then skips d_img for the RGB channels —
    their transposed matmuls and, with ``sample_depth=False``, the whole
    sequential read-modify-write d_img chain — and returns an exact zero
    cotangent for them. The resampled source DEPTH channel (which IS
    network output) keeps its full d_img. Gradients w.r.t. depth/pose
    (through the coordinates) are bit-identical either way. Every
    internal caller (solver, losses) samples camera frames and sets
    False; the default stays True for API safety.

    The banded kernel is exact only while a pixel's vertical source taps
    fall inside its 8-output-row group's ``band``-row DMA window. The
    ``guard`` modes keep that from silently corrupting anything:

      * ``True`` / ``"mask"`` (default): AND the per-pixel band-coverage
        flag into the valid mask — out-of-band pixels become *invalid*
        (exactly like out-of-view pixels: zero contribution to losses,
        solver reconstructions, and gradients) while every in-band pixel
        stays exact and the kernel runs unconditionally at MXU speed.
        An all-or-nothing ``lax.cond`` fallback was measured 3.8x slower
        end-to-end whenever any group violates (random-init depth nets
        violate ~1/3 of groups).
      * ``"fallback"``: check coverage per call and fall back to the XLA
        gather path for the whole batch via ``lax.cond`` — bit-identical
        to ``inverse_warp2`` under violation, at gather speed.
      * ``False``: no guard (violating pixels silently sample zeros but
        remain marked valid — only for benchmarking the raw kernel).
    """
    from tcsfm.ops.warp_mxu import (band_coverage_mask, band_geometry,
                                    grid_sample_mxu_diff, horizontal_band_ok,
                                    vertical_band_ok)

    b, h, w, _ = img.shape
    cam = backproject(depth, K)
    pose_mat = pose_vec2mat(pose[..., :6])
    coords, computed_depth, valid = _project_with_mask(cam, K, pose_mat, h, w)

    u8 = ()
    if exact == "uint8":
        u8 = (0, 1, 2)                   # the RGB channels (see docstring)
        exact = (3,) if sample_depth else ()
    if sample_depth:
        packed = jnp.concatenate([img, ref_depth], axis=-1)  # [B, H, W, 4]
        if exact == "mixed":
            exact = (3,)                 # depth channel only (see docstring)
    else:
        packed = img                                         # [B, H, W, 3]
        if exact == "mixed":
            exact = False                # no depth channel → RGB bf16 pass
    # channels whose d_img the graph consumes: none of the RGB data
    # channels when img_grad=False; the sampled source depth always
    grad_ch = None
    if not img_grad:
        grad_ch = (3,) if sample_depth else ()
    if guard == "fallback":
        bv, wp = band_geometry(h, w, band)
        ok = (jnp.all(vertical_band_ok(coords, h, bv))
              & jnp.all(horizontal_band_ok(coords, w, wp)))
        sampled = lax.cond(
            ok,
            lambda p, c: grid_sample_mxu_diff(p, c, band, interpret,
                                              exact, u8, grad_ch),
            grid_sample,
            packed, coords,
        )
    else:
        sampled = grid_sample_mxu_diff(packed, coords, band, interpret,
                                       exact, u8, grad_ch)
        if guard:                                           # "mask" / True
            bv, wp = band_geometry(h, w, band)
            in_band = lax.stop_gradient(
                band_coverage_mask(coords, h, bv, W=w, Wp=wp))
            valid = valid & in_band
    warped_img = sampled[..., :3]
    projected_depth = sampled[..., 3:4] if sample_depth else None
    valid_mask = valid[..., None].astype(img.dtype)
    return warped_img, valid_mask, projected_depth, computed_depth[..., None]


def inverse_warp2(img: jax.Array, depth: jax.Array, ref_depth: jax.Array,
                  pose: jax.Array, K: jax.Array):
    """Warp a source image into the target frame using target depth + pose.

    TPU-native equivalent of inverse_warp2 (models/stn.py:234-273), NHWC.

    Args:
      img:       [B, H, W, C] source image (sampled from).
      depth:     [B, H, W, 1] target-frame depth.
      ref_depth: [B, H, W, 1] source-frame depth (sampled from).
      pose:      [B, 6] pose vector [tx ty tz rx ry rz] (target→source).
      K:         [B, 3, 3] intrinsics.

    Returns:
      warped_img:      [B, H, W, C] source warped into the target frame.
      valid_mask:      [B, H, W, 1] float 1.0 where the projection lands
                       inside the source image.
      projected_depth: [B, H, W, 1] source depth sampled at the projection.
      computed_depth:  [B, H, W, 1] source-frame depth computed from the
                       target depth and the pose.
    """
    b, h, w, _ = img.shape
    cam = backproject(depth, K)                        # [B, 3, HW]
    pose_mat = pose_vec2mat(pose[..., :6])             # [B, 3, 4]
    coords, computed_depth, valid = _project_with_mask(cam, K, pose_mat, h, w)

    warped_img = grid_sample(img, coords)
    projected_depth = grid_sample(ref_depth, coords)
    valid_mask = valid[..., None].astype(img.dtype)
    return warped_img, valid_mask, projected_depth, computed_depth[..., None]


def inverse_warp(img: jax.Array, depth: jax.Array, pose: jax.Array,
                 K: jax.Array, rotation_mode: str = "euler"):
    """Legacy single-output warp (models/stn.py:161-195): no depth resampling.

    Args:
      img:   [B, H, W, C]; depth: [B, H, W] or [B, H, W, 1]; pose: [B, 6].
    Returns:
      (warped_img [B, H, W, C], valid [B, H, W] bool).
    """
    if depth.ndim == 3:
        depth = depth[..., None]
    b, h, w, _ = img.shape
    cam = backproject(depth, K)
    pose_mat = pose_vec2mat(pose, rotation_mode)
    coords, _, valid = _project_with_mask(cam, K, pose_mat, h, w,
                                          zeros_padding=False)
    return grid_sample(img, coords), valid
