"""TPU-native dense optical flow (Farneback polynomial expansion).

The reference feeds classical Farneback flow as two extra pose-network
input channels when ``flow_type == 'classical'`` (reference
data/kitti_loader_stereo.py:106-115 — ``cv2.calcOpticalFlowFarneback``
with params (0.5, 3, 15, 3, 5, 1.2, 0) on grayscale uint8 pairs, run
per-sample on the host inside DataLoader workers).

This module is the TPU-first re-design: the same two-frame polynomial
expansion algorithm (Farnebäck, SCIA 2003) expressed entirely as
separable correlations, box filters, and per-pixel 2x2 solves — all
jittable, batched, and fused by XLA, so whole minibatches of flow pairs
are computed on-device instead of one cv2 call per frame on the host.

Semantics follow OpenCV's implementation:
  * polynomial expansion with Gaussian applicability (``poly_n``,
    ``poly_sigma``), producing per-pixel channels (b_y, b_x, a_yy,
    a_xx, a_xy');
  * per-level iterative update: average A, displacement-compensated
    delta-b, box-averaged normal equations over ``winsize``, 2x2 solve;
  * image pyramid with Gaussian pre-smoothing and linear resize,
    flow upscaled by 1/pyr_scale between levels.

Border handling uses edge-clamped correlations plus the same 5-pixel
linear confidence ramp OpenCV applies near the frame edge (an
approximation of its exact ramp constants; flow interiors agree with
cv2 closely, borders within the ramp may differ slightly).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_BORDER = 5  # confidence-ramp width in pixels (OpenCV BORDER)


def rgb_to_gray(img: jax.Array) -> jax.Array:
    """[..., 3] float RGB in [0, 1] -> [...] luma in [0, 255].

    Matches PIL's ``convert('L')`` weights used by the reference loader
    (kitti_loader_stereo.py:108).
    """
    w = jnp.array([0.299, 0.587, 0.114], dtype=img.dtype)
    return jnp.tensordot(img, w, axes=[[-1], [0]]) * 255.0


@functools.lru_cache(maxsize=None)
def _poly_exp_constants(poly_n: int, poly_sigma: float):
    """1D applicability kernels + the inverse-G coefficients (host-side)."""
    n = (poly_n - 1) // 2
    x = np.arange(-n, n + 1, dtype=np.float64)
    g = np.exp(-(x ** 2) / (2.0 * poly_sigma ** 2))
    g /= g.sum()
    xg = x * g
    xxg = x * x * g

    # G = sum over the 2D window of w(x,y) * basis * basis^T with basis
    # (1, x, y, x^2, y^2, xy); its inverse has 4 distinct nonzero values.
    G = np.zeros((6, 6))
    for yi in x.astype(int):
        for xi in x.astype(int):
            w2 = g[yi + n] * g[xi + n]
            b = np.array([1.0, xi, yi, xi * xi, yi * yi, xi * yi])
            G += w2 * np.outer(b, b)
    invG = np.linalg.inv(G)
    ig11, ig03, ig33, ig55 = invG[1, 1], invG[0, 3], invG[3, 3], invG[5, 5]
    return (g.astype(np.float32), xg.astype(np.float32),
            xxg.astype(np.float32), float(ig11), float(ig03), float(ig33),
            float(ig55))


def _corr1d(img: jax.Array, kernel: np.ndarray, axis: int) -> jax.Array:
    """Edge-clamped 1D correlation along ``axis`` of [..., H, W]."""
    n = (len(kernel) - 1) // 2
    pads = [(0, 0)] * img.ndim
    pads[axis] = (n, n)
    padded = jnp.pad(img, pads, mode="edge")
    out = jnp.zeros_like(img)
    for k in range(len(kernel)):
        sl = [slice(None)] * img.ndim
        sl[axis] = slice(k, k + img.shape[axis])
        out = out + kernel[k] * padded[tuple(sl)]
    return out


def poly_expansion(img: jax.Array, poly_n: int = 5,
                   poly_sigma: float = 1.2) -> jax.Array:
    """Quadratic polynomial expansion of a grayscale image.

    Fits f(x) ~ x^T A x + b^T x + c over a Gaussian-weighted ``poly_n``
    window at every pixel via two separable correlation passes.

    Args:
      img: [..., H, W] grayscale.
    Returns:
      [..., H, W, 5] channels (b_y, b_x, a_yy, a_xx, a_xy') where a_xy'
      carries the OpenCV 2*A_xy convention consumed by `_update_matrices`.
    """
    g, xg, xxg, ig11, ig03, ig33, ig55 = _poly_exp_constants(
        poly_n, poly_sigma)
    ax_y, ax_x = img.ndim - 2, img.ndim - 1

    row_g = _corr1d(img, g, ax_y)
    row_xg = _corr1d(img, xg, ax_y)
    row_xxg = _corr1d(img, xxg, ax_y)

    b1 = _corr1d(row_g, g, ax_x)     # smoothed signal
    b2 = _corr1d(row_g, xg, ax_x)    # x-weighted
    b3 = _corr1d(row_xg, g, ax_x)    # y-weighted
    b4 = _corr1d(row_xxg, g, ax_x)   # y^2-weighted
    b5 = _corr1d(row_xg, xg, ax_x)   # xy-weighted
    b6 = _corr1d(row_g, xxg, ax_x)   # x^2-weighted

    return jnp.stack(
        [
            b3 * ig11,               # b_y
            b2 * ig11,               # b_x
            b1 * ig03 + b4 * ig33,   # a_yy
            b1 * ig03 + b6 * ig33,   # a_xx
            b5 * ig55,               # a_xy (OpenCV stores 2*A12 here)
        ],
        axis=-1,
    )


def _sample_clamped(field: jax.Array, fx: jax.Array,
                    fy: jax.Array) -> jax.Array:
    """Bilinear sample [H, W, C] at pixel coords (fx, fy), edge-clamped."""
    h, w, c = field.shape
    fx = jnp.clip(fx, 0.0, w - 1.0)
    fy = jnp.clip(fy, 0.0, h - 1.0)
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)

    flat = field.reshape(h * w, c)

    def tap(iy, ix):
        return jnp.take(flat, (iy * w + ix).reshape(-1), axis=0).reshape(
            h, w, c)

    return (
        tap(y0, x0) * ((1 - tx) * (1 - ty))[..., None]
        + tap(y0, x1) * (tx * (1 - ty))[..., None]
        + tap(y1, x0) * ((1 - tx) * ty)[..., None]
        + tap(y1, x1) * (tx * ty)[..., None]
    )


def _border_ramp(h: int, w: int) -> jax.Array:
    """[H, W] confidence in [~0.17, 1], ramping down near the frame edge."""
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    dy = jnp.minimum(ys, h - 1 - ys)
    dx = jnp.minimum(xs, w - 1 - xs)
    d = jnp.minimum(dy[:, None], dx[None, :])
    return jnp.clip((d + 1.0) / (_BORDER + 1.0), 0.0, 1.0)


def _update_matrices(r0: jax.Array, r1: jax.Array,
                     flow: jax.Array) -> jax.Array:
    """Per-pixel normal-equation entries for the Farneback update.

    Solves A d = db with A the averaged quadratic term and db the
    displacement-compensated linear-term difference, accumulating
    M = [A^T A (3 unique), A^T db (2)] for box averaging.

    Args:
      r0, r1: [H, W, 5] polynomial expansions of frames 0 and 1.
      flow:   [H, W, 2] current (dx, dy) estimate.
    Returns:
      [H, W, 5] M-field.
    """
    h, w, _ = r0.shape
    xs = jnp.arange(w, dtype=flow.dtype)[None, :]
    ys = jnp.arange(h, dtype=flow.dtype)[:, None]
    dx, dy = flow[..., 0], flow[..., 1]
    r1s = _sample_clamped(r1, xs + dx, ys + dy)

    a_yy = (r0[..., 2] + r1s[..., 2]) * 0.5
    a_xx = (r0[..., 3] + r1s[..., 3]) * 0.5
    a_xy = (r0[..., 4] + r1s[..., 4]) * 0.25
    db_y = (r0[..., 0] - r1s[..., 0]) * 0.5 + a_yy * dy + a_xy * dx
    db_x = (r0[..., 1] - r1s[..., 1]) * 0.5 + a_xy * dy + a_xx * dx

    s = _border_ramp(h, w).astype(flow.dtype)
    a_yy, a_xx, a_xy = a_yy * s, a_xx * s, a_xy * s
    db_y, db_x = db_y * s, db_x * s

    return jnp.stack(
        [
            a_yy * a_yy + a_xy * a_xy,          # g11
            (a_yy + a_xx) * a_xy,               # g12
            a_xx * a_xx + a_xy * a_xy,          # g22
            a_yy * db_y + a_xy * db_x,          # h1 (y)
            a_xy * db_y + a_xx * db_x,          # h2 (x)
        ],
        axis=-1,
    )


def _box_blur(m: jax.Array, winsize: int) -> jax.Array:
    """Separable, normalized, edge-clamped box filter over [H, W, C]."""
    k = np.full(winsize, 1.0 / winsize, dtype=np.float32)
    m = _corr1d(jnp.moveaxis(m, -1, 0), k, axis=1)
    m = _corr1d(m, k, axis=2)
    return jnp.moveaxis(m, 0, -1)


def _solve_flow(m: jax.Array) -> jax.Array:
    """2x2 solve of the blurred normal equations -> [H, W, 2] (dx, dy)."""
    g11, g12, g22, h1, h2 = (m[..., i] for i in range(5))
    det = g11 * g22 - g12 * g12
    idet = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)
    fx = (g11 * h2 - g12 * h1) * idet
    fy = (g22 * h1 - g12 * h2) * idet
    return jnp.stack([fx, fy], axis=-1)


def _gaussian_blur(img: jax.Array, sigma: float) -> jax.Array:
    if sigma <= 0:
        return img
    n = max(1, int(round(sigma * 2.5)))
    x = np.arange(-n, n + 1, dtype=np.float64)
    k = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    k = (k / k.sum()).astype(np.float32)
    img = _corr1d(img, k, img.ndim - 2)
    return _corr1d(img, k, img.ndim - 1)


def farneback_flow(
    img0: jax.Array,
    img1: jax.Array,
    pyr_scale: float = 0.5,
    levels: int = 3,
    winsize: int = 15,
    iterations: int = 3,
    poly_n: int = 5,
    poly_sigma: float = 1.2,
) -> jax.Array:
    """Dense flow from frame 0 to frame 1 (grayscale [H, W] -> [H, W, 2]).

    Default parameters mirror the reference's cv2 call
    (kitti_loader_stereo.py:110). Jittable; batch with ``vmap``/
    `batched_flow_pair`. ``levels`` counts *extra* pyramid levels above
    full resolution, matching cv2.
    """
    h, w = img0.shape[-2:]
    img0 = img0.astype(jnp.float32)
    img1 = img1.astype(jnp.float32)

    # Clamp the pyramid so the coarsest level still fits the averaging
    # window: below ~winsize pixels the displacement estimate falls into
    # aliased basins and poisons every finer level (cv2 escapes this only
    # because uint8 quantization flattens its coarsest levels to zero
    # flow). Deliberate robustness deviation from cv2.
    while levels > 0 and round(min(h, w) * pyr_scale ** levels) < winsize:
        levels -= 1

    # Coarse-to-fine: level k processed at scale pyr_scale**k.
    flow = None
    for k in range(levels, -1, -1):
        scale = pyr_scale ** k
        lh, lw = max(int(round(h * scale)), poly_n), max(
            int(round(w * scale)), poly_n)
        sigma = (1.0 / scale - 1.0) * 0.5
        i0 = jax.image.resize(_gaussian_blur(img0, sigma), (lh, lw),
                              "linear")
        i1 = jax.image.resize(_gaussian_blur(img1, sigma), (lh, lw),
                              "linear")

        if flow is None:
            flow = jnp.zeros((lh, lw, 2), jnp.float32)
        else:
            prev = flow.shape[:2]
            flow = jax.image.resize(flow, (lh, lw, 2), "linear")
            flow = flow * jnp.array(
                [lw / prev[1], lh / prev[0]], jnp.float32)

        r0 = poly_expansion(i0, poly_n, poly_sigma)
        r1 = poly_expansion(i1, poly_n, poly_sigma)
        for _ in range(iterations):
            flow = _solve_flow(_box_blur(_update_matrices(r0, r1, flow),
                                         winsize))
    return flow


@functools.partial(jax.jit, static_argnames=("normalize",))
def batched_flow_pair(target: jax.Array, source: jax.Array,
                      normalize: bool = True
                      ) -> Tuple[jax.Array, jax.Array]:
    """Forward + backward flow for a batch of RGB pairs, on device.

    The reference computes flow target->source on the host per sample and
    (note the swap at kitti_loader_stereo.py:110-115) stores the
    *backward* flow under the 'fwd' key; the pose net therefore sees
    source->target flow alongside (target, source). We keep the plain
    semantics: returns (flow_fwd = target->source, flow_back =
    source->target), both [B, H, W, 2].

    Args:
      target, source: [B, H, W, 3] RGB in [0, 1].
      normalize: scale pixel-unit flow by 1/width into roughly [-1, 1]
        (network-friendly; the reference feeds raw pixel units).
    """
    g_t = rgb_to_gray(target)
    g_s = rgb_to_gray(source)
    fwd = jax.vmap(farneback_flow)(g_t, g_s)
    back = jax.vmap(farneback_flow)(g_s, g_t)
    if normalize:
        fwd = fwd / target.shape[2]
        back = back / target.shape[2]
    return fwd, back
