"""Per-stage pose-net timing probe + conv2 rewrite candidates (round-5
verdict #4 follow-up: after the im2col negative result, attack the most
lane-starved remaining conv).

The pose net costs ~4.75 ms x 4 solver iterations = ~19 ms of the 36 ms
forward — the single biggest component. Its FLOPs are trivial (~10 GFLOP
over 24 pairs, ~0.05 ms at peak); the cost is scheduling/lane-occupancy
at 16-64 channel widths. conv1 (7x7s2, 6ch) already rides the WSConv
width-space-to-depth rewrite; conv2 (5x5s2, 16->32 at 96x320) is the
next lane-starved stage (32 of 128 output lanes, 400-deep contraction).

Candidates, all EXACT regroupings of the same multiply-adds:
  * literal      — lax.conv as today;
  * width_s2d    — the WSConv embedding generalized to in_ch=16: fold 16
                   input columns into channels (16 -> 256), embed the
                   5-tap kernel into [5, 3, 256, 8*32]; each matmul emits
                   8 output columns x 32 ch = 256 lanes. 48/k = 9.6x
                   redundant FLOPs (structural zeros in the embedding).
  * s2d2x2       — StemConv generalization: fold 2x2 pixel blocks
                   (16 -> 64 ch), zero-pad the 5x5 kernel to 6x6 and
                   regroup as 3x3 over 64 ch, stride 1 at half res.
                   Same FLOPs as literal, deeper contraction (576), but
                   output lanes stay at 32.

Methodology: every number is K=20 scan-chained into one fetch (the only
methodology that survives the remote tunnel — see the im2col probe's
three-stage history in probe_conv_im2col.py).

Measured (v5e, 2026-08-20, this probe, K=20 chained, tunnel latency
24.5 ms):

    pose net full (24 pairs)      1.419 ms   (profile_components had
                                              reported 4.75 — that
                                              number was fetch noise)
    stage conv1 [24,192,640,6]    0.585 ms   (already width-s2d)
    stage conv2 [24,96,320,16]    0.494 ms
    stage conv3 [24,48,160,32]    0.030 ms
    stage conv4 [24,24,80,64]     0.061 ms
    stage conv5 [24,12,40,128]    0.223 ms
    stage conv6 [24,6,20,256]     0.139 ms
    stage conv7 [24,3,10,256]     0.248 ms
    conv2 literal                 0.437 ms
    conv2 width_s2d               0.348 ms   max|d| 9.5e-7  <- WINNER
    conv2 s2d2x2                  1.479 ms   (and the 5x5 kernel
                                              regroup here is wrong —
                                              not worth fixing given
                                              the timing)

width_s2d promoted into WSConv by widening its s2d gate to in_ch <= 16
AT bf16 COMPUTE ONLY (the TPU product path; clean-chip in-net effect:
pose net 1.32 -> 0.92 ms). f32 compute keeps the literal conv: flipping
the f32 summation order would reshuffle the CPU gates' calibrated
from-scratch trajectories (the warm gate's matched variant also relies
on CPU-identical f32 numerics). Exactness at bf16 is covered by the
probe's parity check (max|d| 9.5e-7 vs the literal conv in f32).

Caution from this probe's first analysis round: three gate runs that
"collapsed after this change" turned out to have silently run on the
TPU backend (JAX_PLATFORMS=cpu does NOT stick under the axon tunnel —
golden_eval needs --force_cpu), i.e. the documented TPU from-scratch
chaos, not a conv2 regression. The forced-CPU gate bit-reproduces its
calibration run under the dtype-gated rewrite.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--chain", type=int, default=20)
    p.add_argument("--pairs", type=int, default=24)
    args = p.parse_args()

    from _benchlib import make_noop, measure_best, measure_latency, setup_cache

    setup_cache()

    import jax
    import jax.numpy as jnp

    from tcsfm.models.layers import _s2d16_embedding
    from tcsfm.models.pose import CONV_CHANNELS, CONV_KERNELS, PoseNet

    H, W, N = 192, 640, args.pairs
    dtype = jnp.bfloat16
    net = PoseNet(dtype=dtype)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.rand(N, H, W, 6).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x0)

    noop = make_noop()
    lat = measure_latency(noop)
    print(f"latency {lat * 1e3:.2f} ms")

    def chained(fn, *fargs):
        @jax.jit
        def run(*inner):
            def body(carry, _):
                out = fn(*((inner[0] + carry * 1e-30,) + inner[1:]))
                return carry + jnp.sum(out).astype(jnp.float32), None

            out, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                  length=args.chain)
            return out

        float(run(*fargs))  # compile
        ms = measure_best(lambda: float(run(*fargs)), args.reps, lat)
        return ms * 1e3 / args.chain

    # ---- full net + per-stage -------------------------------------------
    ms = chained(lambda x: net.apply(params, x), x0)
    print(f"pose net full ({N} pairs)           {ms:8.3f} ms")

    # stage inputs from a forward pass
    acts = [(x0 - 0.45) / 0.22]
    from tcsfm.models.layers import ConvGN

    x = acts[0].astype(dtype)
    for i, (ch, k) in enumerate(zip(CONV_CHANNELS, CONV_KERNELS)):
        sub = ConvGN(ch, kernel=k, dtype=dtype, name=f"conv{i + 1}")
        x = sub.apply(
            {"params": params["params"][f"conv{i + 1}"]}, x)
        acts.append(x)
        mod = ConvGN(ch, kernel=k, dtype=dtype, name=f"conv{i + 1}")
        pp = {"params": params["params"][f"conv{i + 1}"]}
        ms = chained(functools.partial(mod.apply, pp), acts[i])
        print(f"stage conv{i + 1} {str(acts[i].shape):24s} {ms:8.3f} ms")

    # ---- conv2 candidates ------------------------------------------------
    xin = acts[1]                                # [N, 96, 320, 16]
    cin, cout, k = 16, 32, 5
    w = jnp.asarray(rng.randn(k, k, cin, cout).astype(np.float32) * 0.05)

    def literal(x):
        return jax.lax.conv_general_dilated(
            x.astype(dtype), w.astype(dtype), (2, 2),
            ((2, 2), (2, 2)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    ms = chained(literal, xin)
    print(f"conv2 literal                       {ms:8.3f} ms")

    def width_s2d(x, fold=16):
        E = jnp.asarray(_s2d16_embedding(k, 2)) if fold == 16 else None
        n, h, wd = x.shape[0], x.shape[1], x.shape[2]
        k_emb = jnp.einsum("yxic,xqpj->yqpijc", w, E).reshape(
            k, 3, 16 * cin, 8 * cout)
        v = x.astype(dtype).reshape(n, h, wd // 16, 16 * cin)
        y = jax.lax.conv_general_dilated(
            v, k_emb.astype(dtype), (2, 1), ((2, 2), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return y.reshape(n, y.shape[1], wd // 2, cout)

    y_lit, y_s2d = literal(xin), width_s2d(xin)
    err = float(jnp.max(jnp.abs(y_lit.astype(jnp.float32)
                                - y_s2d.astype(jnp.float32))))
    ms = chained(width_s2d, xin)
    print(f"conv2 width_s2d (max|d|={err:.2e})  {ms:8.3f} ms")

    def s2d2x2(x):
        n, h, wd = x.shape[0], x.shape[1], x.shape[2]
        v = x.astype(dtype).reshape(n, h // 2, 2, wd // 2, 2, cin)
        v = v.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, wd // 2, 4 * cin)
        kpad = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))  # 6x6
        k2 = kpad.reshape(3, 2, 3, 2, cin, cout)
        k2 = k2.transpose(0, 2, 1, 3, 4, 5).reshape(3, 3, 4 * cin, cout)
        return jax.lax.conv_general_dilated(
            v, k2.astype(dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    y2 = s2d2x2(xin)
    err2 = float(jnp.max(jnp.abs(y_lit.astype(jnp.float32)
                                 - y2.astype(jnp.float32))))
    ms = chained(s2d2x2, xin)
    print(f"conv2 s2d2x2 (max|d|={err2:.2e})    {ms:8.3f} ms")


if __name__ == "__main__":
    main()
