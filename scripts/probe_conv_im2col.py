#!/usr/bin/env python
"""Probe: XLA native conv vs explicit im2col-GEMM at this framework's
conv shapes (round-5 verdict #4 — attack the ~25 TFLOP/s conv side).

VERDICT: NEGATIVE — native wins; the early im2col "win" was a
measurement artifact. The history, because it is instructive:

1. Un-chained single-dispatch microbenchmark (tail shape 18x96x320,
   128->128 3x3 bf16): native 1.37 ms vs im2col 0.76 ms — looked like a
   1.8x win (XLA fused the tap-concat into the GEMM operand reads in
   that isolated graph). A 9-shifted-matmul accumulation was 7x worse.
2. THIS script (scan-chained, K=30 per fetch — the only methodology
   that survives the remote tunnel's per-fetch jitter): the same
   im2col conv costs ~6.0 ms — chained, the [M, 9*Cin] concat
   MATERIALIZES (~9x activation traffic) instead of fusing.
3. Full network under the im2col lowering (bench.py): forward
   36.3 -> 93.4 ms, train 153 -> 488 ms, PFT 2.96 -> 0.77 w/s (2.6-6x
   regression). models/layers.py keeps native as default;
   TCSFM_CONV_IM2COL=1 re-enables for future XLA re-evaluation.

Moral: never promote a lowering from an isolated single-op benchmark —
fusion behavior in context is the whole game on TPU.

Each row: native ms / im2col ms / speedup / max |delta| between the two
results (both bf16 inputs, f32 accumulation).

Usage:  python scripts/probe_conv_im2col.py [--reps 8]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=8)
    p.add_argument("--dtype", type=str, default="bfloat16")
    args = p.parse_args()

    from _benchlib import make_noop, measure_best, measure_latency, setup_cache

    setup_cache()
    import jax
    import jax.numpy as jnp

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    # (label, B, H, W, Cin, Cout, k, stride) — the framework's hot convs
    SHAPES = [
        ("stem s2d 4x4 (depth conv1)", 18, 96, 320, 12, 64, 4, 1),
        ("resnet L1 3x3", 18, 48, 160, 64, 64, 3, 1),
        ("resnet L2 3x3", 18, 24, 80, 128, 128, 3, 1),
        ("resnet L3 3x3", 18, 12, 40, 256, 256, 3, 1),
        ("resnet L4 3x3", 18, 6, 20, 512, 512, 3, 1),
        ("decoder up4 3x3", 18, 12, 40, 256, 256, 3, 1),
        ("decoder up2 3x3", 18, 48, 160, 64, 64, 3, 1),
        ("phase tail 3x3 (4*32ch)", 18, 96, 320, 128, 128, 3, 1),
        ("phase head 3x3 (4*8ch)", 18, 96, 320, 128, 32, 3, 1),
        ("pose conv2 5x5 s2", 24, 96, 320, 16, 32, 5, 2),
        ("pose conv3 3x3 s2", 24, 48, 160, 32, 64, 3, 2),
        ("pose conv5 3x3 s2", 24, 12, 40, 128, 256, 3, 2),
    ]

    noop = make_noop()
    rng = np.random.RandomState(0)

    @functools.partial(jax.jit, static_argnames=("stride",))
    def conv_native(x, k, stride=1):
        pad = (k.shape[0] - 1) // 2
        y = jax.lax.conv_general_dilated(
            x, k, (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y

    @functools.partial(jax.jit, static_argnames=("stride",))
    def conv_im2col(x, k, stride=1):
        kh, kw, cin, cout = k.shape
        pad = (kh - 1) // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        b, hp, wp, _ = xp.shape
        ho = (hp - kh) // stride + 1
        wo = (wp - kw) // stride + 1
        taps = jnp.concatenate(
            [xp[:, dy:dy + stride * ho:stride,
                dx:dx + stride * wo:stride, :]
             for dy in range(kh) for dx in range(kw)], -1)
        o = jnp.dot(taps.reshape(-1, kh * kw * cin),
                    k.reshape(kh * kw * cin, cout),
                    preferred_element_type=jnp.float32)
        return o.reshape(b, ho, wo, cout)

    # K applications scan-chained into ONE fetch (single-layer times are
    # below the tunnel's per-fetch jitter — the first probe version
    # measured 0.000 ms rows); the carry perturbs the input at 1e-30
    # scale so XLA cannot CSE the chain.
    K_CHAIN = 30

    def chained(fn, s):
        @jax.jit
        def run(x, k):
            def body(carry, _):
                o = fn(x + (carry * 1e-30).astype(x.dtype), k, stride=s)
                return carry + jnp.sum(o.astype(jnp.float32)), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                  length=K_CHAIN)
            return out
        return run

    print(f"{'layer':30s} {'native':>9s} {'im2col':>9s} {'speedup':>8s} "
          f"{'max|d|':>9s}")
    for label, b, h, w, cin, cout, k, s in SHAPES:
        x = jnp.asarray(rng.rand(b, h, w, cin).astype(np.float32)).astype(dt)
        kk = jnp.asarray((rng.rand(k, k, cin, cout).astype(np.float32)
                          - 0.5) / np.sqrt(k * k * cin)).astype(dt)
        ref = np.asarray(conv_native(x, kk, stride=s), np.float32)
        alt = np.asarray(conv_im2col(x, kk, stride=s), np.float32)
        delta = float(np.max(np.abs(ref - alt)))

        def run(fn):
            ch = chained(fn, s)
            f = lambda: float(ch(x, kk))                     # noqa: E731
            f()
            lat = measure_latency(noop)
            return measure_best(f, args.reps, lat) / K_CHAIN

        tn = run(conv_native)
        ti = run(conv_im2col)
        print(f"{label:30s} {tn * 1e3:8.3f}m {ti * 1e3:8.3f}m "
              f"{tn / max(ti, 1e-9):7.2f}x {delta:9.2e}", flush=True)


if __name__ == "__main__":
    main()
