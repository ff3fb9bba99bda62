#!/usr/bin/env python
"""Compiled-HLO collective trace for chain BA's distributed claim.

`chain_ba` (tcsfm/solver/ba.py:670) claims: the per-window linearization
is embarrassingly parallel over the mesh's ``data`` axis, and the
cross-device cost of each LM iteration is reduced-system-sized — 6x6
block gathers, independent of image resolution. This script substantiates
that from the compiled artifact instead of asserting it: it partitions
the FRAME axis over an 8-device virtual CPU mesh (the sharding that makes
XLA genuinely distribute the per-window linearization — window w reads
frames w-1, w, w+1, so XLA inserts one-frame halo exchanges; sharding
only the pose chain, as the numerical-parity test does, lets the
partitioner all-gather the [E,6] poses at entry and replicate
everything). It then classifies every collective instruction by whether
its HLO metadata places it inside the LM ``while`` body (runs once per
iteration) or at entry (runs once), and reports shapes + bytes.

Measured result at N=24 frames, 64x96, 8 devices (recorded in
PERFORMANCE.md round 5):
  * ENTRY (once): halo collective-permutes of [2,H,W,3] / [1,H,W,3]
    frames and [1,H,W,1] initial depth — the only pixel-sized
    communication, hoisted out of the loop (frames are loop constants;
    refined target depths stay window-local).
  * while body (per LM iteration): all-gathers of [E,6,6] (x5), [E,6],
    [E] — the reduced camera system for the replicated block-Thomas
    solve — plus scalar cost all-reduces and [1,6]/[1,6,6] edge-neighbor
    permutes. ~20 KB/iteration regardless of resolution.

PASS criterion: no pixel-sized (>= H*W elems) collective inside the loop
body.

Usage:  python scripts/chain_hlo_trace.py [--frames 24 --size 64 96]
        (--frames must be divisible by 8)
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

COLLECTIVES = ("all-reduce", "all-gather", "collective-permute",
               "all-to-all", "reduce-scatter")


def dtype_bytes(dt: str) -> int:
    return {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
            "pred": 1, "s8": 1, "u8": 1}.get(dt, 4)


def parse_collectives(txt: str):
    """(op, shapes, elems, bytes, in_loop) per collective instruction.

    Loop membership comes from the instruction's HLO metadata op_name —
    ``jit(...)/while/body/...`` marks the LM iteration body (XLA's
    hoisted-loop computations are named ``%wide...``, so computation
    names alone are unreliable)."""
    out = []
    for line in txt.splitlines():
        for op in COLLECTIVES:
            if re.search(rf"=\s*\S*\s*{op}", line):
                rhs = line.split("=", 1)[1].split("(", 1)[0]
                shapes = re.findall(r"(f64|f32|bf16|f16|s32|u32|u8|s8|pred)"
                                    r"\[([\d,]*)\]", rhs)
                total_e = total_b = 0
                for dt, dims in shapes:
                    elems = int(np.prod([int(d) for d in dims.split(",")
                                         if d])) if dims else 1
                    total_e += elems
                    total_b += elems * dtype_bytes(dt)
                m = re.search(r'op_name="([^"]*)"', line)
                in_loop = bool(m and "/while/body/" in m.group(1))
                out.append({"op": op,
                            "shape": " ".join(f"{dt}[{dims}]"
                                              for dt, dims in shapes),
                            "elems": total_e, "bytes": total_b,
                            "in_loop": in_loop})
                break
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--size", type=int, nargs=2, default=(64, 96))
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--dump", type=str, default="",
                    help="also write the full HLO text here")
    args = ap.parse_args(argv)
    if args.frames % 8:
        ap.error("--frames must be divisible by 8 (frame-axis sharding)")

    from tcsfm.dist.mesh import make_mesh
    from tcsfm.solver.ba import chain_ba

    n, (h, w) = args.frames, args.size
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.rand(n, h, w, 3).astype(np.float32))
    depths = jnp.asarray(1.0 + rng.rand(n, h, w, 1).astype(np.float32))
    K = jnp.asarray(np.array([[0.6 * w, 0, w / 2], [0, 0.6 * w, h / 2.5],
                              [0, 0, 1]], np.float32))
    pp = jnp.zeros((n - 2, 6), jnp.float32).at[:, 2].add(0.01)
    pn = jnp.zeros((n - 2, 6), jnp.float32).at[:, 2].add(-0.01)

    mesh = make_mesh(8)
    shard = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    # frames + depths shard over the window axis; the tiny pose chain
    # replicates (it is the loop carry of the replicated Thomas solve)
    fn = jax.jit(
        lambda f, d, a, b: chain_ba(f, d, K, a, b, iters=args.iters,
                                    pyramid_levels=1).edge_pose,
        in_shardings=(shard, shard, rep, rep))
    txt = fn.lower(frames, depths, pp, pn).compile().as_text()
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(txt)

    colls = parse_collectives(txt)
    loop = [c for c in colls if c["in_loop"]]
    entry = [c for c in colls if not c["in_loop"]]
    loop_pixel = [c for c in loop if c["elems"] >= h * w]
    loop_bytes = sum(c["bytes"] for c in loop)

    print(f"# chain_ba HLO collective trace: N={n} frames ({n - 1} edges, "
          f"{n - 2} windows), {h}x{w}, {args.iters} LM iters, 8-device "
          f"mesh, frames+depths sharded over 'data'")
    print(f"# one frame = {h * w * 3 * 4 / 1024:.0f} KB; full reduced "
          f"6x6 block chain = {(n - 1) * 6 * 6 * 4 / 1024:.2f} KB")
    for label, group in (("once (entry)", entry),
                         ("per-iteration (while body)", loop)):
        print(f"-- {label}:")
        for c in group:
            print(f"   {c['op']:20s} {c['shape']:24s} {c['bytes']:8d} B")
    summary = {
        "n_collectives": len(colls),
        "n_in_loop_body": len(loop),
        "loop_body_bytes_per_iter": loop_bytes,
        "pixel_sized_in_loop": len(loop_pixel),
        "entry_bytes_once": sum(c["bytes"] for c in entry),
        "hw_elems": h * w,
        "claim_holds": not loop_pixel,
    }
    print(json.dumps(summary))
    if loop_pixel:
        print("CLAIM VIOLATED: pixel-sized collective(s) inside the LM "
              "loop body", file=sys.stderr)
        return 1
    print("CLAIM HOLDS: per-iteration communication is reduced-system-"
          "sized (6x6 block gathers + scalars); pixel-sized halos run "
          "once at entry")
    return 0


if __name__ == "__main__":
    sys.exit(main())
