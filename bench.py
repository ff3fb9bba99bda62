"""Benchmark: coupled-SfM inference throughput (frames/s/chip) on TPU.

Measures the flagship path — depth network + 4-iteration coupled pose
solver at the paper's 'med' resolution (192x640), reference batch size 6,
2 source frames — the exact per-window work of VO evaluation
(evaluate_vo_model.py) and the inner loop of training/PFT. Also measures
the full training step (fwd + bwd + Adam) and PFT window refinement
(20-epoch encoder-mode optimization, the paper's headline capability).

Timing notes: under the remote-tunnel runtime, ``block_until_ready`` does
not actually wait for device completion, so wall-clocking individual calls
under-reports by orders of magnitude. Instead completion is forced by
fetching a scalar output, and the measured dispatch/fetch round-trip
latency of a trivial kernel is subtracted.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s/chip", "vs_baseline": N,
   "forward_ms_min"/"forward_ms_median"/"forward_chain_len"/
   "forward_n_reps"/"unchained_fps"/"fetch_latency_s": ...,
   "train_step_ms": N, "train_frames_per_s": N,
   "pft_windows_per_s": N (window batch 4), "pft_windows_per_s_b6": N}

The headline ``value`` is measured with K=10 forward steps scan-chained
into ONE fetch (variance-proofing, round-4 verdict #2): per-fetch tunnel
jitter lands on the number at 1/K weight, so a 12% tunnel swing moves it
<1.5%. ``unchained_fps`` is the rounds-1-4 one-fetch-per-rep methodology,
kept for continuity and as the in-run variance comparison.

Failure policy (round-3 fix): backend init retries are bounded by a TOTAL
budget (~3 min, not 8x120s) and on persistent failure the JSON line is
STILL emitted with ``"backend": "unavailable"`` so the round records why
instead of nothing. Sub-benchmarks (train, PFT) are individually guarded:
a failure there nulls that field but keeps the rest.

The reference publishes no throughput numbers (SURVEY.md §6); its
hardware-equivalent anchor is a single ~2019 CUDA GPU ("megalith"). We
report ``vs_baseline`` as the ratio to a 30 frames/s real-time anchor —
the KITTI camera rate the reference pipeline targets for online VO.
"""

from __future__ import annotations

import json
import os
import threading
import time
import traceback

import numpy as np

BASELINE_FPS = 30.0  # KITTI camera rate: "real time" for online VO
RETRY_BUDGET_S = 180.0  # total backend-init retry budget (VERDICT r2 #1)
RETRY_SLEEP_S = 30.0
# Hard watchdog: the remote-tunnel data path can HANG inside a fetch
# (observed: jax.devices() responds, the first matmul fetch never
# returns) — no exception, so the retry budget never fires and the
# driver kills the bench with rc=124 and NO JSON (the round-2 failure
# mode, again). A daemon timer emits whatever has been measured so far
# and exits 0 before any plausible outer kill.
WATCHDOG_S = float(os.environ.get("TCSFM_BENCH_WATCHDOG_S", 780.0))

METRIC = {
    "metric": "coupled_sfm_inference_med_res_4iter",
    "value": 0.0,
    "unit": "frames/s/chip",
    "vs_baseline": 0.0,
}

# mutable running result: sub-benchmarks write fields here as they land,
# so a watchdog fire still reports everything measured up to that point
RESULT = dict(METRIC)


# serializes the watchdog's JSON emit against main-thread stage prints:
# an interleaved partial line would corrupt the single-line JSON the
# round driver parses (round-4 advisor finding)
IO_LOCK = threading.Lock()


def emit(payload):
    with IO_LOCK:
        print(json.dumps(payload), flush=True)


def start_watchdog():
    def fire():
        RESULT["watchdog_timeout"] = True
        emit(RESULT)
        os._exit(0)          # a hung fetch is not interruptible politely

    t = threading.Timer(WATCHDOG_S, fire)
    t.daemon = True
    t.start()
    return t


def init_backend():
    """Initialize the JAX backend under a bounded total retry budget.

    Returns the device list, or raises after RETRY_BUDGET_S seconds of
    persistent failure. The remote-tunnel backend sporadically reports
    UNAVAILABLE for a while; round 2 lost its bench to an unbounded
    8x120s retry loop here (BENCH_r02.json rc=124)."""
    import jax

    deadline = time.monotonic() + RETRY_BUDGET_S
    attempt = 0
    while True:
        try:
            return jax.devices()
        except RuntimeError as e:
            attempt += 1
            remaining = deadline - time.monotonic()
            if remaining <= RETRY_SLEEP_S:
                raise
            print(f"# backend unavailable ({e}); retry {attempt} "
                  f"({remaining:.0f}s of budget left)", flush=True)
            time.sleep(RETRY_SLEEP_S)


def main():
    watchdog = start_watchdog()

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser("~/.jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)

    import jax

    # config.update, NOT just the env var: on this backend the env-var
    # path left the write side "disabled/not initialized" (measured —
    # zero entries after full compiles) while the explicit config works
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    try:
        init_backend()
    except Exception as e:  # noqa: BLE001 — record WHY, don't drop the round
        watchdog.cancel()
        emit({**METRIC, "backend": "unavailable", "error": str(e)[:300]})
        return

    import jax.numpy as jnp

    from tcsfm.config import Config, PFTOptions
    from tcsfm.solver.coupled import solve_disp, solve_pose_iteratively
    from tcsfm.train.trainer import create_train_state
    from tcsfm.utils.helpers import disp_to_depth

    t_start = time.monotonic()

    def stage(msg):
        RESULT["stage"] = msg     # shows WHERE a watchdog fire happened
        with IO_LOCK:
            print(f"# [{time.monotonic() - t_start:6.1f}s] {msg}",
                  flush=True)

    def finish(payload):
        watchdog.cancel()
        payload.pop("stage", None)
        emit(payload)

    H, W = 192, 640
    B, S, ITERS = 6, 2, 4
    cfg = Config(iterations=ITERS, num_scales=1, minibatch=B,
                 compute_dtype="bfloat16", use_mxu_warp=True)

    stage("init models")
    state, depth_model, pose_model = create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=100)
    params, batch_stats = state.params, state.batch_stats

    from tcsfm.models.depth import make_depth_apply

    def forward(params, batch_stats, target_img, source_imgs, K, mxu_exact):
        depth_vars = {"params": params["depth"], "batch_stats": batch_stats}
        pose_vars = {"params": params["pose"]}
        # decode runs the phase-space tail by default (DepthNet.phase_tail
        # — exact, measured 30.3 -> 17.0 ms)
        depth_apply = make_depth_apply(depth_model, depth_vars)
        pose_apply = lambda imgs: pose_model.apply(pose_vars, imgs)    # noqa
        disparities = solve_disp(depth_apply, target_img, source_imgs)
        depths = jnp.stack([
            disp_to_depth(disparities[f][0], cfg.min_depth, cfg.max_depth)[1]
            for f in range(S + 1)
        ])
        poses, poses_inv = solve_pose_iteratively(
            ITERS, depths, pose_apply, target_img, source_imgs, K,
            use_mxu_warp=True, mxu_exact=mxu_exact)
        return poses

    # NOTE: params/batch_stats/images are explicit ARGUMENTS — closing over
    # them embeds ~60MB of constants in the executable and makes the remote
    # compile pathologically slow.
    import functools

    # the headline metric is the REAL inference path: uint8-sourced frames
    # (KITTI decodes to uint8) sampled via the single-pass integer-exact
    # "uint8" mode that the eval CLIs auto-select on file-backed data;
    # the hi/lo-split number is kept as a secondary field for continuity
    @functools.partial(jax.jit, static_argnames=("mxu_exact",))
    def step(params, batch_stats, target_img, source_imgs, K,
             mxu_exact="uint8"):
        poses = forward(params, batch_stats, target_img, source_imgs, K,
                        mxu_exact)
        # chainable scalar output: forces full execution on fetch
        return jnp.sum(poses)

    # K forward steps scan-chained into ONE fetch: the headline number
    # then carries 1/K of the per-fetch tunnel noise (round-4 verdict:
    # a 12% tunnel-latency swing moved the official number; chained, the
    # same swing moves it <~1.5%). The carry feeds the next step's input
    # at 1e-30 scale (far below f32 ulp of [0,1] pixels — numerically
    # identity) so XLA cannot CSE the K identical forwards.
    K_CHAIN = 10

    @functools.partial(jax.jit, static_argnames=("mxu_exact",))
    def step_chained(params, batch_stats, target_img, source_imgs, K,
                     mxu_exact="uint8"):
        def body(carry, _):
            t = target_img + carry * 1e-30
            poses = forward(params, batch_stats, t, source_imgs, K,
                            mxu_exact)
            return carry + jnp.sum(poses), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K_CHAIN)
        return out

    @jax.jit
    def noop(x):
        return x + 1.0

    rng = np.random.RandomState(0)
    Kmat = np.array([[370.0, 0, W / 2], [0, 370.0, H / 2], [0, 0, 1]],
                    np.float32)
    args = (
        params, batch_stats,
        jnp.asarray(rng.randint(0, 256, (B, H, W, 3))
                    .astype(np.float32) / 255.0),
        jnp.asarray(rng.randint(0, 256, (S, B, H, W, 3))
                    .astype(np.float32) / 255.0),
        jnp.asarray(np.broadcast_to(Kmat, (B, 3, 3)).copy()),
    )

    # warm + compile (the hi/lo variant compiles later, at its own stage —
    # it is the SECONDARY metric and must not spend budget up front)
    stage("compile forward")
    float(step(*args))
    float(noop(jnp.float32(0.0)))
    stage("compile chained forward")
    float(step_chained(*args))

    def measure(fn, fargs, reps):
        """(best, median, times): wall time per scalar-fetch-forced call."""
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*fargs))        # scalar fetch forces completion
            times.append(time.perf_counter() - t0)
        return min(times), float(np.median(times)), times

    # dispatch+fetch round-trip latency, measured on a trivial kernel and
    # subtracted (block_until_ready does not wait under the remote tunnel)
    latency, _, _ = measure(noop, (jnp.float32(0.0),), reps=5)
    # Adaptive rep counts: round 3's driver run hit ~23 s PER FETCH of
    # tunnel latency, so the fixed 10+10+6 fetch schedule burned 610 s on
    # the forward alone and the PFT measurement was skipped on the
    # wall-clock guard. best-of-N with latency subtraction converges in a
    # few reps; under a slow tunnel, fewer fetches is strictly better.
    if latency > 5.0:
        fwd_reps, aux_reps = 3, 2
    elif latency > 1.0:
        fwd_reps, aux_reps = 4, 3
    else:
        fwd_reps, aux_reps = 6, 6
    stage(f"measure forward (latency {latency:.2f}s/fetch, "
          f"reps {fwd_reps}/{aux_reps})")
    # headline: K-chained (tunnel-noise-immune); unchained kept alongside
    # for continuity with rounds 1-4 and as the in-run variance demo
    best_c, med_c, _ = measure(step_chained, args, reps=fwd_reps)
    per_call = max(best_c - latency, 1e-6) / K_CHAIN
    per_call_med = max(med_c - latency, 1e-6) / K_CHAIN
    frames_per_s = B / per_call
    best_u, med_u, _ = measure(step, args, reps=fwd_reps)
    unchained_fps = B / max(best_u - latency, 1e-6)

    result = RESULT               # sub-benchmarks land fields in place so
    result.update({               # a watchdog fire reports them anyway
        "value": round(frames_per_s, 2),
        "vs_baseline": round(frames_per_s / BASELINE_FPS, 2),
        "forward_ms_min": round(per_call * 1e3, 2),
        "forward_ms_median": round(per_call_med * 1e3, 2),
        "forward_chain_len": K_CHAIN,
        "forward_n_reps": fwd_reps,
        "unchained_fps": round(unchained_fps, 2),
        "unchained_fps_median": round(B / max(med_u - latency, 1e-6), 2),
        "fetch_latency_s": round(latency, 4),
        "exact_hilo_fps": None,
        "train_step_ms": None,
        "train_frames_per_s": None,
        "pft_windows_per_s": None,
        "pft_window_batch": None,
        "pft_windows_per_s_b6": None,
    })

    # --- full TRAIN step (depth -> coupled solver -> loss -> grads -> Adam;
    # the workload the scaling north star is about, VERDICT r1 item #9) ----
    stage("compile train step")
    try:
        from tcsfm.train.trainer import make_train_step

        train_step_fn = make_train_step(cfg, depth_model, pose_model)
        batch = {
            "target_img": args[2], "target_img_aug": args[2],
            "source_imgs": args[3], "source_imgs_aug": args[3],
            "intrinsics": args[4], "intrinsics_aug": args[4],
            "gt_lie_alg": jnp.zeros((S, B, 6), jnp.float32),
            "gt_lie_alg_aug": jnp.zeros((S, B, 6), jnp.float32),
            "vo_lie_alg": jnp.zeros((S, B, 6), jnp.float32),
            "vo_lie_alg_aug": jnp.zeros((S, B, 6), jnp.float32),
            "dt": jnp.full((S, B), 0.1, jnp.float32),
        }

        def train_once(st):
            st, losses = train_step_fn(st, batch)
            float(losses["total"])      # fetch forces the full chain
            return st
        state = train_once(state)       # compile + warmup
        best = float("inf")
        for _ in range(aux_reps):
            t0 = time.perf_counter()
            state = train_once(state)
            best = min(best, time.perf_counter() - t0)
        train_per_call = max(best - latency, 1e-6)
        result["train_step_ms"] = round(train_per_call * 1e3, 1)
        result["train_frames_per_s"] = round(B / train_per_call, 2)
    except Exception:  # noqa: BLE001 — keep the forward number
        traceback.print_exc()

    # --- PFT window refinement (20-epoch encoder-mode optimization; the
    # paper's headline capability — VERDICT r2 #1/#7 asked for this field) --
    # guarded by a LATENCY-AWARE wall-clock check: never let a cold PFT
    # compile push the whole bench past the driver budget — emit what we
    # have instead. Estimated PFT cost: ~60s cold compile (seconds warm)
    # + (1 warmup + aux_reps) fetches + ~1s/call compute.
    stage("compile PFT")
    pft_est = 60.0 + (1 + aux_reps) * (latency + 1.0)
    if time.monotonic() - t_start + pft_est > WATCHDOG_S - 80.0:
        # fall THROUGH to the (cheaper) hi/lo stage instead of returning —
        # its own budget check may still pass on a slow-tunnel round
        stage(f"skipping PFT (wall-clock budget: est +{pft_est:.0f}s)")
    else:
        try:
            from tcsfm.solver.pft import PFTOptimizer

            opts = PFTOptions(epochs=20, num_source_imgs=S)
            # the PFT CLI auto-selects the uint8-exact sampler on
            # file-backed frames — bench inputs are uint8-grid, so
            # measure that path
            pft = PFTOptimizer(cfg.replace(mxu_exact="uint8"), opts,
                               depth_model, pose_model, mode="encoder")

            def pft_once(pft_batch):
                r = pft.optimize_window_jit(pft_batch, params["depth"],
                                            params["pose"], batch_stats)
                float(jnp.sum(r.poses_opt) + jnp.sum(r.disp_opt))
                return r

            def measure_pft(wb):
                """windows/s at window batch wb (compiles per shape)."""
                pft_batch = {"target_img": args[2][:wb],
                             "source_imgs": args[3][:, :wb],
                             "intrinsics": args[4][:wb]}
                pft_once(pft_batch)         # compile + warmup
                best = float("inf")
                for _ in range(min(3, aux_reps)):
                    t0 = time.perf_counter()
                    pft_once(pft_batch)
                    best = min(best, time.perf_counter() - t0)
                return wb / max(best - latency, 1e-6)

            # headline at window batch 4: the CLI default, and BELOW the
            # measured HBM knee (round-3: 252 ms/win at wb=4 vs 478 at
            # wb=6 — the round-4 driver number sat on the knee and
            # understated the capability by ~30%)
            result["pft_windows_per_s"] = round(measure_pft(4), 2)
            result["pft_window_batch"] = 4
            # wb=6 secondary (knee visibility), budget permitting
            pft6_est = 60.0 + (1 + min(3, aux_reps)) * (latency + 3.0)
            if (time.monotonic() - t_start + pft6_est
                    <= WATCHDOG_S - 110.0):
                result["pft_windows_per_s_b6"] = round(measure_pft(6), 2)
        except Exception:  # noqa: BLE001
            traceback.print_exc()

    # --- hi/lo-split exact sampler (secondary continuity field; measured
    # LAST so it can never crowd out the train/PFT fields) -----------------
    stage("measure hi/lo forward")
    hilo_est = 30.0 + (1 + aux_reps) * (latency + 0.1)
    if time.monotonic() - t_start + hilo_est <= WATCHDOG_S - 30.0:
        try:
            float(step(*args, mxu_exact=True))   # compile + warmup
            best_h, _, _ = measure(lambda *a: step(*a, mxu_exact=True),
                                   args, reps=aux_reps)
            hilo_fps = B / max(best_h - latency, 1e-6)
            result["exact_hilo_fps"] = round(hilo_fps, 2)
        except Exception:  # noqa: BLE001
            traceback.print_exc()
    else:
        stage(f"skipping hi/lo (wall-clock budget: est +{hilo_est:.0f}s)")

    finish(result)


if __name__ == "__main__":
    main()
