import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))
import jax, time
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
from tcsfm.config import Config
from tcsfm.solver.coupled import solve_disp, solve_pose_iteratively
from tcsfm.train.trainer import create_train_state
from tcsfm.utils.helpers import disp_to_depth

H, W, B, S, ITERS = 192, 640, 6, 2, 4
cfg = Config(iterations=ITERS, num_scales=1, minibatch=B, compute_dtype="bfloat16")
state, depth_model, pose_model = create_train_state(cfg, jax.random.PRNGKey(0), steps_per_epoch=100)
params, batch_stats = state.params, state.batch_stats

rng = np.random.RandomState(0)
Kmat = np.array([[370.0,0,W/2],[0,370.0,H/2],[0,0,1]], np.float32)
tgt = jnp.asarray(rng.rand(B,H,W,3).astype(np.float32))
srcs = jnp.asarray(rng.rand(S,B,H,W,3).astype(np.float32))
Kb = jnp.asarray(np.broadcast_to(Kmat,(B,3,3)).copy())
imgs18 = jnp.asarray(rng.rand(3*B,H,W,3).astype(np.float32))

@jax.jit
def noop(x): return x + 1.0

def measure(fn, fargs, reps=8):
    float(fn(*fargs))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); float(fn(*fargs)); best = min(best, time.perf_counter()-t0)
    return best

float(noop(jnp.float32(0.0)))
lat = measure(noop, (jnp.float32(0.0),), 12)
print(f"latency: {lat*1000:.2f} ms", flush=True)

from tcsfm.models.depth import make_depth_apply

@jax.jit
def full_depth(params, batch_stats, imgs):
    dv = {"params": params["depth"], "batch_stats": batch_stats}
    disps = make_depth_apply(depth_model, dv, use_tail_kernel=True)(imgs)
    return sum(jnp.sum(d) for d in disps)
t = measure(full_depth, (params, batch_stats, imgs18)) - lat
print(f"depth net tail-kernel (18 imgs): {t*1000:.1f} ms", flush=True)

@jax.jit
def full(params, batch_stats, target_img, source_imgs, K):
    dvars = {"params": params["depth"], "batch_stats": batch_stats}
    pvars = {"params": params["pose"]}
    from tcsfm.models.depth import make_depth_apply as _mda
    da = _mda(depth_model, dvars, use_tail_kernel=True)
    pa = lambda im: pose_model.apply(pvars, im)
    disps = solve_disp(da, target_img, source_imgs)
    deps = jnp.stack([disp_to_depth(disps[f][0], cfg.min_depth, cfg.max_depth)[1] for f in range(S+1)])
    poses, _ = solve_pose_iteratively(ITERS, deps, pa, target_img, source_imgs, K, use_mxu_warp=True)
    return jnp.sum(poses)
t = measure(full, (params, batch_stats, tgt, srcs, Kb)) - lat
print(f"FULL forward tail-kernel: {t*1000:.1f} ms -> {B/t:.1f} f/s", flush=True)
