import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))
import jax, time
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
from tcsfm.config import Config
from tcsfm.train.trainer import create_train_state

H, W, N = 192, 640, 18   # 18 = (S+1)*B images through the depth net
cfg = Config(iterations=4, num_scales=1, minibatch=6, compute_dtype="bfloat16")
state, depth_model, pose_model = create_train_state(cfg, jax.random.PRNGKey(0), steps_per_epoch=100)
params, batch_stats = state.params, state.batch_stats

rng = np.random.RandomState(0)
imgs = jnp.asarray(rng.rand(N, H, W, 3).astype(np.float32))

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

dvars = {"params": params["depth"], "batch_stats": batch_stats}

@jax.jit
def encode_only(params, batch_stats, imgs):
    dv = {"params": params["depth"], "batch_stats": batch_stats}
    feats = depth_model.apply(dv, imgs, method="encode")
    return sum(jnp.sum(f) for f in feats)
t_enc = measure(encode_only, (params, batch_stats, imgs)) - lat
print(f"encode: {t_enc*1000:.1f} ms", flush=True)

@jax.jit
def full(params, batch_stats, imgs):
    dv = {"params": params["depth"], "batch_stats": batch_stats}
    disps = depth_model.apply(dv, imgs)
    return sum(jnp.sum(d) for d in disps)
t_full = measure(full, (params, batch_stats, imgs)) - lat
print(f"full depth: {t_full*1000:.1f} ms  (decode ~= {1000*(t_full-t_enc):.1f})", flush=True)

# stem pieces
from flax import linen as nn
conv1_p = params["depth"]["encoder"]["conv1"]
k = conv1_p["kernel"]  # [7,7,3,64]
print("conv1 kernel", k.shape, flush=True)

@jax.jit
def stem(imgs, k):
    x = jax.lax.conv_general_dilated(imgs.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        window_strides=(2,2), padding=[(3,3),(3,3)], dimension_numbers=("NHWC","HWIO","NHWC"))
    return jnp.sum(x)
t = measure(stem, (imgs, k)) - lat
print(f"conv1 7x7s2 alone: {t*1000:.2f} ms", flush=True)

# space-to-depth stem: pad kernel 7->8, s2d input by 2, conv 4x4 s1 on 12ch
@jax.jit
def stem_s2d(imgs, k):
    x = imgs.astype(jnp.bfloat16)
    N_, H_, W_, C_ = x.shape
    # pad H,W by 3 left / 4 right so width is divisible and matches SAME-3 padding
    xp = jnp.pad(x, ((0,0),(3,5),(3,5),(0,0)))
    # s2d factor 2: [N, H', W', C] -> [N, H'/2, W'/2, C*4]
    Hp, Wp = xp.shape[1], xp.shape[2]
    xs = xp.reshape(N_, Hp//2, 2, Wp//2, 2, C_).transpose(0,1,3,2,4,5).reshape(N_, Hp//2, Wp//2, 4*C_)
    kp = jnp.pad(k.astype(jnp.bfloat16), ((0,1),(0,1),(0,0),(0,0)))   # [8,8,3,64]
    ks = kp.reshape(4,2,4,2,3,64).transpose(0,2,1,3,4,5).reshape(4,4,12,64)
    y = jax.lax.conv_general_dilated(xs, ks, window_strides=(1,1), padding="VALID",
        dimension_numbers=("NHWC","HWIO","NHWC"))
    return jnp.sum(y)
t = measure(stem_s2d, (imgs, k)) - lat
print(f"conv1 s2d 4x4s1x12ch: {t*1000:.2f} ms", flush=True)

# check equivalence on small input (f32)
@jax.jit
def stem32(imgs, k):
    return jax.lax.conv_general_dilated(imgs, k, window_strides=(2,2), padding=[(3,3),(3,3)],
        dimension_numbers=("NHWC","HWIO","NHWC"))
@jax.jit
def stem32_s2d(imgs, k):
    x = imgs
    N_, H_, W_, C_ = x.shape
    xp = jnp.pad(x, ((0,0),(3,5),(3,5),(0,0)))
    Hp, Wp = xp.shape[1], xp.shape[2]
    xs = xp.reshape(N_, Hp//2, 2, Wp//2, 2, C_).transpose(0,1,3,2,4,5).reshape(N_, Hp//2, Wp//2, 4*C_)
    kp = jnp.pad(k, ((0,1),(0,1),(0,0),(0,0)))
    ks = kp.reshape(4,2,4,2,3,64).transpose(0,2,1,3,4,5).reshape(4,4,12,64)
    return jax.lax.conv_general_dilated(xs, ks, window_strides=(1,1), padding="VALID",
        dimension_numbers=("NHWC","HWIO","NHWC"))
a = stem32(imgs[:2].astype(jnp.float32), k)
b = stem32_s2d(imgs[:2].astype(jnp.float32), k)
print("s2d shapes", a.shape, b.shape, flush=True)
hmin = min(a.shape[1], b.shape[1]); wmin = min(a.shape[2], b.shape[2])
d = np.abs(np.asarray(a[:, :hmin, :wmin]) - np.asarray(b[:, :hmin, :wmin]))
print(f"s2d equivalence max delta: {d.max():.2e}", flush=True)
