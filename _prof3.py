import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))
import jax, time
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
from flax import linen as nn
from tcsfm.config import Config
from tcsfm.models.depth import DepthNet
from tcsfm.train.trainer import create_train_state

H, W, N = 192, 640, 18
cfg = Config(iterations=4, num_scales=1, minibatch=6, compute_dtype="bfloat16")
state, depth_model, pose_model = create_train_state(cfg, jax.random.PRNGKey(0), steps_per_epoch=100)
params, batch_stats = state.params, state.batch_stats

class DepthNetTrunc(DepthNet):
    n_stages: int = 5     # how many upconv/iconv stages to run
    heads: bool = True

    def decode_trunc(self, skips):
        out = skips[-1]
        for i in range(min(self.n_stages, len(self.iconvs) - 1)):
            up = nn.elu(self.upconvs[i](out))
            up = up + skips[-(i + 2)]
            out = nn.elu(self.iconvs[i](up))
        if self.n_stages >= len(self.iconvs):
            up = nn.elu(self.upconvs[-1](out))
            out = nn.elu(self.iconvs[-1](up))
        if self.heads:
            f = nn.elu(self.feature_convs[0](out))
            out = nn.sigmoid(self.disp_heads[0](f))
        return out

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

def timed(n_stages, heads):
    m = DepthNetTrunc(num_scales=1, dtype=jnp.bfloat16, n_stages=n_stages, heads=heads)
    @jax.jit
    def f(params, batch_stats, imgs):
        dv = {"params": params["depth"], "batch_stats": batch_stats}
        skips = m.apply(dv, imgs, method=DepthNetTrunc.encode)
        out = m.apply(dv, skips, method=DepthNetTrunc.decode_trunc)
        return jnp.sum(out)
    return measure(f, (params, batch_stats, imgs)) - lat

t_enc_only = timed(0, False)  # encoder + bottleneck sum
print(f"encode only: {t_enc_only*1000:.1f} ms", flush=True)
prev = t_enc_only
for ns in range(1, 6):
    t = timed(ns, False)
    print(f"stages<= {ns}: {t*1000:.1f} ms  (stage {ns}: {(t-prev)*1000:.1f})", flush=True)
    prev = t
t = timed(5, True)
print(f"+heads: {t*1000:.1f} ms  (heads: {(t-prev)*1000:.1f})", flush=True)
