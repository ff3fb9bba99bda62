"""tcsfm — a TPU-native tightly-coupled structure-from-motion framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
utiasSTARS/tightly-coupled-SfM (reference layout documented in SURVEY.md):
depth + pose CNNs coupled through differentiable inverse warping, trained
self-supervised, with inference-time refinement (PFT), trajectory/depth
evaluation, and mesh-sharded data/window parallelism.

Design principles (TPU-first, not a port):
  * NHWC image layout everywhere (XLA's preferred conv layout on TPU).
  * All hot paths are jittable: static shapes, ``lax.scan`` over solver
    iterations, no data-dependent Python control flow.
  * Functional pytree parameters (flax.linen) — transformable by
    ``jax.grad``/``vmap``/``shard_map``.
  * Scaling via ``jax.sharding.Mesh`` + NamedSharding; gradients reduced
    with XLA collectives, not an external comm library.
"""

__version__ = "0.1.0"

from tcsfm.config import Config  # noqa: F401
