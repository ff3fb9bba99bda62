"""Typed configuration for training, PFT refinement, and evaluation.

Replaces the reference's argparse→dict config (run_mono_training.py:23-86),
the hidden keys added at run_mono_training.py:78-86, and the per-script
``options`` dicts (optimization_experiments/run_sequential_optimization.py:69-99)
with one dataclass serialized as JSON — no pickled configs, no hidden keys.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Tuple

# Image resolutions used by the reference preprocessing
# (data/create_kitti_odometry_data.py:23).
RESOLUTIONS = {
    "low": (128, 448),
    "med": (192, 640),
    "high": (256, 832),
}


@dataclass
class Config:
    """Everything needed to train / refine / evaluate one model."""

    # --- system -----------------------------------------------------------
    flow_type: str = "none"           # 'none' | 'classical' (8-ch pose input)
    num_scales: int = 1               # loss computed at this many scales
    img_resolution: str = "med"       # key into RESOLUTIONS
    img_per_sample: int = 3           # 1 target + (img_per_sample-1) sources
    iterations: int = 4               # coupled egomotion iterations

    # --- data -------------------------------------------------------------
    data_dir: str = ""
    data_format: str = "odometry"     # 'odometry' | 'eigen' | 'scannet'
    train_seq: Tuple[str, ...] = ("00_02", "02_02")
    val_seq: Tuple[str, ...] = ("05_02",)
    test_seq: Tuple[str, ...] = ("09_02",)
    augment_motion: bool = False
    minibatch: int = 6
    skip: int = 1                     # keep every `skip`-th window
    correction_rate: int = 1          # frame decimation inside windows

    # --- optimization -----------------------------------------------------
    lr: float = 1e-4
    pose_lr_mult: float = 2.0         # pose net trains at 2x depth lr
    wd: float = 0.0
    num_epochs: int = 20
    lr_decay_epoch: int = 7           # halve lr every N epochs
    freeze_depthnet: bool = False
    freeze_posenet: bool = False

    # --- depth range (1/30 metric scale; see SURVEY.md §0.6) --------------
    min_depth: float = 0.06
    max_depth: float = 80.0 / 30.0
    camera_height: float = 1.70       # metres (KITTI); used by scale recovery

    # --- losses -----------------------------------------------------------
    l_reconstruction: bool = True
    l_ssim: bool = True
    l1_weight: float = 0.15
    l_ssim_weight: float = 0.85
    with_auto_mask: bool = True
    l_pose_consist: bool = True
    l_pose_consist_weight: float = 5.0
    l_inverse: bool = True
    # Paper KITTI training runs with depth-consistency terms OFF
    # (run_mono_exps_kitti.sh passes neither flag; argparse defaults are
    # False at run_mono_training.py:59,61).
    l_depth_consist: bool = False
    l_depth_consist_weight: float = 0.14
    with_depth_mask: bool = False
    l_smooth: bool = True
    l_smooth_weight: float = 0.05

    # --- precision / performance -----------------------------------------
    compute_dtype: str = "bfloat16"   # network matmul/conv dtype
    param_dtype: str = "float32"
    # Route warps through the Pallas MXU sampler (~10x on TPU, custom VJP).
    # Off by default so CPU tests use the portable XLA path; the training /
    # eval CLIs enable it on TPU backends.
    use_mxu_warp: bool = False
    # Sampler value precision: True = all channels f32-exact (hi/lo
    # split); False = single-pass bf16 (half the MXU matmul cost, ~2e-3
    # abs image noise); "mixed" = RGB single-pass bf16 (below 8-bit
    # source quantization) + source depth f32-exact (5/8 of exact's
    # matmul rows). Exact stays the default pending a real-data A/B.
    mxu_exact: "bool | str" = True
    # Per-call vertical-band coverage check with auto-fallback to the XLA
    # sampler (lax.cond) — keeps extreme warps from silently sampling zeros.
    mxu_band_guard: bool = True
    # Vertical source-band rows per 8-output-row group in the MXU warp.
    # Selector-matmul FLOPs and band DMA scale linearly with it. 32 gives
    # ~15 rows of true parallax margin; 24 gives ~7 (pixels beyond the
    # band are masked invalid by the guard, exactly like out-of-view).
    # Throughput knob: lower only when the data's vertical parallax per
    # 8-row group is known small (validated by the band-coverage stats).
    mxu_band: int = 32
    # jax.checkpoint each coupled refinement iteration in the TRAIN step:
    # the backward recomputes pose-net activations + warp per iteration
    # instead of storing all `iterations` copies (HBM for FLOPs).
    remat_coupled: bool = True

    # --- distribution -----------------------------------------------------
    mesh_shape: Tuple[int, ...] = (1,)        # devices along the data axis
    mesh_axes: Tuple[str, ...] = ("data",)

    # --- checkpointing ----------------------------------------------------
    ckpt_dir: str = "results/default"
    load_from_checkpoint: bool = False
    load_best_model: bool = False
    pretrained_dir: str = ""

    # ----------------------------------------------------------------------
    @property
    def image_size(self) -> Tuple[int, int]:
        return RESOLUTIONS[self.img_resolution]

    @property
    def num_source_imgs(self) -> int:
        return self.img_per_sample - 1

    @property
    def pose_input_channels(self) -> int:
        return 8 if self.flow_type == "classical" else 6

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    # JSON round-trip -------------------------------------------------------
    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        return json.dumps(d, indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "Config":
        d = json.loads(s)
        names = {f.name for f in dataclasses.fields(cls)}
        kw = {}
        for k, v in d.items():
            if k not in names:
                continue
            if isinstance(v, list):
                v = tuple(v)
            kw[k] = v
        return cls(**kw)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "Config":
        with open(path) as f:
            return cls.from_json(f.read())


@dataclass
class PFTOptions:
    """Inference-time parameter-fine-tuning hyperparameters.

    Mirrors the capability of the reference options dict
    (optimization_experiments/run_sequential_optimization.py:69-99).
    Exactly one ``optimize_*`` mode should be active.
    """

    epochs: int = 20
    lr: float = 2e-4
    optimizer: str = "adam"           # 'adam' | 'sgd'
    avg_final_epochs: int = 5
    num_source_imgs: int = 2

    # what to optimize
    optimize_depth_encoder: bool = True       # paper default
    optimize_depth_weights_all: bool = False
    optimize_depth_weights_bottleneck_beyond: bool = False
    optimize_depth_pred: bool = False
    optimize_depth_bottleneck_values: bool = False
    optimize_pose_weights_all: bool = False

    # loss switches
    diff_img_argmin: bool = True
    automasking: bool = True
    l_inverse_reconstruction: bool = True
    l_depth_consist: bool = True
    l_depth_consist_weight: float = 0.15
    l_depth_init: bool = True
    l_depth_init_weight: float = 0.1
    l_smooth: bool = False
    l_smooth_weight: float = 0.05
    l_pose_consist: bool = False

    mode: str = "unscaled"            # 'unscaled' → DNet online rescaling

    def replace(self, **kw) -> "PFTOptions":
        return dataclasses.replace(self, **kw)
