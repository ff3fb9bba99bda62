"""Checkpointing: (params, batch_stats, opt_state, step, best metric) + config.

Replaces save_ckp/load_ckp (utils/learning_helpers.py:20-48) with
flax-serialization msgpack files plus a JSON config — same semantics:
``checkpoint.msgpack`` per save, copied to ``best_model/best_model.msgpack``
when the combined fwd+inv reconstruction validation loss improves
(run_mono_training.py:236-250); loading the *best* model restarts at epoch
1 without optimizer state, loading the checkpoint resumes fully.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from tcsfm.config import Config


def save_checkpoint(ckpt_dir: str, state, epoch: int, best_val_loss: float,
                    cfg: Optional[Config] = None, is_best: bool = False) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {
        "epoch": epoch,
        "best_val_loss": float(best_val_loss),
        "step": np.asarray(state.step),
        "params": serialization.to_state_dict(jax.device_get(state.params)),
        "batch_stats": serialization.to_state_dict(
            jax.device_get(state.batch_stats)),
        "opt_state": serialization.to_state_dict(
            jax.device_get(state.opt_state)),
    }
    path = os.path.join(ckpt_dir, "checkpoint.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    if cfg is not None:
        cfg.save(os.path.join(ckpt_dir, "config.json"))
    if is_best:
        best_dir = os.path.join(ckpt_dir, "best_model")
        os.makedirs(best_dir, exist_ok=True)
        shutil.copyfile(path, os.path.join(best_dir, "best_model.msgpack"))
    return path


def load_checkpoint(ckpt_dir: str, state, load_best: bool = False
                    ) -> Tuple[Any, int, float]:
    """Returns (state, start_epoch, best_val_loss).

    load_best=True → epoch 1, fresh optimizer, best_val_loss reset
    (learning_helpers.py:29-48).
    """
    if load_best:
        path = os.path.join(ckpt_dir, "best_model", "best_model.msgpack")
        if not os.path.exists(path):
            # no best model yet (best selection starts at epoch 1 like the
            # reference, run_mono_training.py:236-241): fall back to the
            # latest checkpoint so 1-epoch / interrupted runs stay loadable
            fallback = os.path.join(ckpt_dir, "checkpoint.msgpack")
            if os.path.exists(fallback):
                print(f"no best_model in {ckpt_dir}; loading latest "
                      f"checkpoint instead")
                path = fallback
    else:
        path = os.path.join(ckpt_dir, "checkpoint.msgpack")
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())

    params = serialization.from_state_dict(jax.device_get(state.params),
                                           payload["params"])
    batch_stats = serialization.from_state_dict(
        jax.device_get(state.batch_stats), payload["batch_stats"])
    state = state.replace(params=params, batch_stats=batch_stats)
    if load_best:
        return state, 1, 1e5
    opt_state = serialization.from_state_dict(
        jax.device_get(state.opt_state), payload["opt_state"])
    state = state.replace(
        opt_state=opt_state,
        step=jax.numpy.asarray(payload["step"]),
    )
    return state, int(payload["epoch"]) + 1, float(payload["best_val_loss"])
