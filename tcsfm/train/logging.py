"""Metric/image logging (tensorboardX replacement, SURVEY.md §5.5).

Uses torch.utils.tensorboard when available, else falls back to JSONL
scalars + PNG images on disk — no hard dependency.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np


class MetricsWriter:
    def __init__(self, log_dir: str, comment: str = ""):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir=log_dir, comment=comment)
        except Exception:
            self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)
        else:
            self._jsonl.write(json.dumps(
                {"tag": tag, "value": float(value), "step": step,
                 "ts": time.time()}) + "\n")
            self._jsonl.flush()

    def add_image(self, tag: str, img: np.ndarray, step: int) -> None:
        """img: [H, W, 3] uint8."""
        if self._tb is not None:
            self._tb.add_image(tag, img, step, dataformats="HWC")
        else:
            from PIL import Image

            safe = tag.replace("/", "_")
            Image.fromarray(img).save(
                os.path.join(self.log_dir, f"{safe}_{step}.png"))

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        else:
            self._jsonl.close()
