"""Experiment logging: TensorBoard-compatible scalars/images + JSONL fallback.

Reference behavior being reproduced (train_nerf.py:145-151, 272-285, 348-363):
a SummaryWriter at ``logdir/id`` with train/validation scalar tags and
validation images, plus the config snapshot dumped alongside. We write the
same tags (fixing the reference's "validataion/psnr" typo, train_nerf.py:350)
through torch's TB writer when available, and always mirror scalars to a
``metrics.jsonl`` so no torch/tensorboard dependency is required to consume
results.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict

import numpy as np


class MetricWriter:
    """Scalar/image logger: TensorBoard events (if available) + JSONL mirror."""

    def __init__(self, logdir: str, use_tensorboard: bool = True):
        self.logdir = logdir
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter  # noqa: PLC0415

                self._tb = SummaryWriter(logdir)
            except Exception:
                self._tb = None

    def scalar(self, tag: str, value: float, step: int) -> None:
        record = {
            "tag": tag,
            "value": float(value),
            "step": int(step),
            "time": time.time(),
        }
        self._jsonl.write(json.dumps(record) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def scalars(self, values: Dict[str, float], step: int) -> None:
        for tag, value in values.items():
            self.scalar(tag, value, step)

    def image(self, tag: str, img: np.ndarray, step: int) -> None:
        """img: (H, W, 3) float in [0, 1]. Saved as PNG; mirrored to TB."""
        img = np.clip(np.asarray(img), 0.0, 1.0)
        import imageio.v2 as imageio  # noqa: PLC0415

        img_dir = os.path.join(self.logdir, "images")
        os.makedirs(img_dir, exist_ok=True)
        safe_tag = tag.replace("/", "_")
        imageio.imwrite(
            os.path.join(img_dir, f"{safe_tag}_{step:06d}.png"),
            (img * 255).astype(np.uint8),
        )
        if self._tb is not None:
            self._tb.add_image(tag, img, int(step), dataformats="HWC")

    def flush(self) -> None:
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class RateMeter:
    """Tracks rays/sec (the north-star perf metric) over a sliding window."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list = []
        self._counts: list = []

    def update(self, num_rays: int) -> None:
        self._times.append(time.time())
        self._counts.append(num_rays)
        if len(self._times) > self.window:
            self._times.pop(0)
            self._counts.pop(0)

    def rate(self) -> float:
        if len(self._times) < 2:
            return 0.0
        dt = self._times[-1] - self._times[0]
        if dt <= 0:
            return 0.0
        return sum(self._counts[1:]) / dt
