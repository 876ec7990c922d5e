#!/usr/bin/env python3
"""Compute image-quality metrics (PSNR / SSIM) between two image sets.

The reference reports PSNR only as a by-product of training loss
(train_nerf.py:258-260) and ships no evaluation tool; this CLI closes the
loop for render-parity checks: point it at a directory of rendered frames
and a directory (or npz) of ground-truth frames.

Usage:
  python evaluate_metrics.py --pred rendered/ --target gt_dir/
  python evaluate_metrics.py --pred rendered/ --target gt.npz --target-key images
"""

from __future__ import annotations

import argparse
import json
import os

import imageio.v2 as imageio
import numpy as np

from nerf_tpu.utils import psnr, ssim


def _load_images(path: str, key: str = "images"):
    if path.endswith(".npz"):
        arr = np.load(path)[key]
        out = arr.astype(np.float32)
        # Normalize uint8 (or other >1-range) arrays to [0, 1] so npz and
        # directory inputs compare on the same scale.
        if arr.dtype == np.uint8 or out.max() > 2.0:
            out = out / 255.0
        return out
    files = sorted(
        f for f in os.listdir(path) if f.endswith((".png", ".jpg", ".jpeg"))
    )
    imgs = [imageio.imread(os.path.join(path, f)) for f in files]
    return np.stack([np.asarray(im, np.float32) / 255.0 for im in imgs])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--pred", required=True, help="Rendered images (dir or npz).")
    parser.add_argument("--target", required=True, help="Ground truth (dir or npz).")
    parser.add_argument("--target-key", default="images")
    parser.add_argument("--pred-key", default="images")
    args = parser.parse_args()

    pred = _load_images(args.pred, args.pred_key)
    target = _load_images(args.target, args.target_key)[..., :3]
    pred = pred[..., :3]
    n = min(len(pred), len(target))
    if len(pred) != len(target):
        print(f"warning: {len(pred)} pred vs {len(target)} target; comparing first {n}")
    psnrs = [psnr(pred[i], target[i]) for i in range(n)]
    ssims = [ssim(pred[i], target[i]) for i in range(n)]
    result = {
        "num_images": n,
        "psnr_mean": float(np.mean(psnrs)),
        "psnr_per_image": [round(float(p), 3) for p in psnrs],
        "ssim_mean": float(np.mean(ssims)),
        "ssim_per_image": [round(float(s), 4) for s in ssims],
    }
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
