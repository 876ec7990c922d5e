#!/usr/bin/env python3
"""Distill a trained NeRF checkpoint into a blender-format dataset.

A trained checkpoint IS a scene: rendering it from fresh camera poses yields
a training set whose ground truth is the teacher's radiance field. This
closes the quality-parity loop when the original images are unavailable —
train a student from scratch on the distilled set and compare held-out PSNR
against the teacher (the reference's own pretrained checkpoints record the
PSNR they reached on the real data, e.g.
pretrained/lego-lowres/checkpoint199999.ckpt `psnr` = 21.4, written by
reference train_nerf.py:373-388).

Output layout matches nerf/load_blender.py:40-116's contract exactly:
  savedir/transforms_{train,val,test}.json  (camera_angle_x + frames)
  savedir/{train,val,test}/r_{i}.png        (RGB, teacher renders)

Poses are seeded random upper-hemisphere views at the standard blender
synthetic radius — the same camera distribution family the real lego set
uses (pose_spherical, reference load_blender.py:32-37).

Usage:
  python distill_dataset.py --config configs/lego_lowres.yml \
      --checkpoint /root/reference/pretrained/lego-lowres/checkpoint199999.ckpt \
      --savedir /tmp/lego_distilled --num-train 100 --num-val 8
"""

from __future__ import annotations

import argparse
import json
import os
import time

import imageio.v2 as imageio
import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.config import load_config, model_from_config, render_settings_from_config
from nerf_tpu.data import pose_spherical
from nerf_tpu.engine.checkpoint import load_checkpoint, load_reference_checkpoint
from nerf_tpu.engine.renderer import make_image_render_fn
from nerf_tpu.ops import get_ray_bundle

BLENDER_CAMERA_ANGLE_X = 0.6911112070083618  # the synthetic scenes' FOV
BLENDER_RADIUS = 4.0311289


def random_hemisphere_poses(rng: np.random.Generator, n: int,
                            radius: float = BLENDER_RADIUS) -> np.ndarray:
    """n seeded random upper-hemisphere camera-to-world poses (4, 4)."""
    poses = []
    for _ in range(n):
        theta = float(rng.uniform(-180.0, 180.0))
        phi = float(rng.uniform(-80.0, -5.0))
        poses.append(np.asarray(pose_spherical(theta, phi, radius)))
    return np.stack(poses)


def load_params(checkpoint: str, cfg):
    """Load (model_coarse, model_fine, params_coarse, params_fine) from a
    native .ntc or reference .ckpt checkpoint (same logic as eval_nerf.py)."""
    is_reference = checkpoint.endswith(".ckpt")
    model_coarse = model_from_config(cfg.models.coarse,
                                     reference_compat_shapes=is_reference)
    model_fine = (
        model_from_config(cfg.models.fine, reference_compat_shapes=is_reference)
        if "fine" in cfg.models else None
    )
    ckpt = (load_reference_checkpoint(checkpoint) if is_reference
            else load_checkpoint(checkpoint))
    params_coarse = jax.tree.map(jnp.asarray, ckpt["params_coarse"])
    params_fine = (
        jax.tree.map(jnp.asarray, ckpt["params_fine"])
        if ckpt.get("params_fine") is not None else None
    )
    return model_coarse, model_fine, params_coarse, params_fine


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--savedir", required=True)
    parser.add_argument("--num-train", type=int, default=100)
    parser.add_argument("--num-val", type=int, default=8)
    parser.add_argument("--num-test", type=int, default=8)
    parser.add_argument("--size", type=int, default=400,
                        help="Rendered image side (blender half-res = 400).")
    parser.add_argument("--seed", type=int, default=2026)
    parser.add_argument(
        "--precision", choices=["bfloat16", "float32"], default="float32",
        help="Teacher render dtype (float32: exact teacher).",
    )
    parser.add_argument(
        "--renderer", choices=["pallas", "xla"], default="xla",
        help="xla (default): the parity-exact teacher. pallas: ~2x faster, "
             "differs at a few resample-boundary pixels.",
    )
    args = parser.parse_args()

    cfg = load_config(args.config)
    h = w = args.size
    focal = 0.5 * w / np.tan(0.5 * BLENDER_CAMERA_ANGLE_X)

    model_coarse, model_fine, params_coarse, params_fine = load_params(
        args.checkpoint, cfg
    )
    settings = render_settings_from_config(cfg, "validation", hwf=(h, w, focal))
    import dataclasses

    settings = dataclasses.replace(
        settings,
        compute_dtype=args.precision,
        use_pallas=(args.renderer == "pallas"),
    )
    render_image = make_image_render_fn(model_coarse, model_fine, settings)

    rng = np.random.default_rng(args.seed)
    splits = {
        "train": random_hemisphere_poses(rng, args.num_train),
        "val": random_hemisphere_poses(rng, args.num_val),
        "test": random_hemisphere_poses(rng, args.num_test),
    }

    t0 = time.time()
    total = 0
    for split, poses in splits.items():
        os.makedirs(os.path.join(args.savedir, split), exist_ok=True)
        frames = []
        for i, pose in enumerate(poses):
            ro, rd = get_ray_bundle(
                h, w, focal, jnp.asarray(pose[:3, :4], jnp.float32)
            )
            maps = render_image(params_coarse, params_fine, ro, rd)
            rgb = np.asarray(maps.get("rgb_fine", maps["rgb_coarse"]))
            img = (np.clip(rgb, 0.0, 1.0) * 255).astype(np.uint8)
            imageio.imwrite(
                os.path.join(args.savedir, split, f"r_{i}.png"), img
            )
            frames.append(
                {
                    "file_path": f"./{split}/r_{i}",
                    "transform_matrix": np.asarray(pose, np.float64).tolist(),
                }
            )
            total += 1
        with open(
            os.path.join(args.savedir, f"transforms_{split}.json"), "w"
        ) as f:
            json.dump(
                {"camera_angle_x": BLENDER_CAMERA_ANGLE_X, "frames": frames},
                f, indent=1,
            )
        print(f"[{split}] {len(poses)} views written")

    dt = time.time() - t0
    print(
        f"distilled {total} views at {h}x{w} into {args.savedir} in {dt:.1f}s "
        f"({dt / max(total, 1):.2f}s/view incl. compile)"
    )


if __name__ == "__main__":
    main()
