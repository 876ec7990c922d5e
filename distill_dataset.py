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

Output layout follows the dataset type in --config:

blender (`dataset.type: blender`) — nerf/load_blender.py:40-116's contract:
  savedir/transforms_{train,val,test}.json  (camera_angle_x + frames)
  savedir/{train,val,test}/r_{i}.png        (RGB, teacher renders)
Poses are seeded random upper-hemisphere views at the standard blender
synthetic radius — the same camera distribution family the real lego set
uses (pose_spherical, reference load_blender.py:32-37).

llff (`dataset.type: llff`) — nerf/load_llff.py:69-142's contract:
  savedir/images/image{i}.png + savedir/poses_bounds.npy  ((N, 17) raw poses)
  savedir/holdout/{k}.png  (copies of the llffhold-stride held-out views, in
                            eval_nerf.py --split val output order)
Poses are jittered forward-facing views built with the reference spiral
path's math (load_llff.py:169-183), pre-recentered and bound-calibrated so
the loader's recenter/rescale reproduce them exactly; the teacher renders
through the NDC pipeline the config specifies.

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

from nerf_tpu.config import load_config, render_settings_from_config
from nerf_tpu.data import pose_spherical
from nerf_tpu.engine.checkpoint import load_models_and_params
from nerf_tpu.engine.renderer import make_pose_render_fn

BLENDER_CAMERA_ANGLE_X = 0.6911112070083618  # the synthetic scenes' FOV
BLENDER_RADIUS = 4.0311289


# Typical LLFF handheld-capture focal ratio (fern: 3261.55px at 4032px wide,
# ~63.5 deg FOV). Any consistent focal defines a valid distilled scene; this
# one keeps the NDC frustum shaped like the captures the teacher saw.
LLFF_FOCAL_RATIO = 3261.55 / 4032.0
LLFF_ASPECT = 3024.0 / 4032.0  # portrait-sensor landscape crop, H/W


def random_hemisphere_poses(rng: np.random.Generator, n: int,
                            radius: float = BLENDER_RADIUS) -> np.ndarray:
    """n seeded random upper-hemisphere camera-to-world poses (4, 4)."""
    poses = []
    for _ in range(n):
        theta = float(rng.uniform(-180.0, 180.0))
        phi = float(rng.uniform(-80.0, -5.0))
        poses.append(np.asarray(pose_spherical(theta, phi, radius)))
    return np.stack(poses)


def forward_facing_poses(rng: np.random.Generator, n: int,
                         rads=(0.35, 0.1, 0.12),
                         focus_depth: float = 4.4) -> np.ndarray:
    """n jittered forward-facing c2w poses (n, 3, 4) in the LLFF recentered
    frame (cameras near the origin looking down -z at a focus plane), built
    with the reference spiral path's own math (load_llff.py:169-183): camera
    centers sweep an ellipse of radii ``rads`` (+ seeded jitter), and each
    orientation is the viewmatrix toward the [0, 0, -focus_depth] point.
    The set is then recentered (recenter_poses) so its average pose is the
    identity — the LLFF loader's own recentering becomes a no-op and the
    teacher-render poses equal the student-training poses exactly."""
    from nerf_tpu.data.llff import recenter_poses
    from nerf_tpu.data.poses import normalize, viewmatrix

    up = np.array([0.0, 1.0, 0.0])
    poses = []
    for i in range(n):
        th = 2.0 * np.pi * 2.0 * i / n  # two sweeps, like the spiral's rots=2
        c = np.array([
            np.cos(th) * rads[0],
            -np.sin(th) * rads[1],
            -np.sin(th * 0.5) * rads[2],
        ])
        c = c + rng.uniform(-0.15, 0.15, 3) * np.asarray(rads)
        z = normalize(c - np.array([0.0, 0.0, -focus_depth]))
        poses.append(viewmatrix(z, up, c))
    poses = np.stack(poses).astype(np.float64)  # (n, 3, 4)
    return recenter_poses(poses)[:, :3, :4]


def write_llff_poses_bounds(savedir: str, poses_c2w: np.ndarray,
                            hwf, bds) -> None:
    """Write ``poses_bounds.npy`` such that load_llff_data reproduces
    ``poses_c2w`` exactly: invert the loader's column swap
    (loaded col0 = raw col1, loaded col1 = -raw col0, llff.py:232) and pick
    bounds whose min makes the bd_factor rescale sc = 1/(bds.min()*0.75)
    equal 1 (load_llff.py:295-297)."""
    n = poses_c2w.shape[0]
    raw = np.concatenate(
        [-poses_c2w[:, :, 1:2], poses_c2w[:, :, 0:1], poses_c2w[:, :, 2:4]],
        axis=2,
    )  # (n, 3, 4)
    hwf_col = np.broadcast_to(
        np.asarray(hwf, np.float64).reshape(1, 3, 1), (n, 3, 1)
    )
    flat = np.concatenate([raw, hwf_col], axis=2).reshape(n, 15)
    out = np.concatenate(
        [flat, np.tile(np.asarray(bds, np.float64), (n, 1))], axis=1
    )  # (n, 17)
    np.save(os.path.join(savedir, "poses_bounds.npy"), out)


def load_params(checkpoint: str, cfg):
    """Load (model_coarse, model_fine, params_coarse, params_fine) from a
    native .ntc or reference .ckpt checkpoint (shared with eval_nerf.py)."""
    mc, mf, pc, pf, _ = load_models_and_params(checkpoint, cfg)
    return mc, mf, pc, pf


def main():
    from nerf_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # persistent XLA executable cache across CLI runs
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--savedir", required=True)
    parser.add_argument("--num-train", type=int, default=100)
    parser.add_argument("--num-val", type=int, default=8)
    parser.add_argument(
        "--num-test", type=int, default=None,
        help="Test views (blender layout only; default 8). LLFF has no "
             "separate test split (val == test, reference "
             "train_nerf.py:75-84) — passing this with an LLFF config is "
             "an error.",
    )
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
    is_llff = getattr(cfg.dataset, "type", "blender") == "llff"
    if is_llff:
        w = args.size
        h = int(round(w * LLFF_ASPECT))
        focal = w * LLFF_FOCAL_RATIO
    else:
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
    # Pose -> uint8 teacher renderer (ray generation inside the jit,
    # device-side uint8 cast — engine.renderer.make_pose_render_fn) +
    # 2-deep dispatch pipeline so PNG-encode overlaps device compute.
    render_u8 = make_pose_render_fn(
        model_coarse, model_fine, settings, h, w, focal, output="u8"
    )

    def render_views(poses, write_out):
        """Render each pose, calling write_out(i, uint8_image) one frame
        behind the device so fetch/PNG-encode overlap compute."""
        pending = None
        for i, pose in enumerate(poses):
            pose34 = jnp.asarray(pose[:3, :4], jnp.float32)
            out = render_u8(params_coarse, params_fine, pose34)
            if pending is not None:
                write_out(pending[0], np.asarray(pending[1]))
            pending = (i, out)
        if pending is not None:
            write_out(pending[0], np.asarray(pending[1]))

    rng = np.random.default_rng(args.seed)

    if is_llff:
        # LLFF layout: flat images/ + poses_bounds.npy, holdout views at the
        # llffhold stride (the split train_nerf.py/eval_nerf.py compute,
        # reference train_nerf.py:75-84). Every i % llffhold == 0 view is
        # held out and additionally copied to holdout/ in eval output order
        # for evaluate_metrics.py.
        if args.num_test is not None:
            raise SystemExit(
                "--num-test is not defined for LLFF datasets (val == test, "
                "reference train_nerf.py:75-84); use --num-val"
            )
        llffhold = int(getattr(cfg.dataset, "llffhold", 8))
        total = args.num_train + args.num_val
        nv_actual = len(range(0, total, llffhold))
        if nv_actual != args.num_val:
            # The holdout split is defined by the training-protocol llffhold
            # stride over the whole set, NOT by --num-val directly; choose
            # num_train/num_val so total/llffhold == num_val for an exact
            # match (e.g. 56+8 with llffhold 8).
            print(
                f"note: llffhold={llffhold} over {total} views holds out "
                f"{nv_actual} views, not --num-val={args.num_val}"
            )
        poses = forward_facing_poses(rng, total)
        imgdir = os.path.join(args.savedir, "images")
        holddir = os.path.join(args.savedir, "holdout")
        os.makedirs(imgdir, exist_ok=True)
        os.makedirs(holddir, exist_ok=True)
        t0 = time.time()

        def write_llff_view(i, img):
            imageio.imwrite(os.path.join(imgdir, f"image{i:03d}.png"), img)
            if i % llffhold == 0:
                imageio.imwrite(
                    os.path.join(holddir, f"{i // llffhold:04d}.png"), img
                )

        render_views(poses, write_llff_view)
        write_llff_poses_bounds(
            args.savedir, poses, (h, w, focal), (4.0 / 3.0, 8.0)
        )
        nv = len(range(0, total, llffhold))
        dt = time.time() - t0
        print(
            f"distilled LLFF set: {total} views at {w}x{h} "
            f"({total - nv} train / {nv} holdout, llffhold={llffhold}) "
            f"into {args.savedir} in {dt:.1f}s"
        )
        return

    splits = {
        "train": random_hemisphere_poses(rng, args.num_train),
        "val": random_hemisphere_poses(rng, args.num_val),
        "test": random_hemisphere_poses(
            rng, 8 if args.num_test is None else args.num_test
        ),
    }

    t0 = time.time()
    total = 0
    for split, poses in splits.items():
        os.makedirs(os.path.join(args.savedir, split), exist_ok=True)
        frames = []

        def write_split_view(i, img, split=split):
            imageio.imwrite(
                os.path.join(args.savedir, split, f"r_{i}.png"), img
            )

        render_views(poses, write_split_view)
        for i, pose in enumerate(poses):
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
