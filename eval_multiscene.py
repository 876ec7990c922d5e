#!/usr/bin/env python3
"""Evaluate every scene of a multi-scene training run in ONE process.

The eval counterpart of train_multiscene.py: given a root of per-scene
checkpoints (as written by `train_multiscene.py --save-dir`) and a root of
per-scene datasets, renders each scene's held-out split and reports
per-scene PSNR/SSIM against the ground-truth images. LLFF scenes are
auto-detected (a `poses_bounds.npy` in the scene's data dir) and evaluated
under the --llff-config NDC protocol, so one invocation scores a mixed
blender + LLFF run — the full 7-pretrained-scene table. Scenes with the same
intrinsics share one jit-compiled render function (parameters are pytree
arguments), so the ~40 s TPU compile is paid once per distinct (h, w,
focal) — evaluating 6 like-protocol scenes costs barely more than
evaluating 1. The reference
(krrish94/nerf-pytorch) has no multi-scene tooling at all; its eval_nerf.py
(:39-194) renders a single scene per process and computes no metrics.

Usage:
  python eval_multiscene.py --config configs/lego_lowres.yml \
    --ckpt-root /tmp/multiscene_ckpts --data-root /tmp/distilled \
    --split val [--savedir /tmp/ms_renders]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.config import (
    load_config,
    model_from_config,
    render_settings_from_config,
)
from nerf_tpu.data import (
    composite_white_background,
    load_blender_data,
    llff_holdout_split,
    load_llff_data,
)
from nerf_tpu.engine.checkpoint import latest_checkpoint, load_checkpoint
from nerf_tpu.engine.renderer import make_pose_render_fn
from nerf_tpu.utils import psnr, ssim


def main():
    from nerf_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # persistent XLA executable cache across CLI runs
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--config", required=True,
        help="Protocol config (model shape + sampling settings), e.g. "
             "configs/lego_lowres.yml — must match what the scenes were "
             "trained with.",
    )
    parser.add_argument(
        "--ckpt-root", required=True,
        help="Directory of per-scene checkpoint dirs "
             "(train_multiscene.py --save-dir layout).",
    )
    parser.add_argument(
        "--data-root", required=True,
        help="Directory of per-scene blender datasets (one subdir per scene, "
             "names matching --ckpt-root).",
    )
    parser.add_argument(
        "--scenes", nargs="*", default=None,
        help="Scene names (default: every subdir of --ckpt-root).",
    )
    parser.add_argument("--split", choices=["train", "val", "test"], default="val")
    parser.add_argument(
        "--half-res", action=argparse.BooleanOptionalAction, default=True,
        help="Load datasets at half resolution. Default matches "
             "train_multiscene.py so a default-flags train/eval pair sees "
             "the same resolution; pass --no-half-res for datasets already "
             "at target resolution (e.g. distilled sets).",
    )
    parser.add_argument(
        "--savedir", default="",
        help="If set, also write rendered PNGs to savedir/<scene>/.",
    )
    parser.add_argument("--precision", choices=["bfloat16", "float32"],
                        default="float32")
    parser.add_argument("--renderer", choices=["pallas", "xla"],
                        default="pallas")
    parser.add_argument(
        "--llff-config", default="configs/fern_lowres.yml",
        help="Protocol config for LLFF scenes (auto-detected per scene by a "
             "poses_bounds.npy in its data dir; NDC settings + model shape).",
    )
    parser.add_argument(
        "--llff-factor", type=int, default=1,
        help="LLFF image downsample factor (1 for distilled sets).",
    )
    args = parser.parse_args()

    cfg = load_config(args.config)
    llff_cfg = None  # loaded lazily on the first LLFF scene
    if args.scenes is not None:
        scenes = args.scenes
        if not scenes:
            raise SystemExit("--scenes given but empty")
    else:
        scenes = sorted(
            d for d in os.listdir(args.ckpt_root)
            if os.path.isdir(os.path.join(args.ckpt_root, d))
        )
    if not scenes:
        raise SystemExit(f"no scene dirs under {args.ckpt_root}")

    # One compiled pose->image renderer per distinct (protocol, h, w,
    # focal): scenes sharing a protocol + intrinsics (the normal multi-scene
    # case) share one compile; a scene with different intrinsics gets its
    # own instead of silently rendering with another scene's camera. LLFF
    # scenes use the --llff-config protocol (NDC is a compile-time split).
    render_cache = {}

    def get_render_fn(scene_cfg, tag, h, w, focal):
        key = (tag, h, w, round(focal, 6))
        if key not in render_cache:
            settings = dataclasses.replace(
                render_settings_from_config(
                    scene_cfg, "validation", hwf=(h, w, focal)
                ),
                compute_dtype=args.precision,
                use_pallas=(args.renderer == "pallas"),
            )
            mc = model_from_config(scene_cfg.models.coarse)
            mf = (
                model_from_config(scene_cfg.models.fine)
                if "fine" in scene_cfg.models else None
            )
            render_cache[key] = make_pose_render_fn(
                mc, mf, settings, h, w, focal, output="f32"
            )
        return render_cache[key]

    results = {}
    t0 = time.time()
    for scene in scenes:
        scene_dir = os.path.join(args.data_root, scene)
        is_llff = os.path.exists(os.path.join(scene_dir, "poses_bounds.npy"))
        if is_llff:
            if llff_cfg is None:
                llff_cfg = load_config(args.llff_config)
            images, poses_full, _bds, _rp, _ = load_llff_data(
                scene_dir, factor=args.llff_factor
            )
            hwf = poses_full[0, :3, -1]
            poses = poses_full[:, :3, :4]
            images = images[..., :3]
            # Reference llffhold=8 split (shared llff_holdout_split —
            # val and test both read the holdout).
            i_train, i_hold = llff_holdout_split(images.shape[0])
            sel = i_train if args.split == "train" else i_hold
            scene_cfg, tag = llff_cfg, "llff"
        else:
            images, poses, _, hwf, i_split = load_blender_data(
                scene_dir, half_res=args.half_res,
            )
            # Composite RGBA ground truth onto white only when the renderer
            # composites onto white too (cfg.nerf.validation
            # .white_background, same gating as training) — otherwise PSNR
            # compares against a background the model was never asked to
            # produce. No-op for RGB datasets (e.g. distilled sets).
            if bool(cfg.nerf.validation.white_background):
                images = composite_white_background(images)
            idx = {"train": 0, "val": 1, "test": 2}[args.split]
            sel = i_split[idx]
            scene_cfg, tag = cfg, "blender"
        if len(sel) == 0:
            raise SystemExit(f"scene {scene!r} has no views in split {args.split!r}")
        h, w, focal = int(hwf[0]), int(hwf[1]), float(hwf[2])
        render_fn = get_render_fn(scene_cfg, tag, h, w, focal)

        ckpt_path = latest_checkpoint(os.path.join(args.ckpt_root, scene))
        if ckpt_path is None:
            raise FileNotFoundError(
                f"no .ntc checkpoints under {os.path.join(args.ckpt_root, scene)}"
            )
        ckpt = load_checkpoint(ckpt_path)
        params_coarse = jax.tree.map(jnp.asarray, ckpt["params_coarse"])
        params_fine = (
            jax.tree.map(jnp.asarray, ckpt["params_fine"])
            if ckpt.get("params_fine") is not None else None
        )

        psnrs, ssims = [], []
        outdir = os.path.join(args.savedir, scene) if args.savedir else ""
        if outdir:
            os.makedirs(outdir, exist_ok=True)

        def score(k, i, pred_dev):
            pred = np.asarray(pred_dev)
            gt = np.asarray(images[i][..., :3], np.float32)
            psnrs.append(float(psnr(pred, gt)))
            ssims.append(float(ssim(pred, gt)))
            if outdir:
                import imageio.v2 as imageio

                imageio.imwrite(
                    os.path.join(outdir, f"{args.split}_{k:03d}.png"),
                    (pred * 255).astype(np.uint8),
                )

        # 2-deep dispatch pipeline (same as eval_nerf.py): view k+1's render
        # is enqueued before view k's image is fetched/scored, so the host
        # fetch + PSNR/SSIM work overlaps device compute.
        pending = None
        for k, i in enumerate(sel):
            pose34 = jnp.asarray(poses[i, :3, :4], jnp.float32)
            out = render_fn(params_coarse, params_fine, pose34)
            if pending is not None:
                score(*pending)
            pending = (k, i, out)
        score(*pending)
        results[scene] = {
            "checkpoint": os.path.basename(ckpt_path),
            "step": int(ckpt.get("step", -1)),
            "num_views": len(sel),
            "psnr_mean": round(float(np.mean(psnrs)), 3),
            "psnr_min": round(float(np.min(psnrs)), 3),
            "ssim_mean": round(float(np.mean(ssims)), 4),
        }
        r = results[scene]
        print(
            f"[{scene}] {r['checkpoint']} {args.split} x{r['num_views']}: "
            f"psnr {r['psnr_mean']:.2f} (min {r['psnr_min']:.2f}) "
            f"ssim {r['ssim_mean']:.4f}"
        )

    summary = {
        "split": args.split,
        "scenes": results,
        "psnr_mean_over_scenes": round(
            float(np.mean([r["psnr_mean"] for r in results.values()])), 3
        ),
        "elapsed_s": round(time.time() - t0, 1),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
