#!/usr/bin/env python3
"""Precompute a ray cache for fast training (TPU-native CLI).

Behavioral parity target (reference: krrish94/nerf-pytorch
cache_dataset.py:16-135): expand a blender/LLFF dataset into precomputed ray
bundles + targets. Redesigned storage: ONE flat .npz ray store covering every
training pixel (uploads to HBM in one transfer, shards over a mesh) instead
of thousands of per-image torch.save files — which also fixes the reference's
variation-overwrite bug (cache_dataset.py:112-114, all num-variations files
collapse onto one path).

Usage:
  python cache_dataset.py --datapath data/lego --type blender \
      --savedir cache/legocache [--half-res] [--blender-white-background]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from nerf_tpu.data import (
    build_ray_store,
    composite_white_background,
    load_blender_data,
    load_llff_data,
    save_ray_cache,
)


def cache_nerf_dataset(args) -> str:
    if args.type == "blender":
        images, poses, _, hwf, i_split = load_blender_data(
            args.datapath, half_res=args.half_res, testskip=args.testskip
        )
        i_train, i_val, _ = i_split
        if args.blender_white_background:
            images = composite_white_background(images)
        near, far = 2.0, 6.0
        poses = poses[:, :3, :4]
    elif args.type == "llff":
        images, poses, bds, _, i_test = load_llff_data(
            args.datapath, factor=args.factor, spherify=args.spherify,
            path_zflat=args.path_zflat,
        )
        hwf = [int(poses[0, 0, 4]), int(poses[0, 1, 4]), float(poses[0, 2, 4])]
        poses = poses[:, :3, :4]
        if args.llffhold > 0:
            i_test = np.arange(images.shape[0])[:: args.llffhold]
        else:
            # loader-selected nearest-to-average holdout view
            i_test = np.array([i_test])
        i_val = i_test
        i_train = np.array(
            [i for i in range(images.shape[0]) if i not in i_test]
        )
        near, far = float(bds.min() * 0.9), float(bds.max())
    else:
        raise ValueError(f"Unknown dataset type {args.type!r}")

    h, w, focal = int(hwf[0]), int(hwf[1]), float(hwf[2])
    if args.format == "reference":
        return _write_reference_cache(args, images, poses, i_train, i_val,
                                      h, w, focal)
    ro, rd, targets = build_ray_store(images[i_train], poses[i_train], h, w, focal)

    if args.num_random_rays > 0:
        # Optional subsampling for small caches (the role of the reference's
        # num-random-rays x num-variations sampling, minus the overwrite bug).
        rng = np.random.default_rng(args.seed)
        total = args.num_random_rays * args.num_variations * len(i_train)
        if total < ro.shape[0]:
            idx = rng.choice(ro.shape[0], size=total, replace=False)
            ro, rd, targets = ro[idx], rd[idx], targets[idx]

    os.makedirs(args.savedir, exist_ok=True)
    if args.format == "binary":
        # Native single-file binary cache (C++ packer, one read per array).
        from nerf_tpu import native

        path = os.path.join(args.savedir, "rays.nrc")
        native.pack_ray_cache(path, ro, rd, targets, h, w, focal, near, far)
    else:
        path = os.path.join(args.savedir, "rays.npz")
        save_ray_cache(
            path,
            ro,
            rd,
            targets,
            meta={
                "height": h, "width": w, "focal": focal,
                "near": near, "far": far, "type": args.type,
            },
            val_images=images[i_val][..., :3],
            val_poses=poses[i_val],
        )
    print(f"cached {ro.shape[0]:,} rays -> {path}")
    return path


def _write_reference_cache(args, images, poses, i_train, i_val, h, w, focal):
    """Write a reference-consumable cache dir: per-image ``torch.save``
    dicts under ``train/``/``val/`` exactly as reference
    ``cache_dataset.py:73-135`` lays them out, so a reference user can
    point their ``train_nerf.py`` cachedir at our output. The two splits
    use DIFFERENT schemas, matching what the reference's training loop
    reads: ``train/NNNN.data`` carries a stacked ``ray_bundle`` (2, N, 3)
    (consumed by reference ``train_nerf.py:177-183``), while ``val/``
    carries full-image ``ray_origins``/``ray_directions`` (H, W, 3)
    (reference ``cache_dataset.py:120-135``, consumed by
    ``train_nerf.py:304-317`` — a ``ray_bundle`` val file would crash the
    reference's first validation step with KeyError). ``train`` files
    subsample ``--num-random-rays`` when set. Without the reference's
    variation-overwrite bug, one file per image is the whole surface."""
    from nerf_tpu.engine.checkpoint import _import_torch

    torch = _import_torch()
    rng = np.random.default_rng(args.seed)
    count = 0
    for split, idxs in (("train", i_train), ("val", i_val)):
        outdir = os.path.join(args.savedir, split)
        os.makedirs(outdir, exist_ok=True)
        for i in idxs:
            ro, rd, tgt = build_ray_store(
                images[i : i + 1], poses[i : i + 1], h, w, focal
            )
            d = {"height": h, "width": w, "focal_length": focal}
            if split == "train":
                if args.num_random_rays > 0:
                    sel = rng.choice(
                        ro.shape[0], size=args.num_random_rays, replace=False
                    )
                    ro, rd, tgt = ro[sel], rd[sel], tgt[sel]
                else:
                    # reference sample_all layout: full-image (2, H, W, 3)
                    ro, rd, tgt = (x.reshape(h, w, 3) for x in (ro, rd, tgt))
                d["ray_bundle"] = torch.stack(
                    [torch.from_numpy(ro), torch.from_numpy(rd)], dim=0
                )
                d["target"] = torch.from_numpy(tgt)
            else:
                d["ray_origins"] = torch.from_numpy(ro.reshape(h, w, 3))
                d["ray_directions"] = torch.from_numpy(rd.reshape(h, w, 3))
                d["target"] = torch.from_numpy(tgt.reshape(h, w, 3))
            torch.save(d, os.path.join(outdir, f"{int(i):04d}.data"))
            count += 1
    print(f"cached {count} reference-format .data files -> {args.savedir}")
    return args.savedir


def main():
    from nerf_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # persistent XLA executable cache across CLI runs
    parser = argparse.ArgumentParser()
    parser.add_argument("--datapath", type=str, required=True)
    parser.add_argument("--type", type=str, required=True, choices=["blender", "llff"])
    parser.add_argument("--savedir", type=str, required=True)
    parser.add_argument("--half-res", action="store_true")
    parser.add_argument("--testskip", type=int, default=1)
    parser.add_argument("--factor", type=int, default=8, help="LLFF downsample factor")
    parser.add_argument("--llffhold", type=int, default=8)
    parser.add_argument(
        "--spherify", action="store_true",
        help="Spherify 360-degree LLFF captures (load_llff.py:278-279)",
    )
    parser.add_argument(
        "--path-zflat", action="store_true",
        help="Flatten the spiral render path in z (load_llff.py:278-279). "
             "Loader-surface parity pass-through: the cache stores no render "
             "trajectory, so this does not change the cached rays",
    )
    parser.add_argument("--blender-white-background", action="store_true")
    parser.add_argument(
        "--num-random-rays", type=int, default=0,
        help="Rays per (image, variation) to keep; 0 = keep every pixel.",
    )
    parser.add_argument("--num-variations", type=int, default=1)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--format", choices=["npz", "binary", "reference"], default="npz",
        help="npz (with validation views), the native single-file binary "
             "cache, or 'reference': per-image torch.save .data files the "
             "reference's own cachedir training path consumes.",
    )
    cache_nerf_dataset(parser.parse_args())


if __name__ == "__main__":
    main()
