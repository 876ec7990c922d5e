#!/usr/bin/env python3
"""Extract a mesh or colored point cloud from a trained NeRF checkpoint.

The reference (krrish94/nerf-pytorch) has no geometry export; the original
NeRF release's extract_mesh notebook (sigma grid -> marching cubes at
iso=50) is the convention users expect. This CLI rebuilds it TPU-native:
the R^3 density sweep runs as ONE jitted ``lax.scan`` program whose sample
coordinates are generated on-device (only the params and the final float32
sigma grid cross the relay), then a host-side vectorized
marching-tetrahedra pass (``engine/geometry.py``) builds a watertight,
consistently wound mesh with vertex colors baked from the radiance field.

Works with both native ``.ntc`` checkpoints and the reference's pretrained
``.ckpt`` files:

  python extract_geometry.py --config configs/lego_lowres.yml \\
      --checkpoint /root/reference/pretrained/lego-lowres/checkpoint199999.ckpt \\
      --output lego.ply --resolution 256 --iso 50

  python extract_geometry.py --config ... --checkpoint ... \\
      --mode pointcloud --threshold 50 --max-points 500000 --output lego_pc.ply

Bounded (blender/synthetic) scenes only: LLFF forward-facing scenes have
no natural world-space box — pass an explicit --bbox if you know one.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from nerf_tpu.config import load_config, render_settings_from_config
from nerf_tpu.engine.checkpoint import load_models_and_params
from nerf_tpu.engine.geometry import (
    extract_mesh,
    extract_pointcloud,
    make_sigma_grid_fn,
    save_ply,
)


def main():
    from nerf_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # persistent XLA executable cache across CLI runs
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--output", type=str, required=True,
                        help="Output .ply path.")
    parser.add_argument("--mode", choices=["mesh", "pointcloud"],
                        default="mesh")
    parser.add_argument("--resolution", type=int, default=256,
                        help="Density-grid vertices per axis.")
    parser.add_argument(
        "--bbox", type=float, nargs=6, default=None,
        metavar=("X0", "Y0", "Z0", "X1", "Y1", "Z1"),
        help="World-space sampling box (default: [-1.5, 1.5]^3, the blender "
             "synthetic-scene convention).",
    )
    parser.add_argument("--iso", type=float, default=50.0,
                        help="Mesh isosurface sigma level (NeRF extract_mesh "
                             "convention: 50).")
    parser.add_argument("--threshold", type=float, default=None,
                        help="Point-cloud sigma threshold (default: --iso).")
    parser.add_argument("--max-points", type=int, default=1_000_000,
                        help="Subsample the point cloud to at most this many "
                             "points (0 = keep all).")
    parser.add_argument("--model", choices=["fine", "coarse"], default="fine",
                        help="Which network to query (fine falls back to "
                             "coarse when the checkpoint has no fine model).")
    parser.add_argument("--chunk", type=int, default=262_144,
                        help="Grid points per scan step (one batched MLP "
                             "evaluation).")
    parser.add_argument("--no-colors", action="store_true",
                        help="Skip baking vertex colors.")
    parser.add_argument("--no-normals", action="store_true",
                        help="Skip the autodiffed density-gradient vertex "
                             "normals (mesh mode).")
    parser.add_argument("--save-grid", type=str, default="",
                        help="Also save the raw sigma grid to this .npz.")
    parser.add_argument(
        "--precision", choices=["bfloat16", "float32"], default="float32",
    )
    parser.add_argument("--overrides", type=str, nargs="*", default=None)
    args = parser.parse_args()

    cfg = load_config(args.config, args.overrides)
    if cfg.dataset.type == "llff" and args.bbox is None:
        raise SystemExit(
            "LLFF scenes have no default world-space bounding box; pass an "
            "explicit --bbox X0 Y0 Z0 X1 Y1 Z1"
        )
    bbox = args.bbox if args.bbox is not None else [-1.5] * 3 + [1.5] * 3
    bbox_min, bbox_max = tuple(bbox[:3]), tuple(bbox[3:])
    if not all(hi > lo for lo, hi in zip(bbox_min, bbox_max)):
        raise SystemExit(f"degenerate --bbox: min {bbox_min} !< max {bbox_max}")

    model_coarse, model_fine, params_coarse, params_fine, _ = (
        load_models_and_params(args.checkpoint, cfg)
    )
    if args.model == "fine" and params_fine is not None:
        model, params = model_fine, params_fine
    else:
        model, params = model_coarse, params_coarse

    import dataclasses

    # Grid sampling happens in WORLD space regardless of how the scene was
    # trained to render, so NDC is irrelevant here — force it off (and feed
    # a dummy hwf so NDC-enabled LLFF configs can build settings at all).
    settings = dataclasses.replace(
        render_settings_from_config(
            cfg, "validation", hwf=(1, 1, 1.0)
        ).eval_variant(),
        compute_dtype=args.precision,
        use_ndc=False, height=0, width=0, focal_length=0.0,
    )

    t0 = time.time()
    import jax

    n_dev = len(jax.devices())
    if n_dev > 1:
        # Multi-device backend: shard the sweep's chunk axis over the data
        # mesh (embarrassingly parallel, numerically identical to serial).
        from nerf_tpu.parallel import make_mesh
        from nerf_tpu.parallel.geometry import make_parallel_sigma_grid_fn

        grid_fn = make_parallel_sigma_grid_fn(
            model, settings, args.resolution, bbox_min, bbox_max,
            make_mesh(), chunk=args.chunk,
        )
        print(f"sharding the grid sweep over {n_dev} devices", flush=True)
    else:
        grid_fn = make_sigma_grid_fn(
            model, settings, args.resolution, bbox_min, bbox_max, args.chunk
        )
    sigma_grid = np.asarray(grid_fn(params))
    n = args.resolution ** 3
    dt = time.time() - t0
    print(
        f"sigma grid {args.resolution}^3 = {n:,} points in {dt:.1f} s "
        f"({n / dt / 1e6:.2f}M pts/s incl. compile); "
        f"sigma max {sigma_grid.max():.1f}, "
        f"frac > iso: {(sigma_grid > args.iso).mean():.4f}",
        flush=True,
    )
    if args.save_grid:
        # float32, not float16: raw relu'd sigma is unbounded and trained
        # fields exceed the f16 range (65504) in dense regions — an inf in
        # a reloaded grid turns interpolation into NaN vertices.
        np.savez_compressed(
            args.save_grid, sigma=sigma_grid,
            bbox_min=bbox_min, bbox_max=bbox_max,
        )
        print(f"wrote {args.save_grid}", flush=True)

    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    if args.mode == "mesh":
        t0 = time.time()
        verts, faces, colors, normals = extract_mesh(
            model, params, settings, bbox_min, bbox_max, args.resolution,
            args.iso, args.chunk, with_colors=not args.no_colors,
            with_normals=not args.no_normals, sigma_grid=sigma_grid,
        )
        if verts.shape[0] == 0:
            raise SystemExit(
                f"no isosurface at sigma={args.iso} inside bbox {bbox_min}..."
                f"{bbox_max} (sigma max {sigma_grid.max():.2f}) — lower --iso "
                "or widen --bbox"
            )
        save_ply(args.output, verts, faces=faces, colors=colors,
                 normals=normals)
        print(
            f"mesh: {verts.shape[0]:,} vertices, {faces.shape[0]:,} faces "
            f"in {time.time() - t0:.1f} s -> {args.output}", flush=True,
        )
    else:
        threshold = args.iso if args.threshold is None else args.threshold
        pts, colors, sigmas = extract_pointcloud(
            model, params, settings, bbox_min, bbox_max, args.resolution,
            threshold, args.chunk, max_points=args.max_points,
            sigma_grid=sigma_grid,
        )
        if pts.shape[0] == 0:
            raise SystemExit(
                f"no points with sigma > {threshold} (max "
                f"{sigma_grid.max():.2f}) — lower --threshold"
            )
        save_ply(args.output, pts, colors=colors)
        print(
            f"point cloud: {pts.shape[0]:,} points "
            f"(sigma {sigmas.min():.1f}..{sigmas.max():.1f}) -> "
            f"{args.output}", flush=True,
        )


if __name__ == "__main__":
    main()
