#!/usr/bin/env python3
"""Dependency-free turntable preview of a PLY from extract_geometry.py.

Splat-renders the vertices (z-sorted 2x2 points, Lambert-shaded with the
baked density-gradient normals when present) from an orbiting camera and
writes a GIF — a quick visual check of exported geometry without MeshLab/
Blender, and the generator of ``docs/media/lego_mesh_turntable.gif``.
Pure numpy; runs anywhere (force-CPU, never claims the TPU).

  python tools/render_ply_turntable.py /tmp/lego_mesh128.ply \
      --out docs/media/lego_mesh_turntable.gif --size 256 --frames 28
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_tpu.engine.geometry import load_ply  # noqa: E402


def _orbit_camera(center, radius, azimuth_deg, elevation_deg):
    az = np.deg2rad(azimuth_deg)
    el = np.deg2rad(elevation_deg)
    eye = center + radius * np.array(
        [np.cos(el) * np.sin(az), np.cos(el) * np.cos(az), np.sin(el)]
    )
    fwd = center - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, 0.0, 1.0])
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)
    return eye, np.stack([right, down, fwd])  # rows: camera axes


def render_frame(verts, colors, normals, size, center, radius, az, el=30.0):
    eye, rot = _orbit_camera(center, radius, az, el)
    cam = (verts - eye) @ rot.T  # (N, 3): x right, y down, z forward
    z = cam[:, 2]
    vis = z > 1e-6
    focal = 1.2 * size
    u = (cam[:, 0] / z) * focal + size / 2
    v = (cam[:, 1] / z) * focal + size / 2
    vis &= (u >= 0) & (u < size - 1) & (v >= 0) & (v < size - 1)

    shade = np.ones(verts.shape[0], dtype=np.float32)
    if normals is not None:
        light = -rot[2] + np.array([0.3, 0.0, 0.6])
        light = light / np.linalg.norm(light)
        lam = np.clip((normals * light).sum(axis=1), 0.0, 1.0)
        shade = 0.35 + 0.65 * lam
    rgb = (colors.astype(np.float32) if colors is not None
           else np.full((verts.shape[0], 3), 200.0))
    rgb = np.clip(rgb * shade[:, None], 0, 255).astype(np.uint8)

    # Painter's algorithm: draw far-to-near so near splats win.
    order = np.argsort(-z[vis])
    ui = u[vis].astype(np.int32)[order]
    vi = v[vis].astype(np.int32)[order]
    ci = rgb[vis][order]
    img = np.full((size, size, 3), 255, dtype=np.uint8)
    for du in (0, 1):
        for dv in (0, 1):
            img[vi + dv, ui + du] = ci
    return img


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("ply", type=str)
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--frames", type=int, default=28)
    parser.add_argument("--elevation", type=float, default=30.0)
    parser.add_argument("--fps", type=float, default=10.0)
    args = parser.parse_args()

    verts, _, colors, normals = load_ply(args.ply)
    center = (verts.min(0) + verts.max(0)) / 2
    radius = 2.4 * np.linalg.norm(verts.max(0) - verts.min(0)) / 2
    frames = [
        render_frame(
            verts, colors, normals, args.size, center, radius,
            az, args.elevation,
        )
        for az in np.linspace(0, 360, args.frames, endpoint=False)
    ]
    import imageio.v2 as imageio

    imageio.mimsave(args.out, frames, duration=1.0 / args.fps, loop=0)
    print(f"{args.out}: {len(frames)} frames {args.size}x{args.size} from "
          f"{verts.shape[0]:,} vertices", flush=True)


if __name__ == "__main__":
    main()
