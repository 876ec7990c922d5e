#!/usr/bin/env python3
"""Tiny-NeRF demo: the minimal end-to-end slice, fully self-contained.

Behavioral parity target (reference: krrish94/nerf-pytorch tiny_nerf.py:12-350):
single coarse model, uniform depth sampling, no view directions, periodic
held-out render with a PSNR curve. The reference needs a downloaded
tiny_nerf_data.npz; we default to the procedural synthetic scene
(nerf_tpu.data.synthetic) so the demo runs anywhere, and accept an .npz of
{images, poses, focal} for the original data.

The whole optimization step is one jit-compiled program; on this demo config
a TPU chip runs it at millions of rays/sec.

Usage:
  python tiny_nerf.py [--npz tiny_nerf_data.npz] [--iters 1000] [--size 64]
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.data import flatten_rays, make_synthetic_dataset
from nerf_tpu.data.synthetic import SyntheticDataset
from nerf_tpu.engine.renderer import RenderSettings, make_image_render_fn
from nerf_tpu.engine.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
    sample_ray_batch,
)
from nerf_tpu.models import VeryTinyNeRFModel
from nerf_tpu.ops import get_ray_bundle, img2mse, mse2psnr
from nerf_tpu.utils import MetricWriter


def load_npz_dataset(path: str) -> SyntheticDataset:
    """Adapt the original tiny_nerf_data.npz layout (tiny_nerf.py:197-209)."""
    data = np.load(path)
    images = data["images"].astype(np.float32)
    poses = data["poses"].astype(np.float32)
    focal = float(data["focal"])
    h, w = images.shape[1:3]
    return SyntheticDataset(images, poses, (h, w, focal), 2.0, 6.0)


def main():
    from nerf_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # persistent XLA executable cache across CLI runs
    parser = argparse.ArgumentParser()
    parser.add_argument("--npz", type=str, default="", help="tiny_nerf_data.npz path")
    parser.add_argument("--iters", type=int, default=1000)
    # (validated below: --iters and --display-every must be positive)
    parser.add_argument("--size", type=int, default=64, help="synthetic image size")
    parser.add_argument("--logdir", type=str, default="logs/tiny_nerf")
    parser.add_argument("--display-every", type=int, default=100)
    args = parser.parse_args()
    if args.iters < 1 or args.display_every < 1:
        parser.error("--iters and --display-every must be >= 1")

    if args.npz:
        dataset = load_npz_dataset(args.npz)
    else:
        dataset = make_synthetic_dataset(
            num_views=12, height=args.size, width=args.size
        )
    h, w, focal = dataset.hwf
    n_heldout = max(1, len(dataset.images) - 1)
    train_ds = SyntheticDataset(
        dataset.images[:n_heldout], dataset.poses[:n_heldout],
        dataset.hwf, dataset.near, dataset.far,
    )
    test_img = jnp.asarray(dataset.images[-1][..., :3])
    test_pose = jnp.asarray(dataset.poses[-1][:3, :4])

    ro, rd, targets = map(jnp.asarray, flatten_rays(train_ds))
    print(f"tiny-nerf: {ro.shape[0]:,} rays, {h}x{w}, backend {jax.default_backend()}")

    # Coarse-only, no viewdirs, uniform sampling (tiny_nerf.py:111-160 analog).
    settings = RenderSettings(
        num_coarse=32, num_fine=0, perturb=False, use_viewdirs=False,
        white_background=False, near=dataset.near, far=dataset.far,
        num_encoding_fn_xyz=6, include_input_xyz=True, chunksize=h * w,
    )
    model = VeryTinyNeRFModel(num_encoding_functions=6, use_viewdirs=False)
    optimizer = make_optimizer("adam", 5e-3)
    state = create_train_state(model, None, optimizer, jax.random.PRNGKey(0))
    step = make_train_step(model, None, settings, optimizer)
    render_image = make_image_render_fn(model, None, settings)

    writer = MetricWriter(args.logdir)
    key = jax.random.PRNGKey(1)
    psnrs = []
    t0 = time.time()
    for i in range(args.iters):
        key, k_s, k_t = jax.random.split(key, 3)
        batch = sample_ray_batch(k_s, ro, rd, targets, 4096)
        state, metrics = step(state, *batch, k_t)
        if i % args.display_every == 0 or i == args.iters - 1:
            v_ro, v_rd = get_ray_bundle(h, w, focal, test_pose)
            maps = render_image(state.params_coarse, None, v_ro, v_rd)
            val_psnr = float(mse2psnr(img2mse(maps["rgb_coarse"], test_img)))
            psnrs.append((i, val_psnr))
            writer.scalar("tiny/val_psnr", val_psnr, i)
            writer.image("tiny/render", np.asarray(maps["rgb_coarse"]), i)
            print(f"iter {i:5d} train_psnr {float(metrics.psnr):6.2f} "
                  f"val_psnr {val_psnr:6.2f}")
    dt = time.time() - t0
    print(f"{args.iters} iters in {dt:.1f}s = {args.iters * 4096 / dt:,.0f} rays/s")

    # PSNR curve as a simple PNG (matplotlib-free).
    curve = np.full((128, 256, 3), 255, np.uint8)
    if len(psnrs) > 1:
        xs = np.array([p[0] for p in psnrs], np.float64)
        ys = np.array([p[1] for p in psnrs], np.float64)
        xi = ((xs - xs.min()) / max(xs.max() - xs.min(), 1) * 255).astype(int)
        yi = 127 - ((ys - ys.min()) / max(ys.max() - ys.min(), 1e-6) * 127).astype(int)
        curve[yi.clip(0, 127), xi.clip(0, 255)] = [200, 30, 30]
    import imageio.v2 as imageio

    os.makedirs(args.logdir, exist_ok=True)
    imageio.imwrite(os.path.join(args.logdir, "psnr_curve.png"), curve)
    writer.close()
    print(f"final val PSNR: {psnrs[-1][1]:.2f} dB; logs in {args.logdir}")


if __name__ == "__main__":
    main()
