#!/usr/bin/env python3
"""Train N NeRF scenes simultaneously as ONE vmapped TPU workload.

BASELINE.json config 5 ("multi-scene batch: train all 7 lowres scenes as one
vmapped TPU workload"). The reference can only run scenes as separate
processes; here the scene axis is a vmapped batch dimension over parameters,
optimizer state, and ray batches. With small MLPs (the synthetic demo
protocol) batching fills the MXU far better than any single scene can
(3.3x aggregate); at the full lowres-blender protocol the win is
operational — one process, one compile, simultaneous checkpoints at
aggregate-throughput rough-parity (docs/PARITY.md roofline notes).

Scenes default to N distinct procedural synthetic scenes (no downloads);
pass --blender-dirs to train real blender scenes instead.

Usage:
  python train_multiscene.py --num-scenes 7 --iters 2000 [--size 48]
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.data import (
    build_ray_store,
    composite_white_background,
    load_blender_data,
    make_synthetic_dataset,
)
from nerf_tpu.engine.checkpoint import save_checkpoint
from nerf_tpu.engine.renderer import RenderSettings
from nerf_tpu.engine.train import make_optimizer
from nerf_tpu.models import FlexibleNeRFModel
from nerf_tpu.parallel import make_mesh, replicate_tree
from nerf_tpu.parallel.multiscene import (
    create_multiscene_state,
    make_multiscene_train_loop,
    make_parallel_multiscene_train_loop,
    shard_multiscene_stores,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-scenes", type=int, default=7)
    parser.add_argument("--iters", type=int, default=2000)
    parser.add_argument("--size", type=int, default=48)
    parser.add_argument("--views", type=int, default=8)
    parser.add_argument("--batch", type=int, default=1024, help="rays per scene per step")
    parser.add_argument("--print-every", type=int, default=200)
    parser.add_argument(
        "--blender-dirs", nargs="*", default=None,
        help="Optional blender scene dirs (one per scene) instead of synthetic.",
    )
    parser.add_argument(
        "--half-res", action=argparse.BooleanOptionalAction, default=True,
        help="Half-resolution blender loading (--no-half-res for datasets "
             "already at the target resolution, e.g. distilled sets).",
    )
    # Sampling/model protocol (defaults = the quick synthetic demo; the
    # reference lowres-blender protocol is --num-coarse 64 --num-fine 64
    # --n-xyz 10 — pretrained/*/config.yml, lego_lowres.yml).
    parser.add_argument("--num-coarse", type=int, default=32)
    parser.add_argument("--num-fine", type=int, default=32)
    parser.add_argument("--n-xyz", type=int, default=6)
    parser.add_argument("--n-dir", type=int, default=4)
    parser.add_argument("--noise-std", type=float, default=0.2)
    parser.add_argument("--compute-dtype", choices=["float32", "bfloat16"],
                        default="float32")
    parser.add_argument(
        "--save-dir", default=None,
        help="If set, export one native .ntc checkpoint per scene at the end "
             "(eval_nerf.py-compatible; named after the scene dir, or "
             "scene{i} for synthetic scenes).",
    )
    parser.add_argument(
        "--save-every", type=int, default=0,
        help="Also export per-scene checkpoints every N iters (long runs "
             "survive interruption); 0 = only at the end.",
    )
    args = parser.parse_args()

    S = args.num_scenes
    stores = []
    if args.blender_dirs:
        dirs = args.blender_dirs
        S = len(dirs)
        for d in dirs:
            images, poses, _, hwf, i_split = load_blender_data(
                d, half_res=args.half_res
            )
            images = composite_white_background(images)
            tr = i_split[0]
            stores.append(
                build_ray_store(
                    images[tr], poses[tr, :3, :4], int(hwf[0]), int(hwf[1]), float(hwf[2])
                )
            )
    else:
        print(f"building {S} synthetic scenes ({args.views} views @ {args.size}px)...")
        for s in range(S):
            ds = make_synthetic_dataset(
                num_views=args.views, height=args.size, width=args.size,
                phase=0.9 * s, sphere_radius=0.6 + 0.05 * s, seed=100 + s,
            )
            h, w, focal = ds.hwf
            stores.append(build_ray_store(ds.images, ds.poses, h, w, focal))

    # Equalize store sizes (vmap needs a rectangular (S, N, 3) array).
    n_min = min(st[0].shape[0] for st in stores)
    ro = jnp.asarray(np.stack([st[0][:n_min] for st in stores]))
    rd = jnp.asarray(np.stack([st[1][:n_min] for st in stores]))
    tgt = jnp.asarray(np.stack([st[2][:n_min] for st in stores]))
    print(f"{S} scenes x {n_min:,} rays on {jax.default_backend()}")

    settings = RenderSettings(
        num_coarse=args.num_coarse, num_fine=args.num_fine, perturb=True,
        radiance_field_noise_std=args.noise_std,
        white_background=True, near=2.0, far=6.0,
        num_encoding_fn_xyz=args.n_xyz, num_encoding_fn_dir=args.n_dir,
        compute_dtype=args.compute_dtype,
    )
    model = FlexibleNeRFModel(
        num_encoding_fn_xyz=args.n_xyz, num_encoding_fn_dir=args.n_dir
    )
    opt = make_optimizer("adam", 5e-3, 250.0, 0.1)
    state = create_multiscene_state(model, model, opt, jax.random.PRNGKey(0), S)
    steps_per_call = max(1, min(args.print_every, args.iters))
    loops = {}

    # Multiscene x DP: with >1 device, scenes stay vmapped inside and the
    # per-scene ray batch shards over the mesh's data axis (one pmean per
    # step over the (S,)-batched gradient pytree).
    num_devices = len(jax.devices())
    if num_devices > 1:
        if args.batch % num_devices != 0:
            raise SystemExit(
                f"--batch {args.batch} must be divisible by the "
                f"{num_devices}-device mesh"
            )
        mesh = make_mesh()
        state = replicate_tree(mesh, state)
        n_keep = n_min - n_min % num_devices
        ro, rd, tgt = shard_multiscene_stores(
            mesh, ro[:, :n_keep], rd[:, :n_keep], tgt[:, :n_keep]
        )
        print(f"data-parallel over {num_devices} devices, "
              f"{args.batch} rays/scene/step")
    else:
        mesh = None

    def get_loop(k_steps):
        if k_steps not in loops:
            if mesh is not None:
                loops[k_steps] = make_parallel_multiscene_train_loop(
                    model, model, settings, opt, mesh, args.batch, k_steps
                )
            else:
                loops[k_steps] = make_multiscene_train_loop(
                    model, model, settings, opt, args.batch, k_steps
                )
        return loops[k_steps]

    if args.iters < 1:
        raise SystemExit("--iters must be >= 1")
    names = (
        [os.path.basename(os.path.normpath(d)) for d in args.blender_dirs]
        if args.blender_dirs else [f"scene{s}" for s in range(S)]
    )
    if len(set(names)) != len(names):
        # a/lego and b/lego would silently overwrite each other's exports
        raise SystemExit(f"duplicate scene names in --blender-dirs: {names}")

    def export_checkpoints(state, metrics, step):
        # One eval_nerf.py-compatible native checkpoint per scene: slice the
        # vmapped scene axis off every param leaf.
        losses = np.asarray(metrics.loss[-1])
        psnrs = np.asarray(metrics.psnr[-1])
        for s, name in enumerate(names):
            outdir = os.path.join(args.save_dir, name)
            os.makedirs(outdir, exist_ok=True)
            path = os.path.join(outdir, f"checkpoint{step:05d}.ntc")
            save_checkpoint(path, {
                "step": step,
                "params_coarse": jax.tree.map(
                    lambda x: x[s], state.params_coarse
                ),
                "params_fine": (
                    jax.tree.map(lambda x: x[s], state.params_fine)
                    if state.params_fine is not None else None
                ),
                "loss": float(losses[s]),
                "psnr": float(psnrs[s]),
            })
        print(f"saved {S} checkpoints at iter {step} under {args.save_dir}")

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    i = 0
    while i < args.iters:
        k_steps = min(steps_per_call, args.iters - i)
        key, k = jax.random.split(key)
        state, metrics = get_loop(k_steps)(state, ro, rd, tgt, k)
        psnrs = np.asarray(metrics.psnr[-1])  # last step of the call
        prev, i = i, i + k_steps
        print(
            f"iter {i - 1:5d} mean psnr {psnrs.mean():6.2f} "
            f"per-scene [{' '.join(f'{p:.1f}' for p in psnrs)}] "
            f"rays/s {S * args.batch * i / (time.time() - t0):,.0f}"
        )
        if (
            args.save_dir and args.save_every and i < args.iters
            and i // args.save_every > prev // args.save_every
        ):
            export_checkpoints(state, metrics, i)
    dt = time.time() - t0
    total_rays = S * args.batch * args.iters
    print(
        f"trained {S} scenes x {args.iters} iters in {dt:.1f}s = "
        f"{total_rays / dt:,.0f} aggregate rays/s"
    )

    if args.save_dir:
        export_checkpoints(state, metrics, args.iters)


if __name__ == "__main__":
    main()
