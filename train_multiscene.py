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

Scene groups: blender scenes share one vmapped program; LLFF/NDC scenes
(--llff-dirs) form a SECOND vmapped program in the same process — NDC ray
warping, near/far = 0/1, and the encoding width are compile-time constants,
so the NDC/non-NDC split is structural (two compiled programs), but both
groups train interleaved from one invocation into one results table: the
literal all-7-pretrained-scenes-in-one-run workload.

Scenes default to N distinct procedural synthetic scenes (no downloads);
pass --blender-dirs (and optionally --llff-dirs) for real datasets.

Usage:
  python train_multiscene.py --num-scenes 7 --iters 2000 [--size 48]
  python train_multiscene.py --blender-dirs d1 d2 ... --llff-dirs fern_dir \
      --no-half-res --iters 200000 --num-coarse 64 --num-fine 64 --n-xyz 10
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
    llff_holdout_split,
    load_llff_data,
    make_synthetic_dataset,
)
from nerf_tpu.engine.checkpoint import save_checkpoint
from nerf_tpu.engine.renderer import RenderSettings
from nerf_tpu.engine.train import make_optimizer
from nerf_tpu.models import FlexibleNeRFModel
from nerf_tpu.parallel import DATA_AXIS, make_mesh, replicate_tree
from nerf_tpu.parallel.multiscene import (
    create_multiscene_state,
    make_multiscene_train_loop,
    make_parallel_multiscene_train_loop,
    shard_multiscene_stores,
)


class SceneGroup:
    """One vmapped training program over scenes sharing a static protocol
    (settings + model shape). Blender and LLFF/NDC scenes cannot share a
    program (NDC warping and near/far are compile-time constants), so each
    forms its own group; groups train interleaved in one process."""

    def __init__(self, tag, names, stores, settings, model, opt, batch,
                 mesh, seed):
        self.tag = tag
        self.names = names
        self.settings = settings
        self.model = model
        self.opt = opt
        self.batch = batch
        self.mesh = mesh
        self.loops = {}
        S = len(names)
        n_min = min(st[0].shape[0] for st in stores)
        if mesh is not None:
            # The ray axis shards over the mesh's DATA axis (not necessarily
            # every device on a multi-axis mesh).
            n_min -= n_min % mesh.shape[DATA_AXIS]
        ro = np.stack([st[0][:n_min] for st in stores])
        rd = np.stack([st[1][:n_min] for st in stores])
        tgt = np.stack([st[2][:n_min] for st in stores])
        self.state = create_multiscene_state(
            model, model, opt, jax.random.PRNGKey(seed), S
        )
        if mesh is not None:
            self.state = replicate_tree(mesh, self.state)
            # Host arrays go STRAIGHT to the sharded placement — a
            # jnp.asarray first would materialize each full (S, N, 3) store
            # on device 0 before resharding (transient 2x HBM).
            ro, rd, tgt = shard_multiscene_stores(mesh, ro, rd, tgt)
        else:
            ro, rd, tgt = jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(tgt)
        self.ro, self.rd, self.tgt = ro, rd, tgt
        self.metrics = None
        print(f"[{tag}] {S} scenes x {n_min:,} rays "
              f"({', '.join(names)})")

    def get_loop(self, k_steps):
        if k_steps not in self.loops:
            if self.mesh is not None:
                self.loops[k_steps] = make_parallel_multiscene_train_loop(
                    self.model, self.model, self.settings, self.opt,
                    self.mesh, self.batch, k_steps
                )
            else:
                self.loops[k_steps] = make_multiscene_train_loop(
                    self.model, self.model, self.settings, self.opt,
                    self.batch, k_steps
                )
        return self.loops[k_steps]

    def step(self, k_steps, key):
        self.state, self.metrics = self.get_loop(k_steps)(
            self.state, self.ro, self.rd, self.tgt, key
        )

    def export_checkpoints(self, save_dir, step):
        """One eval_nerf.py-compatible native checkpoint per scene: slice
        the vmapped scene axis off every param leaf."""
        losses = np.asarray(self.metrics.loss[-1])
        psnrs = np.asarray(self.metrics.psnr[-1])
        for s, name in enumerate(self.names):
            outdir = os.path.join(save_dir, name)
            os.makedirs(outdir, exist_ok=True)
            path = os.path.join(outdir, f"checkpoint{step:05d}.ntc")
            save_checkpoint(path, {
                "step": step,
                "params_coarse": jax.tree.map(
                    lambda x: x[s], self.state.params_coarse
                ),
                "params_fine": (
                    jax.tree.map(lambda x: x[s], self.state.params_fine)
                    if self.state.params_fine is not None else None
                ),
                "loss": float(losses[s]),
                "psnr": float(psnrs[s]),
            })
        print(f"[{self.tag}] saved {len(self.names)} checkpoints at iter "
              f"{step} under {save_dir}")


def main():
    from nerf_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # persistent XLA executable cache across CLI runs
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
        "--llff-dirs", nargs="*", default=None,
        help="Optional LLFF scene dirs (NDC protocol: near/far 0/1, no white "
             "background, --llff-n-xyz encodings). Forms a second compiled "
             "program trained interleaved with the blender/synthetic group.",
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
    # LLFF-group protocol knobs (defaults = the fern-lowres pretrained
    # protocol: configs/fern_lowres.yml — 6/4 encodings, sigma-noise 1.0,
    # distilled sets at factor 1).
    parser.add_argument("--llff-factor", type=int, default=1)
    parser.add_argument("--llff-n-xyz", type=int, default=6)
    parser.add_argument("--llff-noise-std", type=float, default=1.0)
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
    if args.iters < 1:
        raise SystemExit("--iters must be >= 1")

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
        print(f"data-parallel over {num_devices} devices, "
              f"{args.batch} rays/scene/step")
    else:
        mesh = None

    opt = make_optimizer("adam", 5e-3, 250.0, 0.1)
    groups = []

    # --- blender / synthetic group -------------------------------------
    stores, names = [], []
    if args.blender_dirs:
        for d in args.blender_dirs:
            images, poses, _, hwf, i_split = load_blender_data(
                d, half_res=args.half_res
            )
            images = composite_white_background(images)
            tr = i_split[0]
            stores.append(
                build_ray_store(
                    images[tr], poses[tr, :3, :4],
                    int(hwf[0]), int(hwf[1]), float(hwf[2])
                )
            )
        names = [os.path.basename(os.path.normpath(d))
                 for d in args.blender_dirs]
    elif not args.llff_dirs:
        S = args.num_scenes
        print(f"building {S} synthetic scenes ({args.views} views @ {args.size}px)...")
        for s in range(S):
            ds = make_synthetic_dataset(
                num_views=args.views, height=args.size, width=args.size,
                phase=0.9 * s, sphere_radius=0.6 + 0.05 * s, seed=100 + s,
            )
            h, w, focal = ds.hwf
            stores.append(build_ray_store(ds.images, ds.poses, h, w, focal))
        names = [f"scene{s}" for s in range(S)]
    if stores:
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
        groups.append(SceneGroup(
            "blender", names, stores, settings, model, opt, args.batch,
            mesh, seed=0,
        ))

    # --- LLFF / NDC group ----------------------------------------------
    if args.llff_dirs:
        stores, names, hwf0 = [], [], None
        for d in args.llff_dirs:
            images, poses, _bds, _rp, i_test = load_llff_data(
                d, factor=args.llff_factor
            )
            hwf = poses[0, :3, -1]
            poses = poses[:, :3, :4]
            # Reference llffhold=8 split (shared llff_holdout_split).
            i_train, _i_hold = llff_holdout_split(images.shape[0])
            h, w, focal = int(hwf[0]), int(hwf[1]), float(hwf[2])
            if hwf0 is None:
                hwf0 = (h, w, focal)
            elif hwf0 != (h, w, focal):
                raise SystemExit(
                    f"--llff-dirs intrinsics differ: {hwf0} vs {(h, w, focal)} "
                    f"({d}) — NDC settings are compile-time constants; run "
                    "mismatched scenes separately"
                )
            stores.append(
                build_ray_store(
                    images[i_train, ..., :3], poses[i_train], h, w, focal
                )
            )
            names.append(os.path.basename(os.path.normpath(d)))
        h, w, focal = hwf0
        llff_settings = RenderSettings(
            num_coarse=args.num_coarse, num_fine=args.num_fine, perturb=True,
            radiance_field_noise_std=args.llff_noise_std,
            white_background=False, near=0.0, far=1.0,
            use_ndc=True, height=h, width=w, focal_length=focal,
            num_encoding_fn_xyz=args.llff_n_xyz,
            num_encoding_fn_dir=args.n_dir,
            compute_dtype=args.compute_dtype,
        )
        llff_model = FlexibleNeRFModel(
            num_encoding_fn_xyz=args.llff_n_xyz,
            num_encoding_fn_dir=args.n_dir,
        )
        groups.append(SceneGroup(
            "llff", names, stores, llff_settings, llff_model, opt,
            args.batch, mesh, seed=10,
        ))

    if not groups:
        raise SystemExit("no scenes: pass --blender-dirs and/or --llff-dirs")
    all_names = [n for g in groups for n in g.names]
    if len(set(all_names)) != len(all_names):
        # a/lego and b/lego would silently overwrite each other's exports
        raise SystemExit(f"duplicate scene names across groups: {all_names}")
    S_total = sum(len(g.names) for g in groups)
    print(f"{S_total} scenes in {len(groups)} compiled program(s) "
          f"on {jax.default_backend()}")

    steps_per_call = max(1, min(args.print_every, args.iters))
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    t_chunk = t0
    i = 0
    while i < args.iters:
        k_steps = min(steps_per_call, args.iters - i)
        for g in groups:
            key, k = jax.random.split(key)
            g.step(k_steps, k)
        prev, i = i, i + k_steps
        parts = []
        for g in groups:
            psnrs = np.asarray(g.metrics.psnr[-1])  # last step of the call
            parts.append(
                f"{g.tag} [{' '.join(f'{p:.1f}' for p in psnrs)}]"
            )
        now = time.time()
        print(
            f"iter {i - 1:5d} psnr {' | '.join(parts)} "
            f"rays/s {S_total * args.batch * k_steps / (now - t_chunk):,.0f}"
            f" (cum {S_total * args.batch * i / (now - t0):,.0f})",
            flush=True,
        )
        t_chunk = now
        if (
            args.save_dir and args.save_every and i < args.iters
            and i // args.save_every > prev // args.save_every
        ):
            for g in groups:
                g.export_checkpoints(args.save_dir, i)
    dt = time.time() - t0
    total_rays = S_total * args.batch * args.iters
    print(
        f"trained {S_total} scenes x {args.iters} iters in {dt:.1f}s = "
        f"{total_rays / dt:,.0f} aggregate rays/s"
    )

    if args.save_dir:
        for g in groups:
            g.export_checkpoints(args.save_dir, args.iters)


if __name__ == "__main__":
    main()
