#!/usr/bin/env python3
"""Train a NeRF (TPU-native CLI).

Behavioral parity target (reference: krrish94/nerf-pytorch train_nerf.py:18-390):
same config schema, dataset handling, coarse+fine optimization, metric tags,
and checkpoint cadence — redesigned for TPU:

  * the WHOLE training step (on-device ray-batch gather -> hierarchical
    render -> loss -> backward -> Adam + LR decay) is one jit-compiled
    program; the host loop only feeds PRNG keys and reads metrics
    (the reference does host-side numpy ray selection + per-iter .to(device)
    transfers, train_nerf.py:210-226)
  * all training rays live in HBM as one flat ray store (data.rays_store)
  * multi-device: with >1 device the step runs data-parallel over an ICI
    mesh via shard_map (nerf_tpu.parallel) — the reference is single-GPU only
  * validation renders full images with a chunked lax.map pipeline

Usage:
  python train_nerf.py --config configs/lego_lowres.yml [--load-checkpoint ckpt]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.config import (
    load_config,
    model_from_config,
    optimizer_from_config,
    render_settings_from_config,
)
from nerf_tpu.data import (
    build_ray_store,
    composite_white_background,
    flatten_rays,
    is_reference_cache_dir,
    load_blender_data,
    load_llff_data,
    load_ray_cache,
    load_reference_cache_dir,
    make_synthetic_dataset,
    shuffle_ray_store,
)
from nerf_tpu.engine.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from nerf_tpu.engine.renderer import make_image_render_fn
from nerf_tpu.engine.train import (
    TrainState,
    create_train_state,
    make_train_loop,
)
from nerf_tpu.ops import get_ray_bundle, img2mse, mse2psnr
from nerf_tpu.parallel import (
    is_primary,
    make_mesh,
    maybe_initialize_distributed,
    pad_to_devices,
    replicate_tree,
    shard_batch,
)
from nerf_tpu.parallel.dp import make_parallel_train_loop
from nerf_tpu.utils import MetricWriter, RateMeter


def load_dataset(cfg):
    """Load images/poses per cfg.dataset; returns a dict of host arrays.

    Mirrors reference train_nerf.py:46-89 (cachedir probe, blender/llff
    branches, white-background compositing at load, llffhold split).
    """
    ds = cfg.dataset
    if getattr(ds, "cachedir", None):
        cache_path = ds.cachedir
        if os.path.isdir(cache_path):
            if is_reference_cache_dir(cache_path):
                # Reference-format cache (train/*.data torch.save files,
                # reference cache_dataset.py:73-115) — ingest torch-free.
                ro, rd, targets, meta, extras = load_reference_cache_dir(
                    cache_path
                )
                return {
                    "mode": "cached",
                    "rays": (ro, rd, targets),
                    "hwf": (meta["height"], meta["width"], meta["focal"]),
                    "near": ds.near,
                    "far": ds.far,
                    "val_images": None,
                    "val_poses": None,
                }
            for name in ("rays.npz", "rays.nrc"):
                cand = os.path.join(cache_path, name)
                if os.path.exists(cand):
                    cache_path = cand
                    break
        if cache_path.endswith(".nrc"):
            from nerf_tpu import native

            ro, rd, targets, meta = native.load_ray_cache_native(cache_path)
            extras = {}
        else:
            ro, rd, targets, meta, extras = load_ray_cache(cache_path)
        return {
            "mode": "cached",
            "rays": (ro, rd, targets),
            "hwf": (meta["height"], meta["width"], meta["focal"]),
            "near": meta.get("near", ds.near),
            "far": meta.get("far", ds.far),
            "val_images": extras.get("val_images"),
            "val_poses": extras.get("val_poses"),
        }

    if ds.type == "blender":
        images, poses, render_poses, hwf, i_split = load_blender_data(
            ds.basedir, half_res=ds.half_res, testskip=ds.testskip
        )
        i_train, i_val, _ = i_split
        # White-background compositing at load, gated like the reference
        # (train_nerf.py:64-66: only when cfg.nerf.train.white_background);
        # otherwise drop alpha so targets stay consistent with the renderer.
        if cfg.nerf.train.white_background:
            images = composite_white_background(images)
        else:
            images = images[..., :3]
        h, w, focal = int(hwf[0]), int(hwf[1]), float(hwf[2])
        return {
            "mode": "live",
            "images": images,
            "poses": poses[:, :3, :4],
            "i_train": i_train,
            "i_val": i_val,
            "hwf": (h, w, focal),
            "near": ds.near,
            "far": ds.far,
        }

    if ds.type == "llff":
        images, poses, bds, render_poses, i_test = load_llff_data(
            ds.basedir,
            factor=getattr(ds, "downsample_factor", 8),
            spherify=bool(getattr(ds, "spherify", False)),
            path_zflat=bool(getattr(ds, "path_zflat", False)),
        )
        hwf = poses[0, :3, -1]
        poses = poses[:, :3, :4]
        llffhold = getattr(ds, "llffhold", 8)
        if llffhold > 0:
            i_test = np.arange(images.shape[0])[::llffhold]
        else:
            i_test = np.array([i_test])
        i_val = i_test
        i_train = np.array(
            [i for i in np.arange(images.shape[0]) if i not in i_test and i not in i_val]
        )
        return {
            "mode": "live",
            "images": images,
            "poses": poses,
            "i_train": i_train,
            "i_val": i_val,
            "hwf": (int(hwf[0]), int(hwf[1]), float(hwf[2])),
            "near": ds.near,
            "far": ds.far,
        }

    if ds.type == "synthetic":
        # Procedural scene (no downloads needed) — see nerf_tpu.data.synthetic.
        n_views = getattr(ds, "num_views", 20)
        size = getattr(ds, "image_size", 64)
        dataset = make_synthetic_dataset(num_views=n_views, height=size, width=size)
        ro, rd, targets = flatten_rays(dataset)
        return {
            "mode": "cached",
            "rays": (ro, rd, targets),
            "hwf": dataset.hwf,
            "near": dataset.near,
            "far": dataset.far,
            "val_images": dataset.images[:2],
            "val_poses": dataset.poses[:2],
        }

    raise ValueError(f"Unknown dataset type {ds.type!r}")


def main():
    from nerf_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # persistent XLA executable cache across CLI runs
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True, help="Path to YAML config.")
    parser.add_argument(
        "--load-checkpoint", type=str, default="", help="Checkpoint to resume from."
    )
    parser.add_argument(
        "--overrides", type=str, nargs="*", default=None,
        help="Dotted-key value pairs, e.g. optimizer.lr 1e-3",
    )
    parser.add_argument(
        "--tighten-aabb", type=float, default=None, metavar="TAU",
        help="Empty-space acceleration for CONTINUED training (requires a "
             "checkpoint to resume from — the box comes from the trained "
             "field): sweep the restored density field once, bound the "
             "sigma > TAU region, and tighten every ray's sample interval "
             "to its crossing of that box (train AND validation). The "
             "2-phase fast-training recipe: train a warmup normally, then "
             "resume with --tighten-aabb 2.0 and halved sample counts "
             "(--overrides nerf.train.num_coarse 32 nerf.train.num_fine 32) "
             "for ~2x the rays/s at equal quality on object-centric scenes. "
             "Blender scenes only (NDC is incompatible).",
    )
    parser.add_argument(
        "--aabb-sweep-bounds", type=float, nargs=6, default=None,
        metavar=("X0", "Y0", "Z0", "X1", "Y1", "Z1"),
        help="Density-sweep cube for --tighten-aabb (default (-1.5, 1.5)^3, "
             "which covers the blender scenes). The sweep warns if the "
             "occupied region touches these bounds (clipped geometry).",
    )
    args = parser.parse_args()

    # Multi-host: join the cluster BEFORE any backend init so jax.devices()
    # is the global device list (no-op on single host). All processes run the
    # identical program; file writes are gated on process 0 below.
    if maybe_initialize_distributed():
        print(
            f"distributed: process {jax.process_index()}/{jax.process_count()}, "
            f"{jax.local_device_count()} local / {jax.device_count()} global devices"
        )

    cfg = load_config(args.config, args.overrides)
    key = jax.random.PRNGKey(int(cfg.experiment.randomseed))

    data = load_dataset(cfg)
    h, w, focal = data["hwf"]
    if cfg.is_frozen():
        cfg.defrost()
    # Cached LLFF sets record metric scene bounds, but NDC rendering samples
    # in NDC depth [0, 1] — keep the config's near/far when NDC is on.
    if cfg.dataset.no_ndc:
        cfg.dataset.near = float(data["near"])
        cfg.dataset.far = float(data["far"])

    # Flatten training views into the device-resident ray store.
    if data["mode"] == "cached":
        ro_store, rd_store, target_store = data["rays"]
        val_images, val_poses = data.get("val_images"), data.get("val_poses")
    else:
        tr = data["i_train"]
        ro_store, rd_store, target_store = build_ray_store(
            data["images"][tr], data["poses"][tr], h, w, focal
        )
        val_images = data["images"][data["i_val"][:1]]
        val_poses = data["poses"][data["i_val"][:1]]
    ray_sampling = str(getattr(cfg.nerf.train, "ray_sampling", "gather"))
    if ray_sampling == "sliced":
        # Sliced sampling reads contiguous windows — valid only on a
        # shuffled store (stores are built image-ordered). One host-side
        # permutation, seeded for resume determinism.
        ro_store, rd_store, target_store = shuffle_ray_store(
            np.asarray(ro_store), np.asarray(rd_store),
            np.asarray(target_store), seed=int(cfg.experiment.randomseed),
        )
    ro_store, rd_store, target_store = (
        jnp.asarray(ro_store), jnp.asarray(rd_store), jnp.asarray(target_store)
    )
    print(
        f"ray store: {ro_store.shape[0]:,} rays on {jax.default_backend()} "
        f"({ray_sampling} sampling)"
    )

    settings = render_settings_from_config(cfg, "train", hwf=(h, w, focal))
    val_settings = render_settings_from_config(cfg, "validation", hwf=(h, w, focal))
    # Resuming from a reference .ckpt: those checkpoints hold default-shaped
    # 4x128 models regardless of what any config claims (SURVEY §5 quirk 1),
    # so the models must be built reference-shaped or the restored params
    # would crash/mis-train under config-claimed shapes.
    if args.load_checkpoint and not os.path.exists(args.load_checkpoint):
        # Fail fast: a typo'd path would otherwise silently train
        # reference-shaped models from scratch (the resume branch below is
        # guarded by os.path.exists).
        raise SystemExit(
            f"--load-checkpoint {args.load_checkpoint!r} does not exist"
        )
    reference_resume = args.load_checkpoint.endswith(".ckpt")
    model_coarse = model_from_config(
        cfg.models.coarse, reference_compat_shapes=reference_resume
    )
    model_fine = (
        model_from_config(cfg.models.fine, reference_compat_shapes=reference_resume)
        if "fine" in cfg.models else None
    )
    optimizer = optimizer_from_config(cfg)

    key, k_init = jax.random.split(key)
    state = create_train_state(model_coarse, model_fine, optimizer, k_init)
    start_iter = 0

    logdir = os.path.join(cfg.experiment.logdir, cfg.experiment.id)
    # Process-0-gated writes: on a multi-host cluster every process trains
    # the same replicated state; only the primary touches the filesystem.
    primary = is_primary()
    if primary:
        os.makedirs(logdir, exist_ok=True)
        with open(os.path.join(logdir, "config.yml"), "w") as f:
            f.write(cfg.dump())
    writer = MetricWriter(logdir) if primary else None
    rate = RateMeter()

    ckpt_path = args.load_checkpoint or latest_checkpoint(logdir)
    if ckpt_path and os.path.exists(ckpt_path):
        if ckpt_path.endswith(".ckpt"):
            # Direct resume from a reference-format checkpoint: weights +
            # step restore; Adam restarts fresh via the weights-only path
            # below. The models were built reference_compat_shapes above.
            from nerf_tpu.engine.checkpoint import load_reference_checkpoint

            restored = load_reference_checkpoint(ckpt_path)
        else:
            restored = load_checkpoint(ckpt_path)
        template = {
            "step": state.step,
            "params_coarse": state.params_coarse,
            "params_fine": state.params_fine,
            "opt_state": state.opt_state,
        }
        restored_opt_leaves = [
            jnp.asarray(x) for x in jax.tree.leaves(restored.get("opt_state", {}))
        ]
        current_leaves = jax.tree.leaves(template["opt_state"])
        shapes_match = len(restored_opt_leaves) == len(current_leaves) and all(
            a.shape == b.shape for a, b in zip(restored_opt_leaves, current_leaves)
        )
        if restored_opt_leaves and not shapes_match:
            # Optimizer-state layout changed since the checkpoint was written
            # (e.g. per-leaf -> flattened Adam): weights still restore; the
            # moments restart fresh.
            print("checkpoint optimizer layout differs; starting Adam fresh")
            restored_opt_leaves = []
        if restored_opt_leaves:
            opt_state = jax.tree.unflatten(
                jax.tree.structure(template["opt_state"]), restored_opt_leaves
            )
        else:
            # Weights-only checkpoint (e.g. converted from a reference .ckpt
            # via convert_checkpoint.py) — start with a fresh optimizer.
            opt_state = state.opt_state
            print("checkpoint has no optimizer state; starting Adam fresh")
        state = TrainState(
            jnp.asarray(restored["step"], jnp.int32),
            jax.tree.map(jnp.asarray, restored["params_coarse"]),
            jax.tree.map(jnp.asarray, restored["params_fine"])
            if restored.get("params_fine") is not None
            else None,
            opt_state,
        )
        start_iter = int(restored["step"])
        print(f"resumed from {ckpt_path} at step {start_iter}")

    if args.tighten_aabb is not None:
        if settings.use_ndc:
            raise SystemExit("--tighten-aabb is incompatible with NDC (LLFF) scenes")
        if start_iter == 0:
            raise SystemExit(
                "--tighten-aabb needs a trained field to bound: resume from "
                "a checkpoint (train a warmup phase first, or pass "
                "--load-checkpoint)"
            )
        from nerf_tpu.engine import density_aabb

        t_box = time.time()
        sweep_kw = {}
        if args.aabb_sweep_bounds is not None:
            sweep_kw = dict(
                bbox_min=tuple(args.aabb_sweep_bounds[:3]),
                bbox_max=tuple(args.aabb_sweep_bounds[3:]),
            )
        box = density_aabb(
            model_coarse, state.params_coarse, val_settings,
            tau=args.tighten_aabb, **sweep_kw,
        )
        print(f"density AABB (tau={args.tighten_aabb}): "
              f"[{box[0]:.2f},{box[1]:.2f},{box[2]:.2f}] - "
              f"[{box[3]:.2f},{box[4]:.2f},{box[5]:.2f}] "
              f"({time.time() - t_box:.1f}s)", flush=True)
        settings = dataclasses.replace(settings, aabb=box)
        val_settings = dataclasses.replace(val_settings, aabb=box)

    num_devices = len(jax.devices())
    batch_size = int(cfg.nerf.train.num_random_rays)
    train_iters = int(cfg.experiment.train_iters)
    # One compiled program runs `steps_per_call` full train steps (on-device
    # ray sampling included) per host dispatch — the per-dispatch latency of
    # a remote TPU runtime then amortizes over K steps.
    steps_per_call = max(
        1,
        min(
            int(cfg.experiment.print_every),
            int(cfg.experiment.validate_every),
            int(cfg.experiment.save_every),
            train_iters - start_iter,
        ),
    )
    if num_devices > 1:
        mesh = make_mesh()
        batch_size = pad_to_devices(batch_size, num_devices)
        state = replicate_tree(mesh, state)
        n_pad = pad_to_devices(ro_store.shape[0], num_devices)
        if n_pad != ro_store.shape[0]:
            pad = n_pad - ro_store.shape[0]
            ro_store = jnp.concatenate([ro_store, ro_store[:pad]])
            rd_store = jnp.concatenate([rd_store, rd_store[:pad]])
            target_store = jnp.concatenate([target_store, target_store[:pad]])
        ro_store, rd_store, target_store = shard_batch(
            mesh, ro_store, rd_store, target_store
        )
        print(f"data-parallel over {num_devices} devices, batch {batch_size}")
    else:
        mesh = None

    loop_cache = {}
    nan_guard = bool(getattr(cfg.experiment, "nan_guard", False))

    def get_loop(k_steps: int):
        """Compiled k-step loop, cached per length (the tail chunk when
        (train_iters - start_iter) is not a multiple of steps_per_call
        compiles once with its own length — never over-trains)."""
        if k_steps not in loop_cache:
            if mesh is not None:
                loop_cache[k_steps] = make_parallel_train_loop(
                    model_coarse, model_fine, settings, optimizer, mesh,
                    batch_size, k_steps, nan_guard=nan_guard,
                    sample_mode=ray_sampling,
                )
            else:
                loop_cache[k_steps] = make_train_loop(
                    model_coarse, model_fine, settings, optimizer,
                    batch_size, k_steps, nan_guard=nan_guard,
                    sample_mode=ray_sampling,
                )
        return loop_cache[k_steps]

    render_image = make_image_render_fn(model_coarse, model_fine, val_settings)

    t_start = time.time()
    i = start_iter
    while i < train_iters:
        k_steps = min(steps_per_call, train_iters - i)
        key, k_loop = jax.random.split(key)
        state, metrics = get_loop(k_steps)(
            state, ro_store, rd_store, target_store, k_loop
        )
        last = jax.tree.map(lambda x: x[-1], metrics)
        loss = float(last.loss)  # host fetch fences the whole scan
        rate.update(batch_size * k_steps)
        i_end = i + k_steps - 1
        metrics = last

        psnr_v = float(metrics.psnr)
        if primary:
            print(
                f"[TRAIN] iter {i_end} loss {loss:.6f} psnr {psnr_v:.3f} "
                f"rays/s {rate.rate():,.0f}"
            )
            writer.scalars(
                {
                    "train/loss": loss,
                    "train/coarse_loss": float(metrics.coarse_loss),
                    "train/fine_loss": float(metrics.fine_loss),
                    "train/psnr": psnr_v,
                    "train/rays_per_sec": rate.rate(),
                },
                i_end,
            )

        done = i_end + 1  # completed iterations
        prev_done = i
        i = done

        def crossed(every: int) -> bool:
            # True when a multiple of `every` falls inside (prev_done, done] —
            # robust when `every` is not a multiple of the chunk length.
            return done // every > prev_done // every

        if val_images is not None and (
            crossed(int(cfg.experiment.validate_every)) or done >= train_iters
        ):
            # SPMD rule: EVERY process must enter computations over the
            # (globally replicated) params — on a multi-host cluster a
            # primary-only dispatch would deadlock waiting for peers. Only
            # the file/console writes below are primary-gated.
            t_val = time.time()
            pose = jnp.asarray(np.asarray(val_poses[0])[:3, :4], jnp.float32)
            v_ro, v_rd = get_ray_bundle(h, w, focal, pose)
            pc = state.params_coarse
            pf = state.params_fine
            maps = render_image(pc, pf, v_ro, v_rd)
            target = jnp.asarray(val_images[0][..., :3])
            coarse_loss = img2mse(maps["rgb_coarse"], target)
            loss = coarse_loss
            fine_loss = 0.0
            if "rgb_fine" in maps:
                fine_loss = img2mse(maps["rgb_fine"], target)
                loss = coarse_loss + fine_loss
            psnr_v = float(mse2psnr(loss))
            if primary:
                writer.scalars(
                    {
                        "validation/loss": float(loss),
                        "validation/coarse_loss": float(coarse_loss),
                        "validation/fine_loss": float(fine_loss),
                        "validation/psnr": psnr_v,
                    },
                    i_end,
                )
                writer.image(
                    "validation/rgb_fine" if "rgb_fine" in maps else "validation/rgb_coarse",
                    np.asarray(maps.get("rgb_fine", maps["rgb_coarse"])),
                    i_end,
                )
                print(
                    f"[VAL] iter {i_end} loss {float(loss):.6f} "
                    f"psnr {psnr_v:.3f} ({time.time() - t_val:.2f}s)"
                )

        if primary and (
            crossed(int(cfg.experiment.save_every)) or done >= train_iters
        ):
            save_checkpoint(
                os.path.join(logdir, f"checkpoint{done:05d}.ntc"),
                {
                    "step": done,
                    "params_coarse": state.params_coarse,
                    "params_fine": state.params_fine,
                    "opt_state": state.opt_state,
                    "loss": float(metrics.loss),
                    "psnr": float(metrics.psnr),
                },
            )

    if writer is not None:
        writer.close()
    if primary:
        print(f"done: {train_iters - start_iter} iters in {time.time() - t_start:.1f}s")


if __name__ == "__main__":
    main()
