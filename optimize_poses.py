#!/usr/bin/env python3
"""Refine camera poses against a trained NeRF (TPU-native CLI).

Activates the capability the reference's dead code was written for:
``lieutils.py`` (reference, 799 lines, imported nowhere — SURVEY.md §2.9)
implements SE(3) exp/log "for pose optimization experiments" that never
shipped. This CLI is that experiment, working end-to-end: per-image se(3)
twists are optimized by Adam against the photometric loss with the NeRF
weights frozen, differentiating through ray synthesis, encoding, both MLPs,
hierarchical resampling, and compositing (engine/pose_opt.py). K steps run
per device dispatch via ``lax.scan``.

Two modes:
  # Real use — refine a split's (possibly miscalibrated) poses:
  python optimize_poses.py --config cfg.yml --checkpoint ckpt \
      --split train --save-poses refined.npz

  # Self-validating demo — perturb poses by a KNOWN amount, then recover
  # them; reports rotation/translation error before vs after:
  python optimize_poses.py --config cfg.yml --checkpoint ckpt \
      --perturb-rot-deg 2.0 --perturb-trans 0.05

The final line is one JSON record with the before/after photometric loss
(fixed-key evaluation) and, in perturb mode, the mean/max pose errors.
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
import optax

from nerf_tpu.config import load_config, render_settings_from_config
from nerf_tpu.data import load_blender_data, load_llff_data
from nerf_tpu.data.blender import composite_white_background
from nerf_tpu.data.synthetic import make_synthetic_dataset
from nerf_tpu.engine.checkpoint import load_models_and_params
from nerf_tpu.engine.pose_opt import (
    as_homogeneous,
    init_pose_opt_state,
    make_photometric_loss_fn,
    make_pose_opt_loop,
    perturb_poses,
    pose_errors,
    twists_to_poses,
)


def load_split_images_and_poses(cfg, split: str):
    """(images (N,H,W,3) f32, poses (N,3,4) f32, (h, w, focal)) for a split.

    Mirrors train_nerf.py's loading conventions exactly — in particular the
    white-background compositing gate (reference train_nerf.py:64-66) so the
    targets match what the checkpoint was trained against.
    """
    ds = cfg.dataset
    if ds.type == "blender":
        images, poses, _, hwf, i_split = load_blender_data(
            ds.basedir, half_res=ds.half_res, testskip=ds.testskip
        )
        if cfg.nerf.train.white_background:
            images = composite_white_background(images)
        else:
            images = images[..., :3]
        idx = i_split[{"train": 0, "val": 1, "test": 2}[split]]
        return (
            images[idx],
            poses[idx, :3, :4],
            (int(hwf[0]), int(hwf[1]), float(hwf[2])),
        )
    if ds.type == "llff":
        images, poses, _, _, i_holdout = load_llff_data(
            ds.basedir,
            factor=getattr(ds, "downsample_factor", 8),
            spherify=bool(getattr(ds, "spherify", False)),
            path_zflat=bool(getattr(ds, "path_zflat", False)),
        )
        hwf = poses[0, :3, -1]
        poses = poses[:, :3, :4]
        llffhold = int(getattr(ds, "llffhold", 8))
        if llffhold > 0:
            i_test = np.arange(images.shape[0])[::llffhold]
        else:
            i_test = np.array([i_holdout])
        if split == "train":
            idx = np.array(
                [i for i in range(images.shape[0]) if i not in i_test]
            )
        else:
            idx = i_test
        return (
            images[idx],
            poses[idx],
            (int(hwf[0]), int(hwf[1]), float(hwf[2])),
        )
    if ds.type == "synthetic":
        n_views = int(getattr(ds, "num_views", 20))
        size = int(getattr(ds, "image_size", 64))
        dataset = make_synthetic_dataset(
            num_views=n_views, height=size, width=size
        )
        return dataset.images, dataset.poses[:, :3, :4], dataset.hwf
    raise ValueError(f"Unsupported dataset type {ds.type!r} for pose refinement")


def main():
    from nerf_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # persistent XLA executable cache across CLI runs
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument(
        "--checkpoint", type=str, default="",
        help="Trained checkpoint to refine against (required unless "
             "--joint-train, where it optionally seeds the NeRF params).",
    )
    parser.add_argument(
        "--joint-train", action="store_true",
        help="BARF/NeRF-- mode: train the NeRF params JOINTLY with the "
             "camera refinement (from scratch, or finetuning --checkpoint) "
             "instead of keeping them frozen.",
    )
    parser.add_argument(
        "--nerf-lr", type=float, default=0.0,
        help="NeRF-param learning rate for --joint-train "
             "(0 = the config's optimizer.lr).",
    )
    parser.add_argument(
        "--save-checkpoint", type=str, default="",
        help="Write the jointly-trained NeRF to this .ntc "
             "(--joint-train only).",
    )
    parser.add_argument(
        "--anneal-iters", type=int, default=-1,
        help="Coarse-to-fine encoding annealing horizon for --joint-train "
             "(BARF eq. 14): xyz frequency bands ramp in linearly over this "
             "many iters. -1 = iters/2 (default), 0 = disabled. Each "
             "quantized alpha value compiles its own loop program.",
    )
    parser.add_argument(
        "--split", choices=["train", "val", "test"], default="train"
    )
    parser.add_argument("--iters", type=int, default=200)
    parser.add_argument(
        "--rays-per-image", type=int, default=64,
        help="Pixels sampled from EVERY image per step.",
    )
    parser.add_argument("--lr", type=float, default=1.0e-3)
    parser.add_argument(
        "--lr-final", type=float, default=0.0,
        help="Exponentially decay the camera lr from --lr to this value "
             "over --iters (0 = constant). Joint training wants a decayed "
             "camera lr (the BARF protocol's 1e-3 -> 1e-5).",
    )
    parser.add_argument(
        "--steps-per-loop", type=int, default=25,
        help="Refinement steps per device dispatch (lax.scan length).",
    )
    parser.add_argument(
        "--max-images", type=int, default=0,
        help="Refine only the first N images of the split (0 = all).",
    )
    parser.add_argument(
        "--perturb-rot-deg", type=float, default=0.0,
        help="Demo mode: rotate every pose by this many degrees about a "
             "random axis before refining (ground truth then known).",
    )
    parser.add_argument(
        "--perturb-trans", type=float, default=0.0,
        help="Demo mode: translate every pose by this distance in a random "
             "direction before refining.",
    )
    parser.add_argument(
        "--refine-focal", action="store_true",
        help="Jointly refine a shared focal-length correction "
             "(focal * exp(log_focal)) — self-calibration. Non-NDC scenes "
             "only.",
    )
    parser.add_argument(
        "--perturb-focal", type=float, default=1.0,
        help="Demo mode: multiply the assumed focal by this factor before "
             "refining (use with --refine-focal; recovery should find "
             "exp(log_focal) ~= 1/factor).",
    )
    parser.add_argument("--perturb-seed", type=int, default=0)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--save-poses", type=str, default="",
        help="Write refined poses + twists to this .npz.",
    )
    parser.add_argument(
        "--overrides", type=str, nargs="*", default=None,
        help="Dotted-key value pairs, e.g. dataset.basedir /tmp/distilled",
    )
    args = parser.parse_args()
    if not args.joint_train:
        for flag, val, unset in [
            ("--nerf-lr", args.nerf_lr, 0.0),
            ("--anneal-iters", args.anneal_iters, -1),
            ("--save-checkpoint", args.save_checkpoint, ""),
        ]:
            if val != unset:
                parser.error(f"{flag} requires --joint-train")

    cfg = load_config(args.config, args.overrides)
    images, poses, (h, w, focal) = load_split_images_and_poses(cfg, args.split)
    if args.max_images > 0:
        images, poses = images[: args.max_images], poses[: args.max_images]
    n = images.shape[0]
    print(f"refining {n} {args.split} poses at {h}x{w} (focal {focal:.1f})",
          flush=True)

    if args.checkpoint:
        model_coarse, model_fine, params_coarse, params_fine, _ = (
            load_models_and_params(args.checkpoint, cfg)
        )
    elif args.joint_train:
        # From-scratch joint training: build fresh models from the config.
        from nerf_tpu.config.schema import model_from_config

        model_coarse = model_from_config(cfg.models.coarse)
        model_fine = (
            model_from_config(cfg.models.fine)
            if "fine" in cfg.models else None
        )
        params_coarse = params_fine = None
    else:
        parser.error("--checkpoint is required unless --joint-train")

    # Deterministic float32 XLA settings: the Pallas kernel is forward-only,
    # and z-perturbation/noise would only add variance to the pose gradient.
    settings = dataclasses.replace(
        render_settings_from_config(
            cfg, "validation", hwf=(h, w, focal)
        ).eval_variant(),
        use_pallas=False,
        compute_dtype="float32",
    )
    # Joint training keeps the TRAIN stage's stochasticity: sigma noise is
    # load-bearing against the white-background empty-scene collapse
    # (reference train_nerf.py:190-196 protocol; docs/PARITY.md).
    train_settings = dataclasses.replace(
        render_settings_from_config(cfg, "train", hwf=(h, w, focal)),
        use_pallas=False,
        compute_dtype="float32",
    )

    true_focal = focal
    if args.perturb_focal != 1.0:
        if not args.refine_focal:
            parser.error("--perturb-focal requires --refine-focal")
        # The optimizer is told the wrong focal; targets reflect the true one.
        focal = focal * args.perturb_focal
        print(f"perturbed focal: {focal:.2f} (true {true_focal:.2f})",
              flush=True)

    true_poses = jnp.asarray(poses, jnp.float32)
    if args.perturb_rot_deg > 0.0 or args.perturb_trans > 0.0:
        base34 = perturb_poses(
            true_poses,
            jax.random.PRNGKey(args.perturb_seed),
            args.perturb_rot_deg,
            args.perturb_trans,
        )
        ground_truth_known = True
    else:
        base34 = true_poses
        ground_truth_known = False
    base44 = as_homogeneous(base34)
    images = jnp.asarray(images, jnp.float32)

    if args.lr_final > 0:
        optimizer = optax.adam(
            optax.exponential_decay(
                args.lr, args.iters, args.lr_final / args.lr
            )
        )
    else:
        optimizer = optax.adam(args.lr)
    num_devices = len(jax.devices())
    if args.joint_train:
        from nerf_tpu.engine.pose_opt import (
            JointTrainState, init_joint_train_state, make_joint_train_loop,
        )
        from nerf_tpu.engine.train import make_optimizer

        nerf_lr = args.nerf_lr if args.nerf_lr > 0 else float(cfg.optimizer.lr)
        # Same construction as training (schema.optimizer_from_config) incl.
        # the config's grad_clip_norm — joint training from a random init is
        # the regime that needs clipping most — with only the lr overridden.
        nerf_opt = make_optimizer(
            cfg.optimizer.type, nerf_lr,
            cfg.scheduler.lr_decay if "scheduler" in cfg else None,
            cfg.scheduler.lr_decay_factor if "scheduler" in cfg else None,
            grad_clip_norm=(
                float(getattr(cfg.optimizer, "grad_clip_norm", 0.0)) or None
            ),
        )
        if params_coarse is not None:
            trainable = {"coarse": params_coarse}
            if params_fine is not None:
                trainable["fine"] = params_fine
            state = JointTrainState(
                params_coarse, params_fine, nerf_opt.init(trainable),
                init_pose_opt_state(n, optimizer),
            )
        else:
            state = init_joint_train_state(
                model_coarse, model_fine,
                jax.random.PRNGKey(1000 + args.seed), n, nerf_opt, optimizer,
            )
        # Coarse-to-fine annealing is a FROM-SCRATCH device: it ramps the
        # encoding bands a random-init scene can absorb gradually. Seeded
        # from a pretrained checkpoint, alpha<n_freq would feed the converged
        # MLP band-masked encodings it was never trained on and corrupt it —
        # so finetuning defaults to no annealing.
        if args.anneal_iters >= 0:
            anneal = args.anneal_iters
            if anneal > 0 and params_coarse is not None:
                print(
                    "WARNING: --anneal-iters > 0 with a pretrained "
                    "--checkpoint masks encoding bands the checkpoint was "
                    "trained with; expect transient corruption.", flush=True,
                )
        else:
            anneal = 0 if params_coarse is not None else args.iters // 2
        n_freq = float(train_settings.num_encoding_fn_xyz)
        joint_dp = num_devices > 1 and n % num_devices == 0
        if joint_dp:
            from nerf_tpu.parallel import (
                make_mesh, make_parallel_joint_train_loop, replicate_tree,
                shard_batch,
            )

            joint_mesh = make_mesh()
        _joint_loops = {}

        def joint_loop_for(iters_done: int):
            """Loop program for the anneal phase at ``iters_done``; alpha is
            quantized to quarter-spectrum steps to bound recompiles (<= 5)."""
            if anneal <= 0 or iters_done >= anneal:
                alpha = -1.0  # fully open == unwindowed; reuse one program
            else:
                frac = iters_done / anneal
                alpha = n_freq * (round(frac * 4) / 4)
                if alpha >= n_freq:
                    # all-ones window == unwindowed: reuse that program
                    # instead of compiling a bit-identical sixth one.
                    alpha = -1.0
            if alpha not in _joint_loops:
                st = (train_settings if alpha < 0 else dataclasses.replace(
                    train_settings, pe_alpha_xyz=alpha))
                if joint_dp:
                    _joint_loops[alpha] = make_parallel_joint_train_loop(
                        model_coarse, model_fine, st, h, w, focal,
                        args.rays_per_image, nerf_opt, optimizer,
                        args.steps_per_loop, mesh=joint_mesh, num_images=n,
                        refine_focal=args.refine_focal,
                    )
                else:
                    _joint_loops[alpha] = make_joint_train_loop(
                        model_coarse, model_fine, st, h, w, focal,
                        args.rays_per_image, nerf_opt, optimizer,
                        args.steps_per_loop, refine_focal=args.refine_focal,
                    )
            return _joint_loops[alpha]

        print(
            f"joint NeRF+camera training (nerf lr {nerf_lr:g}, "
            f"anneal {anneal} iters)", flush=True,
        )
        run_joint = True
    else:
        run_joint = False
    state = state if run_joint else init_pose_opt_state(n, optimizer)
    loop_base44, loop_images = base44, images
    loop_pc, loop_pf = params_coarse, params_fine
    if run_joint:
        if joint_dp:
            # Same DP layout as frozen-model refinement: images/poses shard,
            # everything trainable replicates (tests/test_pose_dp.py).
            state = replicate_tree(joint_mesh, state)
            loop_base44, loop_images = shard_batch(joint_mesh, base44, images)
            print(f"data-parallel over {num_devices} devices", flush=True)
    elif num_devices > 1 and n % num_devices == 0:
        # Same trajectory as serial (tests/test_pose_dp.py), images sharded
        # over the mesh; camera params replicated, one pmean per step.
        from nerf_tpu.parallel import (
            make_mesh, make_parallel_pose_opt_loop, replicate_tree,
            shard_batch,
        )

        mesh = make_mesh()
        loop = make_parallel_pose_opt_loop(
            model_coarse, model_fine, settings, h, w, focal,
            args.rays_per_image, optimizer, args.steps_per_loop,
            mesh=mesh, num_images=n, refine_focal=args.refine_focal,
        )
        state = replicate_tree(mesh, state)
        loop_base44, loop_images = shard_batch(mesh, base44, images)
        loop_pc = replicate_tree(mesh, params_coarse)
        loop_pf = replicate_tree(mesh, params_fine)
        print(f"data-parallel over {num_devices} devices", flush=True)
    else:
        if num_devices > 1:
            print(
                f"serial fallback: {n} images not divisible by "
                f"{num_devices} devices", flush=True,
            )
        loop = make_pose_opt_loop(
            model_coarse, model_fine, settings, h, w, focal,
            args.rays_per_image, optimizer, args.steps_per_loop,
            refine_focal=args.refine_focal,
        )
    # Fixed-key evaluation: the SAME pixel sample before and after, so the
    # reported improvement is camera movement, not sampling luck.
    eval_loss = jax.jit(
        make_photometric_loss_fn(
            model_coarse, model_fine, settings, h, w, focal,
            max(args.rays_per_image, 256),
            refine_focal=args.refine_focal,
        )
    )
    eval_key = jax.random.PRNGKey(10_000 + args.seed)

    def current(st):
        """(pose opt_params, nerf coarse/fine params) for either mode."""
        if run_joint:
            return st.pose.opt_params, st.params_coarse, st.params_fine
        return st.opt_params, params_coarse, params_fine

    pose0, pc0, pf0 = current(state)
    initial_loss = float(
        eval_loss(pose0, base44, images, pc0, pf0, eval_key)
    )

    t0 = time.time()
    num_loops = max(1, -(-args.iters // args.steps_per_loop))
    for i in range(num_loops):
        step_key = jax.random.fold_in(jax.random.PRNGKey(args.seed), i)
        if run_joint:
            loop = joint_loop_for(i * args.steps_per_loop)
            state, losses = loop(state, loop_base44, loop_images, step_key)
        else:
            state, losses = loop(
                state, loop_base44, loop_images, loop_pc, loop_pf, step_key
            )
        print(
            f"[{(i + 1) * args.steps_per_loop:5d}] "
            f"loss {float(losses[-1]):.6f} ({time.time() - t0:.1f}s)",
            flush=True,
        )
    pose_final, pc_final, pf_final = current(state)
    final_loss = float(
        eval_loss(pose_final, base44, images, pc_final, pf_final, eval_key)
    )

    pose_state = state.pose if run_joint else state
    refined = twists_to_poses(pose_state.xi, base44)
    report = {
        "num_poses": n,
        "iters": num_loops * args.steps_per_loop,
        "initial_loss": initial_loss,
        "final_loss": final_loss,
        "wall_s": round(time.time() - t0, 1),
    }
    if args.refine_focal:
        refined_focal = focal * float(np.exp(pose_state.log_focal))
        report.update(
            initial_focal=focal,
            refined_focal=refined_focal,
            true_focal=true_focal,
            focal_error_pct=round(
                100.0 * abs(refined_focal - true_focal) / true_focal, 3
            ),
        )
    if ground_truth_known:
        before = {k: np.asarray(v) for k, v in
                  pose_errors(base34, true_poses).items()}
        after = {k: np.asarray(v) for k, v in
                 pose_errors(refined, true_poses).items()}
        report.update(
            initial_rot_deg_mean=float(before["rot_deg"].mean()),
            final_rot_deg_mean=float(after["rot_deg"].mean()),
            final_rot_deg_max=float(after["rot_deg"].max()),
            initial_trans_mean=float(before["trans"].mean()),
            final_trans_mean=float(after["trans"].mean()),
            final_trans_max=float(after["trans"].max()),
        )
        if run_joint:
            # Joint training has a gauge freedom (scene + cameras drift
            # together); only Sim(3)-aligned errors are meaningful.
            from nerf_tpu.engine.pose_opt import align_poses_umeyama

            aligned = {k: np.asarray(v) for k, v in pose_errors(
                align_poses_umeyama(refined, true_poses), true_poses
            ).items()}
            report.update(
                aligned_rot_deg_mean=float(aligned["rot_deg"].mean()),
                aligned_trans_mean=float(aligned["trans"].mean()),
            )
    if run_joint:
        report["mode"] = "joint"
        if args.save_checkpoint:
            from nerf_tpu.engine.checkpoint import save_checkpoint

            os.makedirs(
                os.path.dirname(args.save_checkpoint) or ".", exist_ok=True
            )
            save_checkpoint(
                args.save_checkpoint,
                {
                    "step": num_loops * args.steps_per_loop,
                    "params_coarse": pc_final,
                    "params_fine": pf_final,
                    "loss": final_loss,
                },
            )
            report["saved_checkpoint"] = args.save_checkpoint
    if args.save_poses:
        os.makedirs(os.path.dirname(args.save_poses) or ".", exist_ok=True)
        np.savez(
            args.save_poses,
            poses=np.asarray(refined),
            xi=np.asarray(pose_state.xi),
            log_focal=np.asarray(pose_state.log_focal),
            base_poses=np.asarray(base34),
        )
        report["saved"] = args.save_poses
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
