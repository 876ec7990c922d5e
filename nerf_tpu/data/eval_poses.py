"""Resolve the camera poses a checkpoint should be rendered from.

Shared by ``eval_nerf.py`` and ``serve_nerf.py``: given a scene config and a
split name, produce the pose array + intrinsics exactly the way the
reference's eval path does (reference eval_nerf.py:60-85 — the dataset type
selects the loader, ``render`` means the dataset's orbit/spiral trajectory),
extended with the train/val/test splits the reference lacks.

Raises ``ValueError`` for unsatisfiable requests (a dataset split without an
on-disk dataset); CLIs convert that to their exit message.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from .blender import load_blender_data
from .llff import llff_holdout_split, load_llff_data
from .poses import spherical_render_poses


def resolve_render_poses(cfg, split: str = "render"
                         ) -> Tuple[np.ndarray, int, int, float]:
    """Return ``(poses (N, 3, 4) float32, height, width, focal)``.

    Poses are always sliced to the (3, 4) camera-to-world block: blender
    paths produce (4, 4) homogeneous matrices and LLFF spiral/spherified
    paths carry the (3, 5) hwf column — consumers (the pose renderers)
    take exactly (3, 4).

    ``split``: ``render`` = the dataset's orbit (blender) / spiral (LLFF)
    trajectory, the reference behavior; ``train``/``val``/``test`` = that
    split's camera poses (held-out evaluation). Blender scenes without an
    on-disk dataset fall back to the standard 40-pose spherical orbit at
    config (or default 400px) intrinsics — rendering a pretrained checkpoint
    needs no images.
    """
    ds = cfg.dataset
    if ds.type == "blender":
        if ds.basedir and os.path.isdir(ds.basedir):
            _, all_poses, render_poses, hwf, i_split = load_blender_data(
                ds.basedir, half_res=ds.half_res, testskip=ds.testskip,
            )
            if split != "render":
                idx = {"train": 0, "val": 1, "test": 2}[split]
                render_poses = all_poses[i_split[idx]]
            h, w, focal = int(hwf[0]), int(hwf[1]), float(hwf[2])
        else:
            if split != "render":
                # A dataset split without a dataset would silently become
                # the 40-pose orbit and poison downstream metric runs.
                raise ValueError(
                    f"--split {split} needs an on-disk dataset, but "
                    f"dataset.basedir={ds.basedir!r} is not a directory"
                )
            h = int(getattr(ds, "height", 400))
            w = int(getattr(ds, "width", 400))
            focal = float(
                getattr(ds, "focal",
                        0.5 * w / np.tan(0.5 * 0.6911112070083618))
            )
            render_poses = spherical_render_poses(40, phi=-30.0, radius=4.0)
    elif ds.type == "llff":
        _, poses, _, render_poses, i_holdout = load_llff_data(
            ds.basedir,
            factor=getattr(ds, "downsample_factor", 8),
            spherify=bool(getattr(ds, "spherify", False)),
            path_zflat=bool(getattr(ds, "path_zflat", False)),
        )
        hwf = poses[0, :3, -1]
        h, w, focal = int(hwf[0]), int(hwf[1]), float(hwf[2])
        if split != "render":
            # The reference's holdout split (llff.llff_holdout_split —
            # shared with train/eval_multiscene so every tool splits alike).
            i_train, i_test = llff_holdout_split(
                poses.shape[0], int(getattr(ds, "llffhold", 8)), i_holdout
            )
            sel = i_train if split == "train" else i_test
            render_poses = poses[sel, :3, :4]
    elif ds.type == "synthetic":
        if split != "render":
            raise ValueError(
                "--split train/val/test is not defined for the procedural "
                "synthetic dataset (it has no on-disk splits); use the "
                "default --split render"
            )
        # Procedural scene: standard spherical orbit at the training FOV.
        h = w = int(getattr(ds, "image_size", 64))
        focal = 0.5 * w / np.tan(0.5 * 0.6911112070083618)
        render_poses = spherical_render_poses(40, phi=-30.0, radius=4.0)
    else:
        raise ValueError(f"Unsupported dataset type {ds.type!r} for eval")
    return np.asarray(render_poses, np.float32)[:, :3, :4], h, w, focal
