"""Blender synthetic-scene dataset loader.

Behavioral parity target (reference: krrish94/nerf-pytorch):
  - ``load_blender_data`` -> nerf/load_blender.py:40-116

Reproduced behavior:
  * reads ``transforms_{train,val,test}.json`` + RGBA PNGs, keeps all 4
    channels, normalizes to [0, 1] float32 (load_blender.py:58-73)
  * ``testskip`` stride applied to val/test splits only (load_blender.py:51-56)
  * focal from ``camera_angle_x``: 0.5 * W / tan(0.5 * angle) (:75-76)
  * 40-pose spherical orbit render path at radius 4, phi=-30 (:78-84)
  * ``half_res``: cv2.INTER_AREA downscale by 2x with focal halved (:101-112)
  * ``debug``: 25x25 images with focal/32 for smoke tests (:86-99)

Host-side numpy by design — data loading is I/O-bound, runs once, and feeds
device-resident ray stores (see nerf_tpu.data.rays_store).
"""

from __future__ import annotations

import json
import os
from typing import List, Tuple

import cv2
import imageio.v2 as imageio
import numpy as np

from .poses import spherical_render_poses


def load_blender_data(
    basedir: str,
    half_res: bool = False,
    testskip: int = 1,
    debug: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, List[float], List[np.ndarray]]:
    """Load a blender synthetic scene.

    Returns (imgs (N,H,W,4), poses (N,4,4), render_poses (40,4,4),
    [H, W, focal], i_split=[i_train, i_val, i_test]).
    """
    splits = ["train", "val", "test"]
    metas = {}
    for s in splits:
        with open(os.path.join(basedir, f"transforms_{s}.json"), "r") as fp:
            metas[s] = json.load(fp)

    all_imgs = []
    all_poses = []
    counts = [0]
    for s in splits:
        meta = metas[s]
        imgs = []
        poses = []
        skip = 1 if s == "train" or testskip == 0 else testskip

        for frame in meta["frames"][::skip]:
            fname = os.path.join(basedir, frame["file_path"] + ".png")
            imgs.append(imageio.imread(fname))
            poses.append(np.array(frame["transform_matrix"]))
        imgs = (np.array(imgs) / 255.0).astype(np.float32)
        poses = np.array(poses).astype(np.float32)
        counts.append(counts[-1] + imgs.shape[0])
        all_imgs.append(imgs)
        all_poses.append(poses)

    i_split = [np.arange(counts[i], counts[i + 1]) for i in range(3)]

    imgs = np.concatenate(all_imgs, 0)
    poses = np.concatenate(all_poses, 0)

    height, width = imgs[0].shape[:2]
    camera_angle_x = float(metas["train"]["camera_angle_x"])
    focal = 0.5 * width / np.tan(0.5 * camera_angle_x)

    render_poses = spherical_render_poses(40, phi=-30.0, radius=4.0)

    if debug:
        # 25x25 smoke-test mode (load_blender.py:86-99).
        height = height // 32
        width = width // 32
        focal = focal / 32.0
        imgs = np.stack(
            [
                cv2.resize(img, dsize=(width, height), interpolation=cv2.INTER_AREA)
                for img in imgs
            ],
            axis=0,
        )
        return imgs, poses, render_poses, [height, width, focal], i_split

    if half_res:
        height = height // 2
        width = width // 2
        focal = focal / 2.0
        imgs = np.stack(
            [
                cv2.resize(img, dsize=(width, height), interpolation=cv2.INTER_AREA)
                for img in imgs
            ],
            axis=0,
        )

    return imgs, poses, render_poses, [height, width, focal], i_split


def composite_white_background(imgs: np.ndarray) -> np.ndarray:
    """Alpha-composite RGBA images onto white (reference train_nerf.py:65-66)."""
    if imgs.shape[-1] == 4:
        return imgs[..., :3] * imgs[..., -1:] + (1.0 - imgs[..., -1:])
    return imgs
