"""LLFF (real forward-facing) dataset loader.

Behavioral parity target (reference: krrish94/nerf-pytorch):
  - ``load_llff_data`` -> nerf/load_llff.py:278-354
  - ``_load_data``     -> nerf/load_llff.py:69-136
  - ``_minify``        -> nerf/load_llff.py:12-66 (reference shells out to
    ImageMagick ``mogrify``; we resize in-process with cv2 INTER_AREA while
    keeping the exact ``images_{factor}/`` directory-layout contract so
    caches are interchangeable with the reference's)
  - pose recentering / spherification / spiral path -> load_llff.py:185-275
    (viewmatrix/poses_avg/render_path_spiral live in nerf_tpu.data.poses)

Semantics preserved: poses_bounds.npy (N, 17) unpack, the rotation-axis swap
(load_llff.py:288), bd_factor rescale 1/(bds.min()*bd_factor) (:295-297),
recentering about the average pose, the 120-view / 2-rotation spiral render
path with 90th-percentile radii (:310-339), and the nearest-to-average
holdout view (:347-349).

Provenance note: ``recenter_poses`` and ``spherify_poses`` reproduce the
reference algorithm essentially verbatim (load_llff.py:185-275, itself
vendored from yenchenlin/nerf-pytorch and the original LLFF code). This
pose math is a fixed numerical recipe that downstream pose/NDC parity
depends on bit-for-bit; a cosmetic rewrite would only rename variables.
The I/O half of this module (``_minify``, ``_load_data``) is a genuine
reimplementation.
"""

from __future__ import annotations

import os
from typing import Tuple

import cv2
import imageio.v2 as imageio
import numpy as np

from .poses import normalize, poses_avg, render_path_spiral, viewmatrix

_IMG_EXTS = ("JPG", "jpg", "png", "jpeg", "PNG")


def _imread(path: str) -> np.ndarray:
    """Read an image, ignoring any PNG gAMA chunk (reference load_llff.py:126-130
    passes ignoregamma=True so a gamma-tagged png isn't silently rescaled).
    Newer imageio PNG plugins dropped the kwarg and never apply gamma — fall
    back to a plain read there (same pixels either way)."""
    if path.lower().endswith("png"):
        try:
            return imageio.imread(path, ignoregamma=True)
        except TypeError:
            return imageio.imread(path)
    return imageio.imread(path)


def _list_images(imgdir: str):
    return [
        os.path.join(imgdir, f)
        for f in sorted(os.listdir(imgdir))
        if f.endswith(_IMG_EXTS)
    ]


def _minify(basedir: str, factors=(), resolutions=()) -> None:
    """Create downsampled image directories ``images_{r}`` / ``images_{w}x{h}``.

    In-process cv2 resize replacing the reference's ImageMagick subprocess
    (load_llff.py:55-60); output is always PNG, matching mogrify -format png.
    """
    todo = []
    for r in factors:
        if not os.path.exists(os.path.join(basedir, f"images_{r}")):
            todo.append(("factor", r))
    for r in resolutions:
        if not os.path.exists(os.path.join(basedir, f"images_{r[1]}x{r[0]}")):
            todo.append(("resolution", r))
    if not todo:
        return

    imgs = _list_images(os.path.join(basedir, "images"))
    for kind, r in todo:
        if kind == "factor":
            name = f"images_{r}"
        else:
            name = f"images_{r[1]}x{r[0]}"
        imgdir = os.path.join(basedir, name)
        os.makedirs(imgdir, exist_ok=True)
        print(f"Minifying {r} {basedir}")
        for path in imgs:
            img = imageio.imread(path)
            h, w = img.shape[:2]
            if kind == "factor":
                new_w, new_h = int(round(w / r)), int(round(h / r))
            else:
                new_h, new_w = int(r[0]), int(r[1])
            resized = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_AREA)
            base = os.path.splitext(os.path.basename(path))[0]
            imageio.imwrite(os.path.join(imgdir, base + ".png"), resized)


def _load_data(
    basedir: str,
    factor: int | None = None,
    width: int | None = None,
    height: int | None = None,
    load_imgs: bool = True,
):
    poses_arr = np.load(os.path.join(basedir, "poses_bounds.npy"))
    poses = poses_arr[:, :-2].reshape([-1, 3, 5]).transpose([1, 2, 0])
    bds = poses_arr[:, -2:].transpose([1, 0])

    img0 = _list_images(os.path.join(basedir, "images"))[0]
    sh = imageio.imread(img0).shape

    sfx = ""
    if factor is not None and factor != 1:
        sfx = f"_{factor}"
        _minify(basedir, factors=[factor])
    elif height is not None:
        factor = sh[0] / float(height)
        width = int(sh[1] / factor)
        _minify(basedir, resolutions=[[height, width]])
        sfx = f"_{width}x{height}"
    elif width is not None:
        factor = sh[1] / float(width)
        height = int(sh[0] / factor)
        _minify(basedir, resolutions=[[height, width]])
        sfx = f"_{width}x{height}"
    else:
        factor = 1

    imgdir = os.path.join(basedir, "images" + sfx)
    if not os.path.exists(imgdir):
        raise FileNotFoundError(f"{imgdir} does not exist")

    imgfiles = _list_images(imgdir)
    if poses.shape[-1] != len(imgfiles):
        raise ValueError(
            f"Mismatch between imgs {len(imgfiles)} and poses {poses.shape[-1]}"
        )

    sh = imageio.imread(imgfiles[0]).shape
    poses[:2, 4, :] = np.array(sh[:2]).reshape([2, 1])
    poses[2, 4, :] = poses[2, 4, :] * 1.0 / factor

    if not load_imgs:
        return poses, bds

    imgs = [_imread(f)[..., :3] / 255.0 for f in imgfiles]
    imgs = np.stack(imgs, -1)
    return poses, bds, imgs


def recenter_poses(poses: np.ndarray) -> np.ndarray:
    """Transform all poses so their average pose is the identity (load_llff.py:185-197)."""
    poses_ = poses + 0
    bottom = np.reshape([0, 0, 0, 1.0], [1, 4])
    c2w = poses_avg(poses)
    c2w = np.concatenate([c2w[:3, :4], bottom], -2)
    bottom = np.tile(np.reshape(bottom, [1, 1, 4]), [poses.shape[0], 1, 1])
    poses_h = np.concatenate([poses[:, :3, :4], bottom], -2)
    poses_h = np.linalg.inv(c2w) @ poses_h
    poses_[:, :3, :4] = poses_h[:, :3, :4]
    return poses_


def spherify_poses(poses: np.ndarray, bds: np.ndarray):
    """Re-center 360° captures onto a sphere + circular render path (load_llff.py:200-275)."""

    def p34_to_44(p):
        return np.concatenate(
            [p, np.tile(np.reshape(np.eye(4)[-1, :], [1, 1, 4]), [p.shape[0], 1, 1])], 1
        )

    rays_d = poses[:, :3, 2:3]
    rays_o = poses[:, :3, 3:4]

    # Point minimizing total squared distance to all camera axes.
    A_i = np.eye(3) - rays_d * np.transpose(rays_d, [0, 2, 1])
    b_i = -A_i @ rays_o
    pt_mindist = np.squeeze(
        -np.linalg.inv((np.transpose(A_i, [0, 2, 1]) @ A_i).mean(0)) @ b_i.mean(0)
    )

    center = pt_mindist
    up = (poses[:, :3, 3] - center).mean(0)
    vec0 = normalize(up)
    vec1 = normalize(np.cross([0.1, 0.2, 0.3], vec0))
    vec2 = normalize(np.cross(vec0, vec1))
    c2w = np.stack([vec1, vec2, vec0, center], 1)

    poses_reset = np.linalg.inv(p34_to_44(c2w[None])) @ p34_to_44(poses[:, :3, :4])
    rad = np.sqrt(np.mean(np.sum(np.square(poses_reset[:, :3, 3]), -1)))

    sc = 1.0 / rad
    poses_reset[:, :3, 3] *= sc
    bds = bds * sc
    rad *= sc

    centroid = np.mean(poses_reset[:, :3, 3], 0)
    zh = centroid[2]
    radcircle = np.sqrt(rad ** 2 - zh ** 2)
    new_poses = []
    for th in np.linspace(0.0, 2.0 * np.pi, 120):
        camorigin = np.array([radcircle * np.cos(th), radcircle * np.sin(th), zh])
        up = np.array([0, 0, -1.0])
        vec2 = normalize(camorigin)
        vec0 = normalize(np.cross(vec2, up))
        vec1 = normalize(np.cross(vec2, vec0))
        new_poses.append(np.stack([vec0, vec1, vec2, camorigin], 1))
    new_poses = np.stack(new_poses, 0)

    new_poses = np.concatenate(
        [new_poses, np.broadcast_to(poses[0, :3, -1:], new_poses[:, :3, -1:].shape)], -1
    )
    poses_reset = np.concatenate(
        [
            poses_reset[:, :3, :4],
            np.broadcast_to(poses[0, :3, -1:], poses_reset[:, :3, -1:].shape),
        ],
        -1,
    )
    return poses_reset, new_poses, bds


def llff_holdout_split(num_images: int, llffhold: int = 8, i_holdout: int = 0):
    """The reference's LLFF train/holdout split (train_nerf.py:75-84): every
    ``llffhold``-th view is held out (val == test for LLFF); ``llffhold <= 0``
    falls back to the loader's single nearest-to-average view ``i_holdout``
    (train_nerf.py:137-141). Returns ``(i_train, i_test)`` index arrays.
    The one definition shared by eval_poses / train_multiscene /
    eval_multiscene so every tool splits identically."""
    if llffhold > 0:
        i_test = np.arange(num_images)[::llffhold]
    else:
        i_test = np.array([i_holdout])
    i_train = np.array([i for i in range(num_images) if i not in i_test])
    return i_train, i_test


def load_llff_data(
    basedir: str,
    factor: int = 8,
    recenter: bool = True,
    bd_factor: float = 0.75,
    spherify: bool = False,
    path_zflat: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, int]:
    """Load an LLFF scene.

    Returns (images (N,H,W,3), poses (N,3,5), bds (N,2), render_poses, i_test).
    """
    poses, bds, imgs = _load_data(basedir, factor=factor)

    # Axis swap: [down, right, back] -> [right, up, back] (load_llff.py:288).
    poses = np.concatenate([poses[:, 1:2, :], -poses[:, 0:1, :], poses[:, 2:, :]], 1)
    poses = np.moveaxis(poses, -1, 0).astype(np.float32)
    imgs = np.moveaxis(imgs, -1, 0).astype(np.float32)
    images = imgs
    bds = np.moveaxis(bds, -1, 0).astype(np.float32)

    sc = 1.0 if bd_factor is None else 1.0 / (bds.min() * bd_factor)
    poses[:, :3, 3] *= sc
    bds = bds * sc

    if recenter:
        poses = recenter_poses(poses)

    if spherify:
        poses, render_poses, bds = spherify_poses(poses, bds)
    else:
        c2w = poses_avg(poses)
        up = normalize(poses[:, :3, 1].sum(0))

        close_depth, inf_depth = bds.min() * 0.9, bds.max() * 5.0
        dt = 0.75
        focal = 1.0 / (((1.0 - dt) / close_depth + dt / inf_depth))

        tt = poses[:, :3, 3]
        rads = np.percentile(np.abs(tt), 90, 0)
        c2w_path = c2w
        N_views = 120
        N_rots = 2
        if path_zflat:
            zloc = -close_depth * 0.1
            c2w_path[:3, 3] = c2w_path[:3, 3] + zloc * c2w_path[:3, 2]
            rads[2] = 0.0
            N_rots = 1
            N_views = N_views // 2
        render_poses = render_path_spiral(
            c2w_path, up, rads, focal, zrate=0.5, rots=N_rots, N=N_views
        )

    render_poses = np.array(render_poses).astype(np.float32)

    c2w = poses_avg(poses)
    dists = np.sum(np.square(c2w[:3, 3] - poses[:, :3, 3]), -1)
    i_test = int(np.argmin(dists))

    return images.astype(np.float32), poses.astype(np.float32), bds, render_poses, i_test
