"""Data-layer tests using synthetic on-disk fixtures (no downloaded datasets)."""

import json
import os

import imageio.v2 as imageio
import numpy as np
import pytest

from nerf_tpu.data import (
    build_ray_store,
    composite_white_background,
    is_reference_cache_dir,
    load_blender_data,
    load_llff_data,
    load_ray_cache,
    load_reference_cache_dir,
    pose_spherical,
    save_ray_cache,
)


@pytest.fixture
def blender_dir(tmp_path):
    """Write a miniature blender-format dataset (8x8 RGBA frames)."""
    rng = np.random.default_rng(0)
    for split, n in [("train", 3), ("val", 2), ("test", 2)]:
        frames = []
        os.makedirs(tmp_path / split, exist_ok=True)
        for i in range(n):
            name = f"./{split}/r_{i}"
            img = (rng.uniform(0, 255, (8, 8, 4))).astype(np.uint8)
            imageio.imwrite(tmp_path / split / f"r_{i}.png", img)
            pose = pose_spherical(i * 40.0, -30.0, 4.0)
            frames.append(
                {"file_path": name, "transform_matrix": pose.tolist()}
            )
        meta = {"camera_angle_x": 0.6911112070083618, "frames": frames}
        with open(tmp_path / f"transforms_{split}.json", "w") as f:
            json.dump(meta, f)
    return str(tmp_path)


def test_load_blender_data(blender_dir):
    imgs, poses, render_poses, hwf, i_split = load_blender_data(blender_dir)
    assert imgs.shape == (7, 8, 8, 4)
    assert imgs.dtype == np.float32 and imgs.max() <= 1.0
    assert poses.shape == (7, 4, 4)
    assert render_poses.shape == (40, 4, 4)
    h, w, focal = hwf
    assert (h, w) == (8, 8)
    np.testing.assert_allclose(focal, 0.5 * 8 / np.tan(0.5 * 0.6911112070083618))
    assert [len(s) for s in i_split] == [3, 2, 2]


def test_load_blender_half_res_and_testskip(blender_dir):
    imgs, poses, _, hwf, i_split = load_blender_data(
        blender_dir, half_res=True, testskip=2
    )
    assert imgs.shape[1:3] == (4, 4)
    assert [len(s) for s in i_split] == [3, 1, 1]
    assert hwf[2] == pytest.approx(0.5 * 0.5 * 8 / np.tan(0.5 * 0.6911112070083618))


def test_composite_white_background():
    img = np.zeros((2, 2, 4), np.float32)
    img[..., 3] = 0.0  # fully transparent -> white
    out = composite_white_background(img[None])
    np.testing.assert_allclose(out, 1.0)


@pytest.fixture
def llff_dir(tmp_path):
    """Miniature LLFF dataset: images/ + poses_bounds.npy for 4 views."""
    rng = np.random.default_rng(0)
    n, h, w = 4, 12, 16
    imgdir = tmp_path / "images"
    os.makedirs(imgdir)
    for i in range(n):
        imageio.imwrite(
            imgdir / f"img_{i:03d}.png",
            rng.uniform(0, 255, (h, w, 3)).astype(np.uint8),
        )
    # forward-facing-ish poses: [right, down?, ...] LLFF raw convention
    poses = np.zeros((n, 3, 5), np.float32)
    for i in range(n):
        c2w = pose_spherical(5.0 * i, -5.0, 4.0)[:3, :4]
        # raw LLFF stores [down, right, back] — invert the loader's swap
        m = np.concatenate([-c2w[:, 1:2], c2w[:, 0:1], c2w[:, 2:]], 1)
        poses[i, :, :4] = m
        poses[i, :, 4] = [h, w, 20.0]
    bds = np.stack([np.full(n, 2.0), np.full(n, 8.0)], -1)
    arr = np.concatenate([poses.reshape(n, -1), bds], -1)
    np.save(tmp_path / "poses_bounds.npy", arr)
    return str(tmp_path)


def test_load_llff_data_factor1(llff_dir):
    images, poses, bds, render_poses, i_test = load_llff_data(llff_dir, factor=1)
    assert images.shape == (4, 12, 16, 3)
    assert poses.shape == (4, 3, 5)
    assert render_poses.shape[0] == 120
    assert 0 <= i_test < 4
    # bd rescale: min bound * 0.75 scaling -> min(bds) == 1/0.75
    np.testing.assert_allclose(bds.min(), 1.0 / 0.75, rtol=1e-5)


def test_load_llff_minify_creates_factor_dir(llff_dir):
    images, poses, _, _, _ = load_llff_data(llff_dir, factor=2)
    assert os.path.isdir(os.path.join(llff_dir, "images_2"))
    assert images.shape[1:3] == (6, 8)
    # hwf row updated to the downsampled size
    assert poses[0, 0, 4] == 6 and poses[0, 1, 4] == 8


def test_ray_cache_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (2, 4, 4, 3)).astype(np.float32)
    poses = np.stack([pose_spherical(0.0, -30.0, 4.0), pose_spherical(90.0, -30.0, 4.0)])
    ro, rd, t = build_ray_store(images, poses, 4, 4, 5.0)
    assert ro.shape == (32, 3) and rd.shape == (32, 3) and t.shape == (32, 3)

    path = str(tmp_path / "cache.npz")
    meta = {"height": 4, "width": 4, "focal": 5.0, "near": 2.0, "far": 6.0}
    save_ray_cache(path, ro, rd, t, meta, val_images=images, val_poses=poses)
    ro2, rd2, t2, meta2, extras = load_ray_cache(path)
    np.testing.assert_array_equal(ro, ro2)
    np.testing.assert_array_equal(t, t2)
    assert meta2 == meta
    assert extras["val_images"].shape == (2, 4, 4, 3)


@pytest.fixture
def reference_cache_dir(tmp_path):
    """Write a reference-format ray cache: train/NNNN.data torch.save dicts
    exactly as reference cache_dataset.py:73-115 produces them (ray_bundle
    stacked (2, N, 3) torch tensors, RGBA target, numpy-float focal)."""
    from nerf_tpu.engine.checkpoint import _import_torch

    torch = _import_torch()

    rng = np.random.default_rng(3)
    os.makedirs(tmp_path / "cache" / "train")
    per_file = []
    for idx in range(3):
        ro = rng.normal(size=(5, 3)).astype(np.float32)
        rd = rng.normal(size=(5, 3)).astype(np.float32)
        tgt = rng.uniform(0, 1, (5, 4)).astype(np.float32)
        torch.save(
            {
                "height": 8,
                "width": 8,
                "focal_length": np.float64(5.25),
                "ray_bundle": torch.stack(
                    [torch.from_numpy(ro), torch.from_numpy(rd)], dim=0
                ),
                "target": torch.from_numpy(tgt),
            },
            str(tmp_path / "cache" / "train" / f"{idx:04d}.data"),
        )
        per_file.append((ro, rd, tgt[:, :3]))
    return str(tmp_path / "cache"), per_file


def test_reference_cache_dir_ingest(reference_cache_dir, tmp_path):
    cache, per_file = reference_cache_dir
    assert is_reference_cache_dir(cache)
    assert not is_reference_cache_dir(str(tmp_path))  # no train/ subdir
    ro, rd, t, meta, extras = load_reference_cache_dir(cache)
    assert ro.shape == (15, 3) and rd.shape == (15, 3) and t.shape == (15, 3)
    # Files ingest in sorted order, alpha channel dropped (ref
    # train_nerf.py:183 takes target[..., :3]).
    np.testing.assert_array_equal(ro, np.concatenate([p[0] for p in per_file]))
    np.testing.assert_array_equal(t, np.concatenate([p[2] for p in per_file]))
    assert meta == {"height": 8, "width": 8, "focal": 5.25}
    assert extras == {}


def test_reference_cache_dir_empty_raises(tmp_path):
    os.makedirs(tmp_path / "train")
    assert not is_reference_cache_dir(str(tmp_path))
    with pytest.raises(FileNotFoundError):
        load_reference_cache_dir(str(tmp_path))


def test_spherify_poses():
    """360-capture spherification (load_llff.py:200-275 semantics): poses are
    re-centered onto a unit-ish sphere and a 120-view circular path returned."""
    from nerf_tpu.data.llff import spherify_poses

    rng = np.random.default_rng(0)
    n = 6
    poses = np.zeros((n, 3, 5), np.float32)
    for i in range(n):
        c2w = pose_spherical(i * 60.0, -30.0, 4.0)
        poses[i, :, :4] = c2w[:3, :4]
        poses[i, :, 4] = [24, 32, 30.0]
    bds = np.stack([np.full(n, 2.0), np.full(n, 6.0)], -1)
    poses_reset, new_poses, bds2 = spherify_poses(poses, bds)
    assert poses_reset.shape == (n, 3, 5)
    assert new_poses.shape == (120, 3, 5)
    # camera centers approximately unit distance from origin after rescale
    radii = np.linalg.norm(poses_reset[:, :3, 3], axis=-1)
    np.testing.assert_allclose(radii.mean(), 1.0, atol=0.1)
    # bounds rescaled by the same factor
    assert bds2.min() > 0


def _cfg_node(d):
    from nerf_tpu.config import CfgNode

    return CfgNode(d)


def test_resolve_render_poses_blender_dataset(blender_dir):
    """Shared eval/serve pose resolver (data/eval_poses.py): dataset-backed
    blender scenes give the 40-pose orbit for 'render' and the split's own
    cameras otherwise."""
    from nerf_tpu.data.eval_poses import resolve_render_poses

    cfg = _cfg_node({"dataset": {
        "type": "blender", "basedir": blender_dir,
        "half_res": False, "testskip": 1,
    }})
    poses, h, w, focal = resolve_render_poses(cfg, "render")
    assert poses.shape[0] == 40 and poses.shape[-2:] >= (3, 4)
    assert (h, w) == (8, 8) and focal > 0
    val_poses, *_ = resolve_render_poses(cfg, "val")
    assert val_poses.shape[0] == 2  # the fixture's val split


def test_resolve_render_poses_blender_orbit_fallback():
    """No on-disk dataset: 'render' falls back to the standard orbit at
    config intrinsics; dataset splits must fail loudly (a silent orbit would
    poison metric runs downstream)."""
    from nerf_tpu.data.eval_poses import resolve_render_poses

    cfg = _cfg_node({"dataset": {
        "type": "blender", "basedir": "", "half_res": False, "testskip": 1,
        "height": 32, "width": 48,
    }})
    poses, h, w, focal = resolve_render_poses(cfg, "render")
    assert poses.shape[0] == 40 and (h, w) == (32, 48)
    with pytest.raises(ValueError, match="needs an on-disk dataset"):
        resolve_render_poses(cfg, "val")


def test_resolve_render_poses_synthetic_splits_rejected():
    from nerf_tpu.data.eval_poses import resolve_render_poses

    cfg = _cfg_node({"dataset": {"type": "synthetic", "image_size": 16}})
    poses, h, w, _ = resolve_render_poses(cfg, "render")
    assert poses.shape[0] == 40 and h == w == 16
    with pytest.raises(ValueError, match="synthetic"):
        resolve_render_poses(cfg, "test")


def test_resolve_render_poses_llff_slices_hwf_column(llff_dir):
    """LLFF spiral/holdout paths carry a (3, 5) hwf column; the resolver
    must hand consumers exactly (N, 3, 4) — serve_nerf's pose renderer
    (unlike eval_nerf's loop) does no slicing of its own (regression:
    serve_nerf crashed at startup for every LLFF scene)."""
    from nerf_tpu.data.eval_poses import resolve_render_poses

    cfg = _cfg_node({"dataset": {
        "type": "llff", "basedir": llff_dir, "downsample_factor": 1,
    }})
    for split in ("render", "val", "train"):
        poses, h, w, focal = resolve_render_poses(cfg, split)
        assert poses.shape[1:] == (3, 4), (split, poses.shape)
        assert poses.shape[0] > 0
    assert (h, w) == (12, 16) and focal > 0
