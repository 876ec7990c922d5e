"""All 7 shipped pretrained checkpoints: conversion, forward sanity, and a
vmapped multi-scene render over the 6 same-shape blender scenes with REAL
trained weights (BASELINE config 5's inference half)."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_tpu.data.poses import pose_spherical
from nerf_tpu.engine.checkpoint import load_reference_checkpoint
from nerf_tpu.engine.renderer import RenderSettings, render_rays
from nerf_tpu.models import FlexibleNeRFModel
from nerf_tpu.ops import get_ray_bundle

PRETRAINED_DIR = "/root/reference/pretrained"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(PRETRAINED_DIR), reason="pretrained checkpoints absent"
)

BLENDER_SCENES = ["chair", "drums", "hotdog", "lego", "materials", "ship"]


def _ckpt_path(scene):
    return glob.glob(os.path.join(PRETRAINED_DIR, f"{scene}-lowres", "*.ckpt"))[0]


def test_all_seven_checkpoints_convert_and_forward():
    """Every shipped checkpoint converts and produces finite radiance values,
    including fern's different encoding config (39-dim xyz = 6 fns)."""
    for scene in BLENDER_SCENES + ["fern"]:
        ckpt = load_reference_checkpoint(_ckpt_path(scene))
        n_xyz = 6 if scene == "fern" else 10
        model = FlexibleNeRFModel(num_encoding_fn_xyz=n_xyz, num_encoding_fn_dir=4)
        params = jax.tree.map(jnp.asarray, ckpt["params_fine"])
        assert params["layer1"]["kernel"].shape == (model.dim_xyz, 128), scene
        out = model.apply(params, jnp.ones((4, model.input_dim)) * 0.3)
        assert np.isfinite(np.asarray(out)).all(), scene
        assert ckpt["psnr"] is not None and ckpt["psnr"] > 15.0, scene


@pytest.mark.slow
def test_vmapped_multiscene_render_real_weights():
    """Render the same pose through all 6 blender checkpoints as ONE vmapped
    program — multi-scene inference on real weights."""
    model = FlexibleNeRFModel(num_encoding_fn_xyz=10, num_encoding_fn_dir=4)
    coarse, fine = [], []
    for scene in BLENDER_SCENES:
        ckpt = load_reference_checkpoint(_ckpt_path(scene))
        coarse.append(ckpt["params_coarse"])
        fine.append(ckpt["params_fine"])
    stack = lambda trees: jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
    pc, pf = stack(coarse), stack(fine)

    H = W = 16
    focal = 0.5 * W / np.tan(0.5 * 0.6911112070083618)
    ro, rd = get_ray_bundle(H, W, focal, jnp.asarray(pose_spherical(45.0, -30.0, 4.0)))
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
    settings = RenderSettings(
        num_coarse=24, num_fine=24, perturb=False, white_background=True,
        near=2.0, far=6.0, num_encoding_fn_xyz=10, num_encoding_fn_dir=4,
    )

    def render_one(pc_s, pf_s):
        return render_rays(model, pc_s, model, pf_s, ro, rd, settings, None).fine.rgb

    rgbs = jax.vmap(render_one)(pc, pf)
    assert rgbs.shape == (len(BLENDER_SCENES), H * W, 3)
    rgbs = np.asarray(rgbs)
    assert np.isfinite(rgbs).all()
    # different scenes -> visibly different center crops
    centers = rgbs.reshape(len(BLENDER_SCENES), H, W, 3)[:, 6:10, 6:10].mean((1, 2, 3))
    assert len(np.unique(np.round(centers, 3))) >= 4
