"""Render-quality regression against the shipped pretrained lego checkpoint:
the converted weights must produce a structurally-correct image (object in
frame on a white background, lego-yellow dominant) through the full pipeline.
Runs at low resolution on CPU — the strongest end-to-end check available
without the original datasets."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_tpu.data import pose_spherical
from nerf_tpu.engine.checkpoint import load_reference_checkpoint
from nerf_tpu.engine.renderer import RenderSettings, make_image_render_fn
from nerf_tpu.models import FlexibleNeRFModel
from nerf_tpu.ops import get_ray_bundle

PRETRAINED = "/root/reference/pretrained/lego-lowres/checkpoint199999.ckpt"


@pytest.mark.skipif(not os.path.exists(PRETRAINED), reason="pretrained ckpt absent")
def test_pretrained_lego_renders_correct_structure():
    ckpt = load_reference_checkpoint(PRETRAINED)
    model = FlexibleNeRFModel(num_encoding_fn_xyz=10, num_encoding_fn_dir=4)
    pc = jax.tree.map(jnp.asarray, ckpt["params_coarse"])
    pf = jax.tree.map(jnp.asarray, ckpt["params_fine"])

    H = W = 40
    focal = 0.5 * W / np.tan(0.5 * 0.6911112070083618)
    settings = RenderSettings(
        num_coarse=32, num_fine=32, perturb=False, white_background=True,
        near=2.0, far=6.0, num_encoding_fn_xyz=10, num_encoding_fn_dir=4,
        chunksize=H * W,
    )
    render = make_image_render_fn(model, model, settings)
    pose = jnp.asarray(pose_spherical(45.0, -30.0, 4.0))
    ro, rd = get_ray_bundle(H, W, focal, pose)
    maps = render(pc, pf, ro, rd)
    img = np.asarray(maps["rgb_fine"])
    acc = np.asarray(maps["acc_fine"])

    assert np.isfinite(img).all()
    # white background at the corners (empty space)
    corners = np.stack([img[0, 0], img[0, -1], img[-1, 0]])
    assert corners.mean() > 0.95
    # the bulldozer occupies the center: opaque and lego-yellow (R,G >> B)
    center = img[H // 3 : 2 * H // 3, W // 3 : 2 * W // 3]
    assert acc[H // 3 : 2 * H // 3, W // 3 : 2 * W // 3].mean() > 0.6
    assert center[..., 0].mean() > center[..., 2].mean() + 0.05
    assert center[..., 1].mean() > center[..., 2].mean() + 0.02
    # object boundary exists: meaningful variance in the image
    assert img.std() > 0.1


@pytest.mark.skipif(not os.path.exists(PRETRAINED), reason="pretrained ckpt absent")
def test_exported_checkpoint_schema_matches_reference():
    """Exported .ckpt files must carry exactly the reference's state-dict key
    set and shapes so the reference's own eval tooling accepts them."""
    import torch

    from nerf_tpu.engine.checkpoint import export_reference_checkpoint

    ref = torch.load(PRETRAINED, map_location="cpu", weights_only=True)
    ckpt = load_reference_checkpoint(PRETRAINED)

    out_path = "/tmp/export_schema_check.ckpt"
    export_reference_checkpoint(
        out_path,
        step=123,
        params_coarse=ckpt["params_coarse"],
        params_fine=ckpt["params_fine"],
        loss=0.1,
        psnr=20.0,
    )
    exported = torch.load(out_path, map_location="cpu", weights_only=True)
    assert set(exported.keys()) >= {
        "iter", "model_coarse_state_dict", "model_fine_state_dict",
        "optimizer_state_dict", "loss", "psnr",
    }
    for part in ("model_coarse_state_dict", "model_fine_state_dict"):
        assert set(exported[part].keys()) == set(ref[part].keys())
        for k in ref[part]:
            assert tuple(exported[part][k].shape) == tuple(ref[part][k].shape), k
