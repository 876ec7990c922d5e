"""Full-pipeline golden test: the hierarchical coarse->fine render vs an
independent torch-functional executable spec (same weights, deterministic
mode). Locks the ENTIRE render path numerically — z-value generation, MLP,
compositing, inverse-CDF resampling, sort/merge, fine pass — not just
individual ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from nerf_tpu.engine.checkpoint import to_torch_state_dict
from nerf_tpu.engine.renderer import RenderSettings, render_rays
from nerf_tpu.models import FlexibleNeRFModel

NUM_COARSE, NUM_FINE = 16, 16
NEAR, FAR = 2.0, 6.0
N_XYZ, N_DIR = 6, 4


def _torch_encode(x, num_freq):
    feats = [x]
    for i in range(num_freq):
        feats.append(torch.sin(x * (2.0 ** i)))
        feats.append(torch.cos(x * (2.0 ** i)))
    return torch.cat(feats, -1)


def _torch_mlp(sd, xyz_enc, dir_enc):
    """Default FlexibleNeRF forward from a state dict (models.py:233-254 spec)."""
    import torch.nn.functional as F

    def lin(name, v):
        return F.linear(v, sd[f"{name}.weight"], sd[f"{name}.bias"])

    h = lin("layer1", xyz_enc)
    for i in range(3):
        h = F.relu(lin(f"layers_xyz.{i}", h))
    feat = F.relu(lin("fc_feat", h))
    alpha = lin("fc_alpha", h)
    h = torch.cat([feat, dir_enc], -1)
    h = F.relu(lin("layers_dir.0", h))
    rgb = lin("fc_rgb", h)
    return torch.cat([rgb, alpha], -1)


def _torch_volume_render(rf, z, rd):
    dists = torch.cat(
        [z[..., 1:] - z[..., :-1], torch.full_like(z[..., :1], 1e10)], -1
    )
    dists = dists * rd.norm(dim=-1, keepdim=True)
    rgb = torch.sigmoid(rf[..., :3])
    sigma = torch.relu(rf[..., 3])
    alpha = 1.0 - torch.exp(-sigma * dists)
    one_m = 1.0 - alpha + 1e-10
    trans = torch.cumprod(torch.cat([torch.ones_like(one_m[..., :1]), one_m], -1), -1)[..., :-1]
    weights = alpha * trans
    return (weights[..., None] * rgb).sum(-2), weights


def _torch_sample_pdf_det(bins, weights, n):
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdim=True)
    cdf = torch.cumsum(pdf, -1)
    cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], -1)
    u = torch.linspace(0.0, 1.0, n).expand(list(cdf.shape[:-1]) + [n]).contiguous()
    inds = torch.searchsorted(cdf.contiguous(), u, right=True)
    below = torch.clamp(inds - 1, min=0)
    above = torch.clamp(inds, max=cdf.shape[-1] - 1)
    cdf_g = torch.stack([torch.gather(cdf, -1, below), torch.gather(cdf, -1, above)], -1)
    bins_g = torch.stack([torch.gather(bins, -1, below), torch.gather(bins, -1, above)], -1)
    denom = torch.where(
        cdf_g[..., 1] - cdf_g[..., 0] < 1e-5,
        torch.ones_like(cdf_g[..., 0]),
        cdf_g[..., 1] - cdf_g[..., 0],
    )
    t = (u - cdf_g[..., 0]) / denom
    return bins_g[..., 0] + t * (bins_g[..., 1] - bins_g[..., 0])


def _torch_ndc(h, w, focal, near, ro, rd):
    """Executable spec of ndc_rays (nerf_helpers.py:170-197)."""
    t = -(near + ro[..., 2]) / rd[..., 2]
    ro = ro + t[..., None] * rd
    o0 = -1.0 / (w / (2.0 * focal)) * ro[..., 0] / ro[..., 2]
    o1 = -1.0 / (h / (2.0 * focal)) * ro[..., 1] / ro[..., 2]
    o2 = 1.0 + 2.0 * near / ro[..., 2]
    d0 = -1.0 / (w / (2.0 * focal)) * (rd[..., 0] / rd[..., 2] - ro[..., 0] / ro[..., 2])
    d1 = -1.0 / (h / (2.0 * focal)) * (rd[..., 1] / rd[..., 2] - ro[..., 1] / ro[..., 2])
    d2 = -2.0 * near / ro[..., 2]
    return torch.stack([o0, o1, o2], -1), torch.stack([d0, d1, d2], -1)


def _torch_full_pipeline(
    sd_coarse, sd_fine, ro, rd,
    num_coarse=NUM_COARSE, num_fine=NUM_FINE, near=NEAR, far=FAR,
    n_xyz=N_XYZ, n_dir=N_DIR, white_background=False, ndc_hwf=None,
):
    """Executable spec of predict_and_render_radiance (train_utils.py:28-127),
    deterministic mode, from state dicts. ``ndc_hwf=(H, W, focal)`` applies
    the NDC transform (viewdirs from the PRE-NDC directions, near/far = 0/1 —
    train_utils.py:143-163)."""
    viewdirs = rd / rd.norm(dim=-1, keepdim=True)
    if ndc_hwf is not None:
        h_, w_, f_ = ndc_hwf
        ro, rd = _torch_ndc(h_, w_, f_, 1.0, ro, rd)

    t_vals = torch.linspace(0.0, 1.0, num_coarse)
    z = near * (1.0 - t_vals) + far * t_vals
    z = z.expand(ro.shape[0], num_coarse).contiguous()

    def run(sd, zv):
        pts = ro[:, None, :] + rd[:, None, :] * zv[..., None]
        xyz_enc = _torch_encode(pts, n_xyz)
        dir_enc = _torch_encode(viewdirs, n_dir)[:, None, :].expand(
            pts.shape[0], pts.shape[1], -1
        )
        return _torch_mlp(sd, xyz_enc, dir_enc)

    def composite(rf, zv):
        rgb, weights = _torch_volume_render(rf, zv, rd)
        if white_background:
            rgb = rgb + (1.0 - weights.sum(-1, keepdim=True))
        return rgb, weights

    rgb_coarse, weights = composite(run(sd_coarse, z), z)

    z_mid = 0.5 * (z[..., 1:] + z[..., :-1])
    z_samples = _torch_sample_pdf_det(z_mid, weights[..., 1:-1], num_fine)
    z_all, _ = torch.sort(torch.cat([z, z_samples], -1), -1)
    rgb_fine, _ = composite(run(sd_fine, z_all), z_all)
    return rgb_coarse, rgb_fine


def test_full_hierarchical_render_matches_torch_spec(rng):
    model = FlexibleNeRFModel(num_encoding_fn_xyz=N_XYZ, num_encoding_fn_dir=N_DIR)
    pc = model.init(jax.random.PRNGKey(0))
    pf = model.init(jax.random.PRNGKey(1))

    n = 64
    ro = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    rd = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    rd[:, 2] -= 1.5

    settings = RenderSettings(
        num_coarse=NUM_COARSE, num_fine=NUM_FINE, perturb=False,
        radiance_field_noise_std=0.0, white_background=False,
        near=NEAR, far=FAR,
        num_encoding_fn_xyz=N_XYZ, num_encoding_fn_dir=N_DIR,
    )
    out = render_rays(
        model, pc, model, pf, jnp.asarray(ro), jnp.asarray(rd), settings, None
    )

    sd_c = {k: torch.from_numpy(np.asarray(v)) for k, v in to_torch_state_dict(pc).items()}
    sd_f = {k: torch.from_numpy(np.asarray(v)) for k, v in to_torch_state_dict(pf).items()}
    rgb_c, rgb_f = _torch_full_pipeline(sd_c, sd_f, torch.from_numpy(ro), torch.from_numpy(rd))

    np.testing.assert_allclose(
        np.asarray(out.coarse.rgb), rgb_c.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.fine.rgb), rgb_f.numpy(), rtol=1e-4, atol=1e-4
    )


# ---------------------------------------------------------------------------
# Quantitative image-scale parity on REAL pretrained weights (VERDICT r1
# item 4): render a full image through our pipeline and through the torch
# executable spec from the same converted checkpoint; they must agree to
# > 40 dB PSNR (in practice ~bit-exact modulo op ordering).
# ---------------------------------------------------------------------------

import os

from nerf_tpu.data import pose_spherical
from nerf_tpu.engine.checkpoint import load_reference_checkpoint
from nerf_tpu.engine.renderer import make_image_render_fn
from nerf_tpu.ops import get_ray_bundle
from nerf_tpu.utils import psnr

LEGO_CKPT = "/root/reference/pretrained/lego-lowres/checkpoint199999.ckpt"
FERN_CKPT = "/root/reference/pretrained/fern-lowres/checkpoint249999.ckpt"


def _sd(params):
    return {
        k: torch.from_numpy(np.asarray(v))
        for k, v in to_torch_state_dict(params).items()
    }


@pytest.mark.skipif(not os.path.exists(LEGO_CKPT), reason="pretrained absent")
def test_pretrained_lego_image_parity_psnr():
    """Lego-lowres at image scale, full protocol (64+64, white bg)."""
    ckpt = load_reference_checkpoint(LEGO_CKPT)
    model = FlexibleNeRFModel(num_encoding_fn_xyz=10, num_encoding_fn_dir=4)
    pc = jax.tree.map(jnp.asarray, ckpt["params_coarse"])
    pf = jax.tree.map(jnp.asarray, ckpt["params_fine"])

    h = w = 64
    focal = 0.5 * w / np.tan(0.5 * 0.6911112070083618)
    settings = RenderSettings(
        num_coarse=64, num_fine=64, perturb=False, white_background=True,
        near=2.0, far=6.0, num_encoding_fn_xyz=10, num_encoding_fn_dir=4,
        chunksize=h * w,
    )
    render = make_image_render_fn(model, model, settings)
    pose = jnp.asarray(pose_spherical(45.0, -30.0, 4.0))
    ro, rd = get_ray_bundle(h, w, focal, pose)
    ours = np.asarray(render(pc, pf, ro, rd)["rgb_fine"])

    ro_t = torch.from_numpy(np.asarray(ro).reshape(-1, 3).copy())
    rd_t = torch.from_numpy(np.asarray(rd).reshape(-1, 3).copy())
    _, rgb_f = _torch_full_pipeline(
        _sd(ckpt["params_coarse"]), _sd(ckpt["params_fine"]), ro_t, rd_t,
        num_coarse=64, num_fine=64, near=2.0, far=6.0, n_xyz=10, n_dir=4,
        white_background=True,
    )
    spec = rgb_f.numpy().reshape(h, w, 3)
    p = float(psnr(ours, spec))
    assert p > 40.0, f"lego image parity PSNR {p:.1f} dB"


@pytest.mark.skipif(not os.path.exists(FERN_CKPT), reason="pretrained absent")
def test_pretrained_fern_ndc_image_parity_psnr():
    """Fern-lowres at image scale through the NDC path (64+128, near 0/far 1)
    — the NDC pipeline's only real-weights coverage."""
    ckpt = load_reference_checkpoint(FERN_CKPT)
    model = FlexibleNeRFModel(num_encoding_fn_xyz=6, num_encoding_fn_dir=4)
    pc = jax.tree.map(jnp.asarray, ckpt["params_coarse"])
    pf = jax.tree.map(jnp.asarray, ckpt["params_fine"])

    # Fern-lowres intrinsics at factor 16 (H 189, W 252, f ~203) scaled to a
    # CPU-friendly size; a forward-facing pose like LLFF's recentered cameras.
    h, w, focal = 48, 63, 50.0
    settings = RenderSettings(
        num_coarse=64, num_fine=128, perturb=False, white_background=False,
        near=0.0, far=1.0, use_ndc=True, height=h, width=w, focal_length=focal,
        num_encoding_fn_xyz=6, num_encoding_fn_dir=4, chunksize=h * w,
    )
    render = make_image_render_fn(model, model, settings)
    c2w = jnp.asarray(
        [[1.0, 0.0, 0.0, 0.05], [0.0, 1.0, 0.0, -0.02], [0.0, 0.0, 1.0, 0.1]]
    )
    ro, rd = get_ray_bundle(h, w, focal, c2w)
    out = render(pc, pf, ro, rd)
    ours = np.asarray(out["rgb_fine"])

    ro_t = torch.from_numpy(np.asarray(ro).reshape(-1, 3).copy())
    rd_t = torch.from_numpy(np.asarray(rd).reshape(-1, 3).copy())
    _, rgb_f = _torch_full_pipeline(
        _sd(ckpt["params_coarse"]), _sd(ckpt["params_fine"]), ro_t, rd_t,
        num_coarse=64, num_fine=128, near=0.0, far=1.0, n_xyz=6, n_dir=4,
        white_background=False, ndc_hwf=(h, w, focal),
    )
    spec = rgb_f.numpy().reshape(h, w, 3)
    assert np.isfinite(ours).all()
    # The render must be a real image, not degenerate.
    assert ours.std() > 0.05
    p = float(psnr(ours, spec))
    assert p > 40.0, f"fern NDC image parity PSNR {p:.1f} dB"
