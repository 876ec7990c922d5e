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


def _torch_full_pipeline(sd_coarse, sd_fine, ro, rd):
    """Executable spec of predict_and_render_radiance (train_utils.py:28-127),
    deterministic mode, from state dicts."""
    t_vals = torch.linspace(0.0, 1.0, NUM_COARSE)
    z = NEAR * (1.0 - t_vals) + FAR * t_vals
    z = z.expand(ro.shape[0], NUM_COARSE).contiguous()

    viewdirs = rd / rd.norm(dim=-1, keepdim=True)

    def run(sd, zv):
        pts = ro[:, None, :] + rd[:, None, :] * zv[..., None]
        xyz_enc = _torch_encode(pts, N_XYZ)
        dir_enc = _torch_encode(viewdirs, N_DIR)[:, None, :].expand(
            pts.shape[0], pts.shape[1], -1
        )
        return _torch_mlp(sd, xyz_enc, dir_enc)

    rgb_coarse, weights = _torch_volume_render(run(sd_coarse, z), z, rd)

    z_mid = 0.5 * (z[..., 1:] + z[..., :-1])
    z_samples = _torch_sample_pdf_det(z_mid, weights[..., 1:-1], NUM_FINE)
    z_all, _ = torch.sort(torch.cat([z, z_samples], -1), -1)
    rgb_fine, _ = _torch_volume_render(run(sd_fine, z_all), z_all, rd)
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
