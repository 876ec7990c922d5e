"""Tests for depth sampling + hierarchical inverse-CDF resampling.

``sample_pdf`` is checked against torch's built-in ``searchsorted`` pipeline
(an executable spec of the published algorithm, replacing the reference's
external torchsearchsorted CUDA kernel) and against distribution properties.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_tpu.ops import (
    coarse_z_values,
    perturb_z_values,
    sample_pdf,
    searchsorted_right,
)


def test_coarse_z_values_linear():
    z = coarse_z_values(jnp.array([2.0]), jnp.array([6.0]), 5)
    np.testing.assert_allclose(np.asarray(z)[0], [2.0, 3.0, 4.0, 5.0, 6.0], rtol=1e-6)


def test_coarse_z_values_lindisp():
    z = np.asarray(coarse_z_values(jnp.array([1.0]), jnp.array([4.0]), 3, lindisp=True))[0]
    # uniform in inverse depth: 1/z in linspace(1, 0.25, 3)
    np.testing.assert_allclose(1.0 / z, [1.0, 0.625, 0.25], rtol=1e-6)


def test_perturb_stays_in_bins():
    key = jax.random.PRNGKey(0)
    z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 64), (128, 64))
    zp = np.asarray(perturb_z_values(key, z))
    z = np.asarray(z)
    mids = 0.5 * (z[:, 1:] + z[:, :-1])
    lower = np.concatenate([z[:, :1], mids], -1)
    upper = np.concatenate([mids, z[:, -1:]], -1)
    assert (zp >= lower - 1e-6).all() and (zp <= upper + 1e-6).all()
    # strictly increasing along each ray (bins are disjoint)
    assert (np.diff(zp, axis=-1) > 0).all()


def test_searchsorted_right_matches_numpy(rng):
    seq = np.sort(rng.uniform(0, 1, (6, 17)).astype(np.float32), axis=-1)
    vals = rng.uniform(-0.1, 1.1, (6, 9)).astype(np.float32)
    out = np.asarray(searchsorted_right(jnp.array(seq), jnp.array(vals)))
    expected = np.stack(
        [np.searchsorted(seq[i], vals[i], side="right") for i in range(6)]
    )
    np.testing.assert_array_equal(out, expected)


def _torch_sample_pdf(bins, weights, num_samples, u):
    """Executable spec of reference sample_pdf_2 (nerf/nerf_helpers.py:260-302)
    using torch's built-in searchsorted in place of the CUDA extension."""
    import torch

    bins = torch.from_numpy(bins)
    weights = torch.from_numpy(weights) + 1e-5
    pdf = weights / torch.sum(weights, dim=-1, keepdim=True)
    cdf = torch.cumsum(pdf, dim=-1)
    cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], dim=-1)
    u = torch.from_numpy(u)
    inds = torch.searchsorted(cdf.contiguous(), u.contiguous(), right=True)
    below = torch.clamp(inds - 1, min=0)
    above = torch.clamp(inds, max=cdf.shape[-1] - 1)
    cdf_g = torch.stack([torch.gather(cdf, -1, below), torch.gather(cdf, -1, above)], -1)
    bins_g = torch.stack([torch.gather(bins, -1, below), torch.gather(bins, -1, above)], -1)
    denom = cdf_g[..., 1] - cdf_g[..., 0]
    denom = torch.where(denom < 1e-5, torch.ones_like(denom), denom)
    t = (u - cdf_g[..., 0]) / denom
    return (bins_g[..., 0] + t * (bins_g[..., 1] - bins_g[..., 0])).numpy()


@pytest.mark.parametrize("det", [True, False])
def test_sample_pdf_matches_torch_spec(rng, det):
    num_rays, num_bins, num_samples = 16, 31, 25
    bins = np.sort(rng.uniform(2.0, 6.0, (num_rays, num_bins)).astype(np.float32), -1)
    weights = rng.uniform(0.0, 1.0, (num_rays, num_bins - 1)).astype(np.float32)
    # zero out some rows to hit the +1e-5 floor / denom guard paths
    weights[0] = 0.0
    weights[1, :5] = 0.0

    if det:
        samples = np.asarray(sample_pdf(jnp.array(bins), jnp.array(weights), num_samples, det=True))
        u = np.broadcast_to(
            np.linspace(0.0, 1.0, num_samples, dtype=np.float32), (num_rays, num_samples)
        ).copy()
    else:
        key = jax.random.PRNGKey(3)
        samples = np.asarray(
            sample_pdf(jnp.array(bins), jnp.array(weights), num_samples, key=key, det=False)
        )
        # replay the same uniforms through the torch spec
        u = np.asarray(jax.random.uniform(key, (num_rays, num_samples), dtype=jnp.float32))

    expected = _torch_sample_pdf(bins, weights, num_samples, u)
    np.testing.assert_allclose(samples, expected, rtol=1e-4, atol=1e-5)


def test_sample_pdf_concentrates_mass(rng):
    # Put all weight in one bin; samples must land inside it.
    bins = np.linspace(0.0, 1.0, 11, dtype=np.float32)[None].repeat(4, 0)
    weights = np.zeros((4, 10), dtype=np.float32)
    weights[:, 7] = 100.0
    samples = np.asarray(sample_pdf(jnp.array(bins), jnp.array(weights), 64, det=True))
    inside = (samples >= bins[0, 7] - 1e-3) & (samples <= bins[0, 8] + 1e-3)
    assert inside.mean() > 0.95


def test_sample_pdf_batched_leading_dims(rng):
    bins = np.sort(rng.uniform(0, 1, (2, 3, 9)).astype(np.float32), -1)
    weights = rng.uniform(0, 1, (2, 3, 8)).astype(np.float32)
    out = sample_pdf(jnp.array(bins), jnp.array(weights), 5, det=True)
    assert out.shape == (2, 3, 5)
