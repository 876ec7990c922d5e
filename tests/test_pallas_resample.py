"""Pallas fused inverse-CDF resampling vs the XLA sampler and the torch spec
(interpret mode on CPU; real-TPU parity is covered by the tpu-marked test)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_tpu.ops.pallas.resample import fused_sample_pdf
from nerf_tpu.ops.sampling import sample_pdf


@pytest.mark.parametrize("n,m,s", [(64, 32, 64), (100, 63, 128), (7, 16, 8)])
def test_matches_xla_sampler_det(rng, n, m, s):
    z = np.sort(rng.uniform(2.0, 6.0, (n, m)).astype(np.float32), axis=-1)
    w = rng.uniform(0.0, 1.0, (n, m - 1)).astype(np.float32)
    w[0, :] = 0.0  # degenerate all-zero weights ray (floor path)
    want = sample_pdf(jnp.asarray(z), jnp.asarray(w), s, det=True)
    got = fused_sample_pdf(
        jnp.asarray(z), jnp.asarray(w), s, det=True, rays_per_tile=32,
        interpret=True,
    )
    # atol 2e-4: the kernel's matmul prefix sum reassociates vs cumsum, which
    # can flip a <= compare exactly at a CDF knot; the interpolation is
    # continuous there, so the sample moves by O(ulp * bin width) only.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=2e-4)


def test_matches_xla_sampler_stochastic(rng):
    n, m, s = 48, 32, 64
    z = np.sort(rng.uniform(2.0, 6.0, (n, m)).astype(np.float32), axis=-1)
    w = rng.uniform(0.0, 1.0, (n, m - 1)).astype(np.float32)
    key = jax.random.PRNGKey(3)
    want = sample_pdf(jnp.asarray(z), jnp.asarray(w), s, key=key, det=False)
    got = fused_sample_pdf(
        jnp.asarray(z), jnp.asarray(w), s, key=key, det=False,
        rays_per_tile=16, interpret=True,
    )
    # Same key -> same u draw (same shape/dtype/order) -> identical samples.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_matches_torch_searchsorted_spec(rng):
    """Directly against a torch.searchsorted executable spec of the
    reference's sample_pdf_2 (nerf_helpers.py:260-302), det mode."""
    torch = pytest.importorskip("torch")
    n, m, s = 32, 63, 128
    z = np.sort(rng.uniform(2.0, 6.0, (n, m)).astype(np.float32), axis=-1)
    w = rng.uniform(0.0, 1.0, (n, m - 1)).astype(np.float32)

    bins_t, w_t = torch.from_numpy(z), torch.from_numpy(w) + 1e-5
    pdf = w_t / w_t.sum(-1, keepdim=True)
    cdf = torch.cumsum(pdf, -1)
    cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], -1)
    u = torch.linspace(0.0, 1.0, s).expand(n, s).contiguous()
    inds = torch.searchsorted(cdf.contiguous(), u, right=True)
    below = torch.clamp(inds - 1, min=0)
    above = torch.clamp(inds, max=cdf.shape[-1] - 1)
    cdf_g = torch.stack([torch.gather(cdf, 1, below), torch.gather(cdf, 1, above)], -1)
    bins_g = torch.stack([torch.gather(bins_t, 1, below), torch.gather(bins_t, 1, above)], -1)
    denom = torch.where(
        (cdf_g[..., 1] - cdf_g[..., 0]) < 1e-5,
        torch.ones_like(cdf_g[..., 0]),
        cdf_g[..., 1] - cdf_g[..., 0],
    )
    t = (u - cdf_g[..., 0]) / denom
    want = (bins_g[..., 0] + t * (bins_g[..., 1] - bins_g[..., 0])).numpy()

    got = fused_sample_pdf(jnp.asarray(z), jnp.asarray(w), s, det=True,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_monotone_and_in_range(rng):
    n, m, s = 16, 32, 64
    z = np.sort(rng.uniform(2.0, 6.0, (n, m)).astype(np.float32), axis=-1)
    w = rng.uniform(0.0, 1.0, (n, m - 1)).astype(np.float32)
    got = np.asarray(
        fused_sample_pdf(jnp.asarray(z), jnp.asarray(w), s, det=True,
                         interpret=True)
    )
    assert (np.diff(got, axis=-1) >= -1e-6).all()  # det samples are sorted
    assert (got >= z[:, :1] - 1e-6).all() and (got <= z[:, -1:] + 1e-6).all()
