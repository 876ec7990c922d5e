"""Fused Pallas compositing kernel vs the XLA volume renderer (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_tpu.ops import volume_render_radiance_field
from nerf_tpu.ops.pallas.composite import fused_volume_render


@pytest.mark.parametrize("white_background", [False, True])
def test_fused_composite_matches_xla(rng, white_background):
    n, s = 70, 16  # n not a tile multiple -> padding path
    rf = rng.standard_normal((n, s, 4)).astype(np.float32) * 2
    z = np.sort(rng.uniform(2, 6, (n, s)).astype(np.float32), -1)
    rd = rng.standard_normal((n, 3)).astype(np.float32)

    ref = volume_render_radiance_field(
        jnp.asarray(rf), jnp.asarray(z), jnp.asarray(rd),
        white_background=white_background,
    )
    out = fused_volume_render(
        jnp.asarray(rf), jnp.asarray(z), jnp.asarray(rd),
        white_background=white_background, rays_per_tile=32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out["rgb"]), np.asarray(ref.rgb), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["weights"]), np.asarray(ref.weights), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["acc"]), np.asarray(ref.acc), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["depth"]), np.asarray(ref.depth), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["disp"]), np.asarray(ref.disp), rtol=1e-3, atol=1e-4)
