"""Tests for the volume renderer: numpy golden spec + physical properties."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.ops import volume_render_radiance_field


def _numpy_volume_render(rf, z, rd, white_background=False):
    """Independent numpy spec of alpha compositing
    (reference nerf/volume_rendering_utils.py:6-53, no noise)."""
    dists = np.concatenate([z[..., 1:] - z[..., :-1], np.full_like(z[..., :1], 1e10)], -1)
    dists = dists * np.linalg.norm(rd, axis=-1, keepdims=True)
    rgb = 1.0 / (1.0 + np.exp(-rf[..., :3]))
    sigma = np.maximum(rf[..., 3], 0.0)
    alpha = 1.0 - np.exp(-sigma * dists)
    trans = np.cumprod(np.concatenate([np.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], -1), -1)[..., :-1]
    weights = alpha * trans
    rgb_map = (weights[..., None] * rgb).sum(-2)
    depth = (weights * z).sum(-1)
    acc = weights.sum(-1)
    disp = 1.0 / np.maximum(1e-10, depth / acc)
    if white_background:
        rgb_map = rgb_map + (1.0 - acc[..., None])
    return rgb_map, disp, acc, weights, depth


def test_volume_render_matches_numpy_spec(rng):
    n_rays, n_samples = 8, 16
    rf = rng.standard_normal((n_rays, n_samples, 4)).astype(np.float32)
    z = np.sort(rng.uniform(2, 6, (n_rays, n_samples)).astype(np.float32), -1)
    rd = rng.standard_normal((n_rays, 3)).astype(np.float32)

    out = volume_render_radiance_field(jnp.array(rf), jnp.array(z), jnp.array(rd))
    ergb, edisp, eacc, ew, edepth = _numpy_volume_render(rf, z, rd)
    np.testing.assert_allclose(np.asarray(out.rgb), ergb, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.acc), eacc, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.weights), ew, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.depth), edepth, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.disp), edisp, rtol=1e-3, atol=1e-4)


def test_white_background(rng):
    rf = np.full((4, 8, 4), -100.0, dtype=np.float32)  # sigma ~ 0 after relu
    rf[..., 3] = -100.0
    z = np.broadcast_to(np.linspace(2, 6, 8, dtype=np.float32), (4, 8)).copy()
    rd = np.tile(np.array([0.0, 0.0, -1.0], np.float32), (4, 1))
    out = volume_render_radiance_field(
        jnp.array(rf), jnp.array(z), jnp.array(rd), white_background=True
    )
    # empty space on white background -> pure white
    np.testing.assert_allclose(np.asarray(out.rgb), 1.0, atol=1e-5)


def test_weights_properties(rng):
    rf = rng.standard_normal((32, 64, 4)).astype(np.float32) * 2
    z = np.sort(rng.uniform(2, 6, (32, 64)).astype(np.float32), -1)
    rd = rng.standard_normal((32, 3)).astype(np.float32)
    out = volume_render_radiance_field(jnp.array(rf), jnp.array(z), jnp.array(rd))
    w = np.asarray(out.weights)
    assert (w >= 0).all()
    assert (w.sum(-1) <= 1.0 + 1e-4).all()


def test_noise_is_keyed_and_reproducible():
    rf = jnp.zeros((4, 8, 4))
    z = jnp.broadcast_to(jnp.linspace(2, 6, 8), (4, 8))
    rd = jnp.ones((4, 3))
    k = jax.random.PRNGKey(1)
    a = volume_render_radiance_field(rf, z, rd, radiance_field_noise_std=1.0, noise_key=k)
    b = volume_render_radiance_field(rf, z, rd, radiance_field_noise_std=1.0, noise_key=k)
    c = volume_render_radiance_field(
        rf, z, rd, radiance_field_noise_std=1.0, noise_key=jax.random.PRNGKey(2)
    )
    np.testing.assert_array_equal(np.asarray(a.rgb), np.asarray(b.rgb))
    assert not np.allclose(np.asarray(a.rgb), np.asarray(c.rgb))


def test_gradients_flow_through_renderer():
    def loss(rf):
        out = volume_render_radiance_field(
            rf, jnp.broadcast_to(jnp.linspace(2, 6, 8), (4, 8)), jnp.ones((4, 3))
        )
        return jnp.sum(out.rgb)

    g = jax.grad(loss)(jnp.ones((4, 8, 4)))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
