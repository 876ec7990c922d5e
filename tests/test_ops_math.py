"""Golden-value tests for nerf_tpu.ops.math against independent numpy specs."""

import jax.numpy as jnp
import numpy as np

from nerf_tpu.ops import cumprod_exclusive, img2mse, mse2psnr


def test_img2mse(rng):
    a = rng.standard_normal((7, 3)).astype(np.float32)
    b = rng.standard_normal((7, 3)).astype(np.float32)
    expected = np.mean((a - b) ** 2)
    np.testing.assert_allclose(img2mse(jnp.array(a), jnp.array(b)), expected, rtol=1e-6)


def test_mse2psnr_matches_log10_formula():
    np.testing.assert_allclose(mse2psnr(0.01), -10.0 * np.log10(0.01), rtol=1e-6)
    # Reference clamps exact zero to 1e-5 (nerf_helpers.py:14-16) -> 50 dB.
    np.testing.assert_allclose(mse2psnr(0.0), 50.0, rtol=1e-6)


def test_cumprod_exclusive_matches_tf_semantics(rng):
    x = rng.uniform(0.1, 2.0, size=(4, 6)).astype(np.float32)
    out = np.asarray(cumprod_exclusive(jnp.array(x)))
    # Spec: out[..., i] = prod(x[..., :i]), out[..., 0] = 1.
    expected = np.ones_like(x)
    for i in range(1, x.shape[-1]):
        expected[:, i] = np.prod(x[:, :i], axis=-1)
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_cumprod_exclusive_gradient_flows():
    import jax

    x = jnp.array([[0.5, 0.8, 0.9]])
    g = jax.grad(lambda t: jnp.sum(cumprod_exclusive(t)))(x)
    # d/dx0 [1 + x0 + x0*x1] = 1 + x1
    np.testing.assert_allclose(g[0, 0], 1.0 + 0.8, rtol=1e-6)
