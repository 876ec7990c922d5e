"""Scalar / elementwise math primitives.

Behavioral parity targets (reference: krrish94/nerf-pytorch):
  - ``img2mse``            -> nerf/nerf_helpers.py:9
  - ``mse2psnr``           -> nerf/nerf_helpers.py:13 (clamps an exactly-zero MSE to 1e-5)
  - ``cumprod_exclusive``  -> nerf/nerf_helpers.py:43 (TF-style exclusive cumprod along dim=-1)

All functions are pure jnp and safe under ``jax.jit`` / ``jax.grad`` / ``vmap``.
"""

from __future__ import annotations

import jax.numpy as jnp


def img2mse(img_src: jnp.ndarray, img_tgt: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error between a synthesized and a target image (or ray batch)."""
    diff = img_src - img_tgt
    return jnp.mean(diff * diff)


def mse2psnr(mse) -> jnp.ndarray:
    """PSNR (dB) from an MSE value.

    The reference clamps an exactly-zero MSE to 1e-5 before taking the log
    (nerf/nerf_helpers.py:14-16); we additionally guard against negative
    rounding noise with a tiny floor so the log never sees <= 0.
    """
    mse = jnp.asarray(mse)
    mse = jnp.where(mse <= 0.0, 1e-5, mse)
    return -10.0 * jnp.log10(mse)


def cumprod_exclusive(x: jnp.ndarray) -> jnp.ndarray:
    """Exclusive cumulative product along the last axis.

    ``out[..., i] = prod(x[..., :i])`` with ``out[..., 0] = 1``.

    The reference emulates ``tf.math.cumprod(..., exclusive=True)`` with a
    cumprod + roll + overwrite (nerf/nerf_helpers.py:54-64). On TPU we express
    it as a single padded cumprod so XLA lowers it to one associative scan —
    no scatter, no roll.
    """
    ones = jnp.ones_like(x[..., :1])
    return jnp.cumprod(jnp.concatenate([ones, x[..., :-1]], axis=-1), axis=-1)
