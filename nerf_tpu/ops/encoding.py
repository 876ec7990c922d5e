"""Sinusoidal positional encoding.

Behavioral parity targets (reference: krrish94/nerf-pytorch):
  - ``positional_encoding``     -> nerf/nerf_helpers.py:113
  - ``get_embedding_function``  -> nerf/nerf_helpers.py:160

Feature layout matches the reference exactly: ``[x, sin(f0*x), cos(f0*x),
sin(f1*x), cos(f1*x), ...]`` where each sin/cos block spans the full input
channel dimension (the reference appends whole-tensor sin then cos per
frequency, nerf/nerf_helpers.py:149-151). Checkpoint-converted weights depend
on this ordering.

TPU notes: the encoding is expressed as one broadcasted multiply + sin/cos +
reshape rather than a Python loop of concatenations — a single fused VPU
kernel under jit, and the same math the Pallas fused-MLP kernel reproduces
on-chip (nerf_tpu/ops/pallas/mlp.py).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp


def encoding_dim(num_channels: int, num_encoding_functions: int, include_input: bool = True) -> int:
    """Output feature dimension of ``positional_encoding``."""
    base = num_channels if include_input else 0
    if num_encoding_functions == 0 and not include_input:
        # Degenerate config: the reference would return an empty concat; we
        # treat it as passthrough (see positional_encoding).
        return num_channels
    return base + 2 * num_channels * num_encoding_functions


def frequency_bands(num_encoding_functions: int, log_sampling: bool = True, dtype=jnp.float32) -> jnp.ndarray:
    """Frequency multipliers 2^linspace(0, N-1, N) (log) or linspace(1, 2^(N-1), N)."""
    if log_sampling:
        return 2.0 ** jnp.linspace(
            0.0, max(num_encoding_functions - 1, 0), max(num_encoding_functions, 1), dtype=dtype
        )
    return jnp.linspace(
        2.0 ** 0.0, 2.0 ** max(num_encoding_functions - 1, 0), max(num_encoding_functions, 1), dtype=dtype
    )


def positional_encoding(
    tensor: jnp.ndarray,
    num_encoding_functions: int = 6,
    include_input: bool = True,
    log_sampling: bool = True,
) -> jnp.ndarray:
    """Sin/cos positional encoding of ``tensor`` along its last axis.

    Matches reference nerf/nerf_helpers.py:113-157, including the
    ``num_encoding_functions == 0`` special case (input returned unchanged).
    """
    if num_encoding_functions == 0:
        # Reference returns the bare input when the encoding list has a single
        # element (nerf/nerf_helpers.py:153-155).
        return tensor

    freqs = frequency_bands(num_encoding_functions, log_sampling, tensor.dtype)
    # (..., C) x (F,) -> (..., F, C): one broadcasted multiply.
    scaled = tensor[..., None, :] * freqs[:, None]
    # Per-frequency [sin, cos] blocks, flattened to (..., 2*F*C) in the exact
    # reference order: sin(f0*x) | cos(f0*x) | sin(f1*x) | ...
    sin = jnp.sin(scaled)
    cos = jnp.cos(scaled)
    interleaved = jnp.concatenate([sin[..., None, :], cos[..., None, :]], axis=-2)
    flat = interleaved.reshape(*tensor.shape[:-1], 2 * num_encoding_functions * tensor.shape[-1])
    if include_input:
        return jnp.concatenate([tensor, flat], axis=-1)
    return flat


def get_embedding_function(
    num_encoding_functions: int = 6,
    include_input: bool = True,
    log_sampling: bool = True,
):
    """Closure factory mirroring reference nerf/nerf_helpers.py:160-167."""
    return functools.partial(
        positional_encoding,
        num_encoding_functions=num_encoding_functions,
        include_input=include_input,
        log_sampling=log_sampling,
    )


def coarse_to_fine_window(
    num_encoding_functions: int, alpha: float, dtype=jnp.float32
) -> jnp.ndarray:
    """BARF-style per-frequency window for coarse-to-fine encoding annealing
    (Lin et al., "BARF: Bundle-Adjusting Neural Radiance Fields", eq. 14).

    Band k gets weight 0 while ``alpha < k``, 1 once ``alpha >= k + 1`` and a
    smooth cosine ramp in between; ``alpha`` runs 0 -> num_encoding_functions
    over the anneal schedule. Joint pose+scene optimization needs this:
    with all bands active from step 0 the scene's high frequencies absorb the
    camera error (the photometric loss collapses while the poses stay wrong);
    windowed low-to-high activation keeps the early loss landscape smooth in
    the pose variables. ``alpha`` is STATIC (baked per compile), so the
    window folds into the encoding constants at zero runtime cost.
    """
    k = jnp.arange(num_encoding_functions, dtype=dtype)
    x = jnp.clip(alpha - k, 0.0, 1.0)
    return 0.5 * (1.0 - jnp.cos(jnp.pi * x))
