"""Depth sampling along rays: stratified coarse samples + hierarchical inverse-CDF resampling.

Behavioral parity targets (reference: krrish94/nerf-pytorch):
  - coarse ``linspace``/lindisp z-values + stratified perturbation
        -> nerf/train_utils.py:45-65
  - ``sample_pdf`` (active variant ``sample_pdf_2``)
        -> nerf/nerf_helpers.py:260-302, which calls the external CUDA
           extension ``torchsearchsorted.searchsorted`` (nerf/nerf_helpers.py:288)
           — the reference's ONLY native-code dependency.

TPU-native design: the batched binary search is replaced by a broadcasted
rank computation ``inds = sum(cdf <= u)`` over the (bins x samples) plane —
a pure VPU compare+reduce with *no gather and no sort*, which XLA fuses with
the CDF build. For 63 bins x 128 samples this is ~8K flops/ray, far below the
MLP cost, and it vectorizes perfectly over rays. The bin interpolation uses
``take_along_axis`` (lowered to a vectorized dynamic-gather on TPU). A fused
Pallas variant lives in nerf_tpu/ops/pallas/.

All functions are jit/vmap-safe with static sample counts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def coarse_z_values(
    near: jnp.ndarray,
    far: jnp.ndarray,
    num_samples: int,
    lindisp: bool = False,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Uniform depth (or uniform-in-disparity) sample positions.

    near/far: scalars or per-ray arrays of shape (...,) — one bound per ray,
    no trailing singleton axis. Returns (..., num_samples) (scalar bounds
    yield (num_samples,)). Reference: nerf/train_utils.py:45-56.
    """
    near = jnp.asarray(near, dtype)[..., None]
    far = jnp.asarray(far, dtype)[..., None]
    t_vals = jnp.linspace(0.0, 1.0, num_samples, dtype=dtype)
    if not lindisp:
        z_vals = near * (1.0 - t_vals) + far * t_vals
    else:
        z_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)
    return z_vals


def perturb_z_values(key: jax.Array, z_vals: jnp.ndarray) -> jnp.ndarray:
    """Stratified jitter of depth samples within their bins.

    Reference: nerf/train_utils.py:58-65 (torch.rand -> jax.random.uniform).
    """
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
    lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
    t_rand = jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
    return lower + (upper - lower) * t_rand


def searchsorted_right(sorted_seq: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """Batched ``searchsorted(side="right")``: index where each value would insert.

    sorted_seq: (..., M) ascending along the last axis.
    values:     (..., K) queries sharing the leading batch shape.
    Returns int32 (..., K) in [0, M].

    Gather-free TPU formulation: rank = number of sequence entries <= value,
    computed as a broadcasted compare + sum over the M axis. Replaces the
    reference's CUDA ``torchsearchsorted`` kernel (nerf/nerf_helpers.py:288).
    """
    le = sorted_seq[..., None, :] <= values[..., :, None]  # (..., K, M)
    return jnp.sum(le.astype(jnp.int32), axis=-1)


def sample_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    num_samples: int,
    key: jax.Array | None = None,
    det: bool = False,
) -> jnp.ndarray:
    """Hierarchical inverse-transform sampling of ``num_samples`` new depths.

    bins:    (..., M) bin edge positions (z_vals midpoints).
    weights: (..., M-1) unnormalized per-bin weights (coarse compositing weights).
    det:     deterministic linspace samples instead of uniform randoms
             (reference passes det = (perturb == 0), nerf/train_utils.py:101).

    Matches reference ``sample_pdf_2`` (nerf/nerf_helpers.py:260-302): +1e-5
    weight floor, zero-prepended CDF, side="right" search, [below, above]
    clamping, and the denom<1e-5 guard in the linear interpolation. Unlike the
    reference (which is hard-coded to 2-D inputs), this version supports any
    leading batch shape.
    """
    dtype = weights.dtype
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (..., M)

    batch_shape = cdf.shape[:-1]
    if det:
        u = jnp.linspace(0.0, 1.0, num_samples, dtype=dtype)
        u = jnp.broadcast_to(u, batch_shape + (num_samples,))
    else:
        if key is None:
            raise ValueError("sample_pdf requires a PRNG key when det=False")
        u = jax.random.uniform(key, batch_shape + (num_samples,), dtype=dtype)

    # Gather-free CDF inversion. Dynamic gathers (take_along_axis) lower very
    # poorly on TPU — on a v5e chip they cost ~40% of a full frame render.
    # Because cdf and bins are ascending along the last axis, the four
    # gathered arrays are masked max/min reductions over the same
    # (samples x bins) compare plane the searchsorted rank uses:
    #   cdf_below  = largest cdf <= u          (le mask is never empty:
    #   bins_below = bin at that index          cdf[0] = 0 <= u for u in [0,1])
    #   cdf_above  = smallest cdf > u, else cdf[-1]
    #   bins_above = bin at that index, else bins[-1]
    # This exactly reproduces searchsorted(side="right") + the below/above
    # index clamping of the reference (nerf/nerf_helpers.py:288-295).
    le = cdf[..., None, :] <= u[..., :, None]  # (..., num_samples, M)
    neg_inf = jnp.array(-jnp.inf, dtype)
    pos_inf = jnp.array(jnp.inf, dtype)
    cdf_b = jnp.broadcast_to(cdf[..., None, :], le.shape)
    bins_b = jnp.broadcast_to(bins[..., None, :], le.shape)
    cdf_below = jnp.max(jnp.where(le, cdf_b, neg_inf), axis=-1)
    bins_below = jnp.max(jnp.where(le, bins_b, neg_inf), axis=-1)
    cdf_above = jnp.minimum(
        jnp.min(jnp.where(le, pos_inf, cdf_b), axis=-1), cdf[..., -1:]
    )
    bins_above = jnp.minimum(
        jnp.min(jnp.where(le, pos_inf, bins_b), axis=-1), bins[..., -1:]
    )

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)
