"""Fused inverse-CDF resampling Pallas kernel (hierarchical sampling).

The third native-kernel-parity item (SURVEY.md §2.10): the reference's ONLY
native dependency is the CUDA ``torchsearchsorted.searchsorted`` inside
``sample_pdf_2`` (nerf/nerf_helpers.py:260-302, the kernel call at :288).
The XLA path (ops/sampling.sample_pdf) already replaces the binary search
with a gather-free rank + masked-reduction interpolation; this kernel fuses
the ENTIRE resampling chain — weight floor, pdf normalize, CDF build, rank,
interpolation — in VMEM for a tile of rays, so the (R, M) pdf/cdf
intermediates never exist in HBM.

Mosaic-specific constructions (CLAUDE.md hazards):
  * no cumsum primitive -> the CDF prefix sum is ONE (M-1, M-1)
    inclusive-upper-triangular-ones matmul on the MXU
  * no gather/scatter -> cdf_below/above and bins_below/above are masked
    max/min reductions over the (samples x bins) compare plane (identical
    math to ops/sampling.py:124-136)

The sample positions ``u`` are computed by the caller (XLA): deterministic
linspace or jax.random uniforms both work, keeping kernel parity with both
``det`` modes of the reference (nerf_helpers.py:269-279).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _resample_kernel(num_bins: int):
    """Kernel over one (R, ...) ray tile. num_bins = M = bins.shape[-1]."""
    f32 = jnp.float32

    def kernel(bins_ref, weights_ref, u_ref, tri_ref, out_ref):
        bins = bins_ref[:]          # (R, M)
        w = weights_ref[:] + 1e-5   # (R, M-1), reference's weight floor
        u = u_ref[:]                # (R, S)

        pdf = w / jnp.sum(w, axis=-1, keepdims=True)
        # Inclusive prefix sum as a triangular-ones matmul (no cumsum in
        # Mosaic): (pdf @ tri)[r, j] = sum_{i<=j} pdf[r, i]. Precision MUST
        # be HIGHEST: the MXU's default bf16 inputs would round the CDF to
        # ~4e-3 absolute, shifting interpolated samples by ~0.06 bin widths
        # (measured on-chip). The matmul is (R, M)x(M, M) — tiny either way.
        cdf_inc = jnp.dot(
            pdf, tri_ref[:], preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        )
        cdf = jnp.concatenate(
            [jnp.zeros((pdf.shape[0], 1), f32), cdf_inc], axis=-1
        )  # (R, M) — zero-prepended like the reference (nerf_helpers.py:268)

        # searchsorted(side="right") + below/above clamp + linear interp as
        # masked reductions over the (S, M) plane per ray.
        le = cdf[:, None, :] <= u[:, :, None]        # (R, S, M)
        neg = jnp.float32(-jnp.inf)
        pos = jnp.float32(jnp.inf)
        cdf_b = jnp.broadcast_to(cdf[:, None, :], le.shape)
        bins_b = jnp.broadcast_to(bins[:, None, :], le.shape)
        cdf_below = jnp.max(jnp.where(le, cdf_b, neg), axis=-1)
        bins_below = jnp.max(jnp.where(le, bins_b, neg), axis=-1)
        cdf_above = jnp.minimum(
            jnp.min(jnp.where(le, pos, cdf_b), axis=-1), cdf[:, -1:]
        )
        bins_above = jnp.minimum(
            jnp.min(jnp.where(le, pos, bins_b), axis=-1), bins[:, -1:]
        )
        denom = cdf_above - cdf_below
        denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
        t = (u - cdf_below) / denom
        out_ref[:] = bins_below + t * (bins_above - bins_below)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("num_samples", "det", "rays_per_tile", "interpret")
)
def fused_sample_pdf(
    bins: jnp.ndarray,        # (N, M)
    weights: jnp.ndarray,     # (N, M-1)
    num_samples: int,
    key: jax.Array | None = None,
    det: bool = False,
    rays_per_tile: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in Pallas variant of ops.sampling.sample_pdf for 2-D inputs.

    Returns (N, num_samples) resampled depths. Bit-compatible semantics with
    the XLA path (same floor/guards); differences are float reassociation
    only.
    """
    n, m = bins.shape
    dtype = jnp.float32
    if rays_per_tile is None:
        # The kernel materializes ~6 (R, S, M) f32 temporaries (the compare
        # plane and its masked broadcasts); size R to keep them within ~10 MB
        # of the 16 MB scoped-VMEM limit (measured: R=64 at S=128, M=63 needs
        # 16.26 MB and fails to compile; R=256 at 64x64 needs 34 MB).
        budget = 10 * 1024 * 1024
        rays_per_tile = max(8, min(256, budget // (num_samples * m * 4 * 6)))
    rays_per_tile = max(8, rays_per_tile - rays_per_tile % 8)  # sublane-aligned
    if det:
        u = jnp.broadcast_to(
            jnp.linspace(0.0, 1.0, num_samples, dtype=dtype), (n, num_samples)
        )
    else:
        if key is None:
            raise ValueError("fused_sample_pdf requires a key when det=False")
        u = jax.random.uniform(key, (n, num_samples), dtype=dtype)

    r = min(rays_per_tile, n)
    padded = -(-n // r) * r
    if padded != n:
        pad = padded - n
        bins = jnp.pad(bins, ((0, pad), (0, 0)), mode="edge")
        weights = jnp.pad(weights, ((0, pad), (0, 0)), constant_values=1.0)
        u = jnp.pad(u, ((0, pad), (0, 0)))

    tri = jnp.triu(jnp.ones((m - 1, m - 1), dtype))  # inclusive upper-tri

    def rspec(cols):
        return pl.BlockSpec((r, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _resample_kernel(m),
        out_shape=jax.ShapeDtypeStruct((padded, num_samples), dtype),
        grid=(padded // r,),
        in_specs=[
            rspec(m), rspec(m - 1), rspec(num_samples),
            pl.BlockSpec((m - 1, m - 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=rspec(num_samples),
        interpret=interpret,
    )(
        bins.astype(dtype), weights.astype(dtype), u, tri
    )
    return out[:n]
