"""Feature-major (transposed) fused encode+MLP Pallas kernel.

Replaces the point-major kernel (ops/pallas/mlp.py) as the production
radiance-field evaluator. Layout lesson from round 1/2 profiling: with points
on sublanes, every narrow tensor — pts (T, 3), scaled (T, 30), alpha (T, 1),
rgb (T, 3) — lane-pads to 128, wasting up to 40x VMEM and capping tiles at
~1k points, where per-grid-step overhead dominates (the kernel LOST to XLA).

This kernel puts FEATURES on sublanes and POINTS on lanes:
  * pts arrive as (3, T): 8x8192 padded block = 256 KB instead of 4 MB
  * every matmul is W^T (out, in) @ X (in, T) — M=out on sublanes, N=T on
    lanes: full MXU tiles for the 128-wide layers, and the tile T grows to
    8192 points (8 rays x 64 samples x 16), amortizing step overhead 8x
  * fc_feat and fc_alpha fuse into ONE (129, 128) @ (128, T) matmul (their
    separate point-major matmuls ran at 100%/1% MXU occupancy for the same
    cost each)
  * outputs leave as (4, T) raw [r, g, b, sigma]: 16 B/point of HBM traffic;
    compositing reads it in XLA (2.4 ms/frame at 800px — fusing it further
    is noise, which is why the whole-stage kernel is retired from the
    default path)

Same checkpoint-compatible weight folding as mlp.py: sin/cos(pts @ S) with
row-permuted layer-1 weights (reference feature order nerf_helpers.py:149-151),
the per-ray direction contribution precomputed in XLA and broadcast across
each ray's samples inside the kernel.

Precision: sinusoid arguments and accumulation stay f32; with
compute_dtype=bfloat16 the wide matmuls run with bf16 inputs (MXU 2x rate).

Fuses the default FlexibleNeRF shape (reference nerf/models.py:233-254,
4 layers / 128 hidden / viewdirs / 10+4 encoding fns) — the shape of every
shipped pretrained checkpoint. Forward-only; training autodiffs XLA.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mlp import _HIDDEN, _NUM_FREQ_DIR, _NUM_FREQ_XYZ, _prepare_weights

Params = Dict[str, Any]


def _make_kernel_t(compute_dtype, rays_per_tile: int, samples_per_ray: int):
    f32 = jnp.float32
    R, S = rays_per_tile, samples_per_ray
    T = R * S

    def kernel(
        pts_ref,      # (3, T) f32, SAMPLE-major: lane j*R + r = (ray r, sample j)
        dc_ref,       # (64, R) f32 per-ray direction contribution
        pow2_ref,     # (30, 1) f32: row f*3+c = 2^f (sinusoid frequency scales)
        w1_ref,       # (128, 63) rows-regrouped layer-1 weight [x|sin|cos]
        b1_ref,       # (128, 1)
        wx0_ref, bx0_ref, wx1_ref, bx1_ref, wx2_ref, bx2_ref,  # (128,128),(128,1)
        wfa_ref,      # (129, 128) rows = [fc_feat; fc_alpha]
        bfa_ref,      # (129, 1)
        wdf_ref,      # (64, 128)
        bdir_ref,     # (64, 1)
        wrgb_ref,     # (3, 64)
        brgb_ref,     # (3, 1)
        out_ref,      # (4, T) f32 [r, g, b, sigma]
    ):
        def c(x):
            return x.astype(compute_dtype)

        pts = pts_ref[:]  # (3, T) f32
        # Sinusoid arguments x_c * 2^f as EXACT f32 VPU multiplies: row
        # f*3+c of the (30, T) tile repeats pts[c] (sublane tile) scaled by
        # 2^f. A matmul formulation runs at the MXU's default bf16 input
        # precision, whose ~2^-8 relative phase error at the top frequency
        # (|x|*2^9 ~ 700 rad) randomizes the high-frequency features.
        scaled = pltpu.repeat(pts, _NUM_FREQ_XYZ, axis=0) * pow2_ref[:]
        # Layer 1 as ONE K=63 MXU pass: the [x | sin | cos] features are
        # assembled with a sublane concat (three separate matmuls would each
        # cost a full (128, T) pass regardless of their tiny K).
        enc = jnp.concatenate([pts, jnp.sin(scaled), jnp.cos(scaled)], axis=0)
        h = jnp.dot(c(w1_ref[:]), c(enc), preferred_element_type=f32) + b1_ref[:]
        for w_ref, b_ref in ((wx0_ref, bx0_ref), (wx1_ref, bx1_ref), (wx2_ref, bx2_ref)):
            h = jnp.maximum(
                jnp.dot(c(w_ref[:]), c(h), preferred_element_type=f32) + b_ref[:],
                0.0,
            )
        # Fused feat+alpha: one (129, 128) @ (128, T) matmul.
        fa = jnp.dot(c(wfa_ref[:]), c(h), preferred_element_type=f32) + bfa_ref[:]
        feat = jnp.maximum(fa[:_HIDDEN], 0.0)   # (128, T)
        sigma = fa[_HIDDEN:_HIDDEN + 1]          # (1, T) raw

        # Direction branch: per-ray dc columns expanded to all T lanes. The
        # tile is SAMPLE-major (lane j*R + r), so the expansion is exactly
        # pltpu.repeat's tile semantics [dc | dc | ... | dc]. (A lane-collapse
        # reshape (64, R, S) -> (64, T) is an unsupported Mosaic shape cast —
        # the ray-major layout is unreachable without it.)
        dc = pltpu.repeat(dc_ref[:], S, axis=1)  # (64, T)
        hd = jnp.maximum(
            jnp.dot(c(wdf_ref[:]), c(feat), preferred_element_type=f32)
            + dc + bdir_ref[:],
            0.0,
        )
        rgb = jnp.dot(c(wrgb_ref[:]), c(hd), preferred_element_type=f32) + brgb_ref[:]
        out_ref[:] = jnp.concatenate([rgb, sigma], axis=0)

    return kernel


def _prepare_weights_t(params: Params, compute_dtype):
    """Transpose + fuse the point-major weight layout of mlp._prepare_weights.

    Weight matrices are cast to ``compute_dtype``; biases become (out, 1)
    f32 columns; fc_feat and fc_alpha stack into one (129, 128) block.
    """
    (sx, _sd, w1x, w1s, w1c, b1, wx0, bx0, wx1, bx1, wx2, bx2,
     wfeat, bfeat, walpha, balpha, wdf, _wdx, _wds, _wdc, bdir,
     wrgb, brgb) = _prepare_weights(params, compute_dtype)

    def wt(x):
        return jnp.asarray(x, compute_dtype).T

    def bt(x):
        return jnp.asarray(x, jnp.float32).reshape(-1, 1)

    wfa = jnp.concatenate([wt(wfeat), wt(walpha)], axis=0)  # (129, 128)
    bfa = jnp.concatenate([bt(bfeat), bt(balpha)], axis=0)  # (129, 1)
    # Layer 1 fused across the [x | sin | cos] row groups (matches the
    # kernel's sublane-concat feature order): (128, 63).
    w1 = jnp.concatenate([wt(w1x), wt(w1s), wt(w1c)], axis=1)
    # Per-row frequency scales for the sinusoid arguments: row f*3+c = 2^f
    # (the dense frequency-selection matmul is retired — see kernel note).
    pow2 = jnp.repeat(
        2.0 ** jnp.arange(_NUM_FREQ_XYZ, dtype=jnp.float32), 3
    ).reshape(-1, 1)
    return (
        pow2,
        w1, bt(b1),
        wt(wx0), bt(bx0), wt(wx1), bt(bx1), wt(wx2), bt(bx2),
        wfa, bfa,
        wt(wdf), bt(bdir),
        wt(wrgb), bt(brgb),
    )


@functools.partial(
    jax.jit, static_argnames=("rays_per_tile", "interpret", "compute_dtype")
)
def fused_mlp_t(
    params: Params,
    pts: jnp.ndarray,        # (N, S, 3)
    viewdirs: jnp.ndarray,   # (N, 3) per-ray
    rays_per_tile: int = 128,
    interpret: bool = False,
    compute_dtype: str = "float32",
) -> jnp.ndarray:
    """Feature-major fused radiance-field evaluation.

    Returns (N, S, 4) raw [r, g, b, sigma] float32.
    """
    from ...ops.encoding import positional_encoding

    n, s = pts.shape[0], pts.shape[1]
    wdir = jnp.asarray(params["layers_dir"][0]["kernel"])
    direnc = positional_encoding(viewdirs, _NUM_FREQ_DIR)               # (N, 27)
    dcontrib = jnp.dot(direnc, wdir[_HIDDEN:],
                       preferred_element_type=jnp.float32)              # (N, 64)

    # dc blocks are (64, R): the lane dimension must be 128-divisible.
    r = max(128, rays_per_tile - rays_per_tile % 128)
    padded = -(-n // r) * r
    if padded != n:
        pad = padded - n
        pts = jnp.pad(pts, ((0, pad), (0, 0), (0, 0)))
        dcontrib = jnp.pad(dcontrib, ((0, pad), (0, 0)))

    cdtype = jnp.dtype(compute_dtype)
    weights = _prepare_weights_t(params, cdtype)

    g = padded // r
    t = r * s
    # Sample-major lane order per tile: lane j*R + r' = (ray r', sample j).
    pts_t = (
        pts.reshape(g, r, s, 3).transpose(3, 0, 2, 1).reshape(3, padded * s)
    ).astype(jnp.float32)
    dc_t = dcontrib.T.astype(jnp.float32)                      # (64, padded)

    in_specs = [
        pl.BlockSpec((3, t), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((64, r), lambda i: (0, i), memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec(w.shape, lambda i, _nd=w.ndim: (0,) * _nd,
                     memory_space=pltpu.VMEM)
        for w in weights
    ]
    out = pl.pallas_call(
        _make_kernel_t(cdtype, r, s),
        out_shape=jax.ShapeDtypeStruct((4, padded * s), jnp.float32),
        grid=(g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((4, t), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pts_t, dc_t, *weights)
    # Invert the sample-major layout back to (N, S, 4).
    return out.reshape(4, g, s, r).transpose(1, 3, 2, 0).reshape(padded, s, 4)[:n]
