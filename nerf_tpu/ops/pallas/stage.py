"""Whole-stage fused Pallas kernel: encode + MLP + volume compositing.

The ultimate fusion for a render stage (SURVEY.md §6 'hard parts': keep the
fine-network pass fused and HBM-resident): for a tile of rays, sample points
go in and composited rgb/disp/acc/depth/weights come out — the (R, S, 4)
radiance field never exists in HBM, and no layout transposes are needed
(the compositing scan reads the VMEM radiance field directly).

Per tile of R rays x S samples:
  1. ray-major encode+MLP (same math as ops/pallas/mlp.py: sin/cos(pts @ S)
     with row-permuted layer-1 weights; the per-ray direction contribution
     is precomputed in XLA and broadcast across samples)
  2. single-pass transmittance scan over S (same as ops/pallas/composite.py)

Forward-only, deterministic (eval path). Weights (R, S) are still emitted —
hierarchical resampling consumes them.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mlp import _HIDDEN, _prepare_weights

Params = Dict


def _stage_kernel(compute_dtype, rays_per_tile: int, num_samples: int,
                  white_background: bool):
    f32 = jnp.float32
    R, S = rays_per_tile, num_samples

    def kernel(
        pts_ref,       # (R*S, 3)
        z_ref,         # (R, S)
        dnorm_ref,     # (R, 1)
        dcontrib_ref,  # (R, 64)
        tri_ref,       # (S, S) strictly-upper-triangular ones (prefix-sum matmul)
        sx_ref,
        w1x_ref, w1s_ref, w1c_ref, b1_ref,
        wx0_ref, bx0_ref, wx1_ref, bx1_ref, wx2_ref, bx2_ref,
        wfeat_ref, bfeat_ref, walpha_ref, balpha_ref,
        wdf_ref, bdir_ref,
        wrgb_ref, brgb_ref,
        rgb_out_ref,      # (R, 3)
        disp_out_ref,     # (R, 1)
        acc_out_ref,      # (R, 1)
        depth_out_ref,    # (R, 1)
        weights_out_ref,  # (R, S)
    ):
        def c(x):
            return x.astype(compute_dtype)

        pts = pts_ref[:]
        scaled = jnp.dot(pts, sx_ref[:], preferred_element_type=f32)
        h = (
            jnp.dot(c(pts), w1x_ref[:], preferred_element_type=f32)
            + jnp.dot(c(jnp.sin(scaled)), w1s_ref[:], preferred_element_type=f32)
            + jnp.dot(c(jnp.cos(scaled)), w1c_ref[:], preferred_element_type=f32)
            + b1_ref[:]
        )
        for w_ref, b_ref in (
            (wx0_ref, bx0_ref), (wx1_ref, bx1_ref), (wx2_ref, bx2_ref)
        ):
            h = jnp.maximum(
                jnp.dot(c(h), w_ref[:], preferred_element_type=f32) + b_ref[:], 0.0
            )
        feat = jnp.maximum(
            jnp.dot(c(h), wfeat_ref[:], preferred_element_type=f32) + bfeat_ref[:],
            0.0,
        )
        sigma = (
            jnp.dot(c(h), walpha_ref[:], preferred_element_type=f32) + balpha_ref[:]
        )  # (R*S, 1) raw

        dc_rays = dcontrib_ref[:]
        dc = jnp.broadcast_to(
            dc_rays[:, None, :], (R, S, dc_rays.shape[1])
        ).reshape(R * S, dc_rays.shape[1])
        hd = jnp.maximum(
            jnp.dot(c(feat), wdf_ref[:], preferred_element_type=f32) + dc + bdir_ref[:],
            0.0,
        )
        rgb_raw = (
            jnp.dot(c(hd), wrgb_ref[:], preferred_element_type=f32) + brgb_ref[:]
        )  # (R*S, 3)

        # ---- compositing over S, rays on sublanes ----
        rgb = jax.nn.sigmoid(rgb_raw).reshape(R, S, 3)
        sig = jnp.maximum(sigma.reshape(R, S), 0.0)
        z = z_ref[:]
        dists = jnp.concatenate(
            [z[:, 1:] - z[:, :-1], jnp.full((R, 1), 1e10, f32)], axis=1
        ) * dnorm_ref[:]
        alpha = 1.0 - jnp.exp(-sig * dists)            # (R, S)
        # Exclusive transmittance T_i = prod_{j<i}(1-a_j+eps) in log space.
        # Mosaic has no cumsum primitive, so the exclusive prefix sum runs as
        # one tiny matmul with a strictly-upper-triangular ones matrix:
        # (logs @ tri)[r, i] = sum_{j<i} logs[r, j].
        # Explicit floor: Mosaic/interpret can evaluate 1-alpha+1e-10 to
        # exactly 0 at alpha=1 (reassociation), and a -inf entering the
        # prefix matmul turns -inf*0 products into NaN.
        logs = jnp.log(jnp.maximum(1.0 - alpha + 1e-10, 1e-10))
        trans = jnp.exp(jnp.dot(logs, tri_ref[:], preferred_element_type=f32))
        weights = alpha * trans                        # (R, S)
        weights_out_ref[:] = weights
        rgb_map = jnp.sum(weights[:, :, None] * rgb, axis=1)   # (R, 3)
        depth = jnp.sum(weights * z, axis=1, keepdims=True)    # (R, 1)
        acc = jnp.sum(weights, axis=1, keepdims=True)          # (R, 1)
        if white_background:
            rgb_map = rgb_map + (1.0 - acc)
        rgb_out_ref[:] = rgb_map
        acc_out_ref[:] = acc
        depth_out_ref[:] = depth
        disp_out_ref[:] = 1.0 / jnp.maximum(
            jnp.full((R, 1), 1e-10, f32), depth / jnp.maximum(acc, 1e-10)
        )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("white_background", "rays_per_tile", "interpret", "compute_dtype"),
)
def fused_render_stage(
    params: Params,
    pts: jnp.ndarray,        # (N_rays, S, 3)
    viewdirs: jnp.ndarray,   # (N_rays, 3)
    z_vals: jnp.ndarray,     # (N_rays, S)
    ray_directions: jnp.ndarray,  # (N_rays, 3) un-normalized (for dists)
    white_background: bool = False,
    rays_per_tile: int = 16,
    interpret: bool = False,
    compute_dtype: str = "float32",
) -> Dict[str, jnp.ndarray]:
    """One fused render stage for the default FlexibleNeRF shape.

    Returns {"rgb", "disp", "acc", "depth", "weights"} per ray.
    """
    from ...ops.encoding import positional_encoding
    from .mlp import _NUM_FREQ_DIR

    n, s = pts.shape[0], pts.shape[1]
    wdir = jnp.asarray(params["layers_dir"][0]["kernel"])
    direnc = positional_encoding(viewdirs, _NUM_FREQ_DIR)
    dcontrib = jnp.dot(direnc, wdir[_HIDDEN:], preferred_element_type=jnp.float32)
    dnorm = jnp.linalg.norm(ray_directions, axis=-1, keepdims=True)  # (N, 1)

    padded = (n + rays_per_tile - 1) // rays_per_tile * rays_per_tile
    if padded != n:
        pad = padded - n
        pts = jnp.pad(pts, ((0, pad), (0, 0), (0, 0)))
        z_vals = jnp.pad(z_vals, ((0, pad), (0, 0)), mode="edge")
        dcontrib = jnp.pad(dcontrib, ((0, pad), (0, 0)))
        dnorm = jnp.pad(dnorm, ((0, pad), (0, 0)), constant_values=1.0)

    cdtype = jnp.dtype(compute_dtype)
    all_w = _prepare_weights(params, cdtype)
    (sx, _sd, w1x, w1s, w1c, b1, wx0, bx0, wx1, bx1, wx2, bx2,
     wfeat, bfeat, walpha, balpha, wdf, _wdx, _wds, _wdc, bdir,
     wrgb, brgb) = all_w
    weights_in = (sx, w1x, w1s, w1c, b1, wx0, bx0, wx1, bx1, wx2, bx2,
                  wfeat, bfeat, walpha, balpha, wdf, bdir, wrgb, brgb)

    R = rays_per_tile
    grid = (padded // R,)
    flat_pts = pts.reshape(padded * s, 3).astype(jnp.float32)
    tri = jnp.triu(jnp.ones((s, s), jnp.float32), k=1)

    pts_spec = pl.BlockSpec((R * s, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    def rspec(cols):
        return pl.BlockSpec((R, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((s, s), lambda i: (0, 0), memory_space=pltpu.VMEM)
    weight_specs = [
        pl.BlockSpec(
            w.shape, lambda i, _nd=w.ndim: (0,) * _nd, memory_space=pltpu.VMEM
        )
        for w in weights_in
    ]

    out_shapes = (
        jax.ShapeDtypeStruct((padded, 3), jnp.float32),
        jax.ShapeDtypeStruct((padded, 1), jnp.float32),
        jax.ShapeDtypeStruct((padded, 1), jnp.float32),
        jax.ShapeDtypeStruct((padded, 1), jnp.float32),
        jax.ShapeDtypeStruct((padded, s), jnp.float32),
    )
    rgb, disp, acc, depth, weights = pl.pallas_call(
        _stage_kernel(cdtype, R, s, white_background),
        out_shape=out_shapes,
        grid=grid,
        in_specs=[pts_spec, rspec(s), rspec(1), rspec(64), tri_spec] + weight_specs,
        out_specs=(rspec(3), rspec(1), rspec(1), rspec(1), rspec(s)),
        interpret=interpret,
    )(flat_pts, z_vals.astype(jnp.float32), dnorm.astype(jnp.float32),
      dcontrib.astype(jnp.float32), tri, *weights_in)

    return {
        "rgb": rgb[:n],
        "disp": disp[:n, 0],
        "acc": acc[:n, 0],
        "depth": depth[:n, 0],
        "weights": weights[:n],
    }
