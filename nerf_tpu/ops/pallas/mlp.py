"""Fused positional-encoding + NeRF-MLP Pallas kernel (TPU).

The innermost hot loop of the whole framework is the MLP evaluated over
rays x samples points (reference run_network, nerf/train_utils.py:19-21 — a
Python chunk loop over an eager 7-layer torch module). The XLA path jits this
well but materializes the (N, 90) encoded features and every (N, 128)
activation in HBM between layer matmuls once N is large. This kernel keeps
everything for a tile of points in VMEM: HBM traffic per point is 24 B of
raw inputs + 16 B of outputs instead of ~1 KB of intermediates.

MXU-friendly encoding trick: the sinusoidal features are never materialized
in the reference's interleaved layout. Instead
    scaled = pts @ S                (S = (3, 3F) frequency selection matrix)
    h1 = pts @ W_x + sin(scaled) @ W_sin + cos(scaled) @ W_cos + b1
where W_x / W_sin / W_cos are row-slices of the checkpoint's layer-1 weight,
permuted on the host to match (a pure row permutation — checkpoint
compatible). Same for the view-direction branch. Everything inside the
kernel is a (tile, <=128) matmul or elementwise sin/cos — no narrow
concatenations, no lane-padding blowups.

Forward-only (rendering/eval); training autodiffs the XLA path. Weights
(~300 KB) are VMEM-resident across the whole grid.

Fuses the default FlexibleNeRFModel shape (nerf/models.py:233-254 forward,
4 layers / 128 hidden / viewdirs, 10/4 encoding functions) — the shape of
every shipped pretrained checkpoint.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = Dict[str, Any]

# Default FlexibleNeRF shape (the pretrained-checkpoint shape).
_NUM_FREQ_XYZ = 10
_NUM_FREQ_DIR = 4
_DIM_XYZ = 3 + 6 * _NUM_FREQ_XYZ   # 63
_DIM_DIR = 3 + 6 * _NUM_FREQ_DIR   # 27
_HIDDEN = 128


def _freq_matrix(num_freq: int, dtype=jnp.float32) -> jnp.ndarray:
    """S (3, 3*num_freq) with S[c, f*3 + c] = 2^f, so (x @ S)[:, f*3 + c]
    = x_c * 2^f — the arguments of every sin/cos feature, as one matmul."""
    s = np.zeros((3, 3 * num_freq), np.float32)
    for f in range(num_freq):
        for c in range(3):
            s[c, f * 3 + c] = 2.0 ** f
    return jnp.asarray(s, dtype)


def _split_rows(kernel: jnp.ndarray, num_freq: int):
    """Split an encoded-input weight matrix (3+6F, out) into the row blocks
    matching [x | per-freq interleaved sin/cos] and regroup the interleaved
    sin/cos rows into contiguous (3F, out) blocks for sin and cos.

    Reference feature order (nerf_helpers.py:149-151): for each frequency f,
    a 3-row sin block then a 3-row cos block. Row index of sin feature
    (f, c) is 3 + 6f + c; cos is 3 + 6f + 3 + c. Our matmul encoding emits
    sin features ordered (f, c) -> f*3 + c, so the regrouped blocks are
    exact row permutations of the original weight.
    """
    w_x = kernel[:3]
    sin_rows = []
    cos_rows = []
    for f in range(num_freq):
        base = 3 + 6 * f
        sin_rows.append(kernel[base : base + 3])
        cos_rows.append(kernel[base + 3 : base + 6])
    return w_x, jnp.concatenate(sin_rows, axis=0), jnp.concatenate(cos_rows, axis=0)


def _make_mlp_kernel(compute_dtype):
    """Kernel factory. ``compute_dtype`` sets the matmul INPUT dtype (weights
    and activations); accumulation is always f32 via preferred_element_type.

    Precision note for bfloat16: the sinusoid arguments must stay f32 — the
    top frequency scales positions by 2^9, and bf16's ~8-bit mantissa would
    randomize the phase — so ``scaled`` matmuls and sin/cos run in f32 and
    only the wide feature matmuls drop to bf16 (MXU-native, 2x rate).
    """
    f32 = jnp.float32

    def kernel(
        pts_ref, dirs_ref,
        sx_ref, sd_ref,
        w1x_ref, w1s_ref, w1c_ref, b1_ref,
        wx0_ref, bx0_ref, wx1_ref, bx1_ref, wx2_ref, bx2_ref,
        wfeat_ref, bfeat_ref, walpha_ref, balpha_ref,
        wdf_ref, wdx_ref, wds_ref, wdc_ref, bdir_ref,
        wrgb_ref, brgb_ref,
        out_ref,
    ):
        def c(x):
            return x.astype(compute_dtype)

        pts = pts_ref[:]
        dirs = dirs_ref[:]

        # Encoded layer-1 input, folded into row-sliced matmuls (no concat).
        scaled = jnp.dot(pts, sx_ref[:], preferred_element_type=f32)  # (T, 30) f32
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
        alpha = jnp.dot(c(h), walpha_ref[:], preferred_element_type=f32) + balpha_ref[:]

        # Direction branch: cat(feat, enc(dirs)) @ Wdir folded the same way.
        dscaled = jnp.dot(dirs, sd_ref[:], preferred_element_type=f32)  # (T, 12)
        hd = (
            jnp.dot(c(feat), wdf_ref[:], preferred_element_type=f32)
            + jnp.dot(c(dirs), wdx_ref[:], preferred_element_type=f32)
            + jnp.dot(c(jnp.sin(dscaled)), wds_ref[:], preferred_element_type=f32)
            + jnp.dot(c(jnp.cos(dscaled)), wdc_ref[:], preferred_element_type=f32)
            + bdir_ref[:]
        )
        hd = jnp.maximum(hd, 0.0)
        rgb = jnp.dot(c(hd), wrgb_ref[:], preferred_element_type=f32) + brgb_ref[:]
        out_ref[:] = jnp.concatenate([rgb, alpha], axis=-1)

    return kernel


def _prepare_weights(params: Params, compute_dtype):
    """Host-side weight re-layout for the kernel (pure permutations/casts).

    Weight matrices are cast to ``compute_dtype`` (matmul inputs); biases and
    the frequency-selection matrices stay float32 (f32 accumulate / f32
    sinusoid arguments).
    """
    p = params
    w1x, w1s, w1c = _split_rows(jnp.asarray(p["layer1"]["kernel"]), _NUM_FREQ_XYZ)
    wdir = jnp.asarray(p["layers_dir"][0]["kernel"])  # (128 + 27, 64)
    wdf = wdir[:_HIDDEN]
    wdx, wds, wdc = _split_rows(wdir[_HIDDEN:], _NUM_FREQ_DIR)

    def w(x):
        return jnp.asarray(x, compute_dtype)

    def f(x):
        return jnp.asarray(x, jnp.float32)

    return (
        f(_freq_matrix(_NUM_FREQ_XYZ)), f(_freq_matrix(_NUM_FREQ_DIR)),
        w(w1x), w(w1s), w(w1c), f(p["layer1"]["bias"]),
        w(p["layers_xyz"][0]["kernel"]), f(p["layers_xyz"][0]["bias"]),
        w(p["layers_xyz"][1]["kernel"]), f(p["layers_xyz"][1]["bias"]),
        w(p["layers_xyz"][2]["kernel"]), f(p["layers_xyz"][2]["bias"]),
        w(p["fc_feat"]["kernel"]), f(p["fc_feat"]["bias"]),
        w(p["fc_alpha"]["kernel"]), f(p["fc_alpha"]["bias"]),
        w(wdf), w(wdx), w(wds), w(wdc), f(p["layers_dir"][0]["bias"]),
        w(p["fc_rgb"]["kernel"]), f(p["fc_rgb"]["bias"]),
    )


def supports_fused(model, params: Params) -> bool:
    """True when (model, params) is the default FlexibleNeRF shape this kernel fuses."""
    try:
        return (
            type(model).__name__ == "FlexibleNeRFModel"
            and model.num_layers == 4
            and model.hidden_size == _HIDDEN
            and model.use_viewdirs
            and model.num_encoding_fn_xyz == _NUM_FREQ_XYZ
            and model.num_encoding_fn_dir == _NUM_FREQ_DIR
            and model.include_input_xyz
            and model.include_input_dir
            and len(params.get("layers_xyz", ())) == 3
            and params["layer1"]["kernel"].shape == (_DIM_XYZ, _HIDDEN)
        )
    except (AttributeError, KeyError):
        return False


def _make_ray_kernel(compute_dtype, samples_per_ray: int):
    """Ray-major kernel: the view-direction branch is hoisted out — the
    caller passes each ray's precomputed direction contribution
    ``dcontrib = enc(dir) @ Wdir_enc-rows`` (R, 64), which the kernel
    repeats across that ray's samples. Removes 24 transcendentals and the
    whole dir-encoding matmul chain per point (samples_per_ray-fold
    redundant in the flat formulation)."""
    f32 = jnp.float32

    def kernel(
        pts_ref, dcontrib_ref,
        sx_ref,
        w1x_ref, w1s_ref, w1c_ref, b1_ref,
        wx0_ref, bx0_ref, wx1_ref, bx1_ref, wx2_ref, bx2_ref,
        wfeat_ref, bfeat_ref, walpha_ref, balpha_ref,
        wdf_ref, bdir_ref,
        wrgb_ref, brgb_ref,
        out_ref,
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
        alpha = jnp.dot(c(h), walpha_ref[:], preferred_element_type=f32) + balpha_ref[:]

        # Per-ray contribution repeated across that ray's samples via
        # broadcast+reshape (jnp.repeat lowers to an unsupported scatter).
        dc_rays = dcontrib_ref[:]
        dc = jnp.broadcast_to(
            dc_rays[:, None, :],
            (dc_rays.shape[0], samples_per_ray, dc_rays.shape[1]),
        ).reshape(pts.shape[0], dc_rays.shape[1])
        hd = jnp.maximum(
            jnp.dot(c(feat), wdf_ref[:], preferred_element_type=f32) + dc + bdir_ref[:],
            0.0,
        )
        rgb = jnp.dot(c(hd), wrgb_ref[:], preferred_element_type=f32) + brgb_ref[:]
        out_ref[:] = jnp.concatenate([rgb, alpha], axis=-1)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("rays_per_tile", "interpret", "compute_dtype")
)
def fused_flexible_mlp_rays(
    params: Params,
    pts: jnp.ndarray,
    viewdirs: jnp.ndarray,
    rays_per_tile: int = 16,
    interpret: bool = False,
    compute_dtype: str = "float32",
) -> jnp.ndarray:
    """Ray-major fused evaluation: pts (R, S, 3) + per-RAY viewdirs (R, 3)
    -> raw radiance field (R, S, 4). The direction branch's encoded-feature
    matmul happens once per ray in XLA; the kernel adds the resulting (R, 64)
    contribution to every sample of its ray.
    """
    from ...ops.encoding import positional_encoding  # local to avoid cycles

    r, s = pts.shape[0], pts.shape[1]
    p = params
    wdir = jnp.asarray(p["layers_dir"][0]["kernel"])
    direnc = positional_encoding(viewdirs, _NUM_FREQ_DIR)  # (R, 27)
    dcontrib = jnp.dot(
        direnc, wdir[_HIDDEN:], preferred_element_type=jnp.float32
    )  # (R, 64)

    padded_r = (r + rays_per_tile - 1) // rays_per_tile * rays_per_tile
    if padded_r != r:
        pts = jnp.pad(pts, ((0, padded_r - r), (0, 0), (0, 0)))
        dcontrib = jnp.pad(dcontrib, ((0, padded_r - r), (0, 0)))

    cdtype = jnp.dtype(compute_dtype)
    all_w = _prepare_weights(params, cdtype)
    # Drop the dir-branch pieces handled outside: keep sx (not sd) and wdf.
    (sx, _sd, w1x, w1s, w1c, b1, wx0, bx0, wx1, bx1, wx2, bx2,
     wfeat, bfeat, walpha, balpha, wdf, _wdx, _wds, _wdc, bdir,
     wrgb, brgb) = all_w
    weights = (sx, w1x, w1s, w1c, b1, wx0, bx0, wx1, bx1, wx2, bx2,
               wfeat, bfeat, walpha, balpha, wdf, bdir, wrgb, brgb)

    tile = rays_per_tile * s
    flat_pts = pts.reshape(padded_r * s, 3).astype(jnp.float32)
    grid = (padded_r // rays_per_tile,)
    point_spec = pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dc_spec = pl.BlockSpec(
        (rays_per_tile, 64), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    weight_specs = [
        pl.BlockSpec(
            w.shape, lambda i, _nd=w.ndim: (0,) * _nd, memory_space=pltpu.VMEM
        )
        for w in weights
    ]

    out = pl.pallas_call(
        _make_ray_kernel(cdtype, s),
        out_shape=jax.ShapeDtypeStruct((padded_r * s, 4), jnp.float32),
        grid=grid,
        in_specs=[point_spec, dc_spec] + weight_specs,
        out_specs=pl.BlockSpec((tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(flat_pts, dcontrib.astype(jnp.float32), *weights)
    return out[: r * s].reshape(r, s, 4)


@functools.partial(
    jax.jit, static_argnames=("tile", "interpret", "compute_dtype")
)
def fused_flexible_mlp(
    params: Params,
    pts: jnp.ndarray,
    viewdirs: jnp.ndarray,
    tile: int = 1024,
    interpret: bool = False,
    compute_dtype: str = "float32",
) -> jnp.ndarray:
    """Evaluate the default FlexibleNeRF radiance field, fused in VMEM.

    pts:      (N, 3) world-space sample points.
    viewdirs: (N, 3) per-point normalized view directions (pre-broadcast).
    compute_dtype: "float32" (bit-exact vs the XLA path) or "bfloat16"
      (MXU-native matmul inputs, f32 accumulation and f32 sinusoids —
      ~1e-2 relative output error).
    Returns (N, 4) raw [r, g, b, sigma] in float32. N is padded to a tile
    multiple internally.
    """
    n = pts.shape[0]
    padded = (n + tile - 1) // tile * tile
    if padded != n:
        pts = jnp.pad(pts, ((0, padded - n), (0, 0)))
        viewdirs = jnp.pad(viewdirs, ((0, padded - n), (0, 0)))

    cdtype = jnp.dtype(compute_dtype)
    weights = _prepare_weights(params, cdtype)
    grid = (padded // tile,)
    point_spec = pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    weight_specs = [
        pl.BlockSpec(
            w.shape, lambda i, _nd=w.ndim: (0,) * _nd, memory_space=pltpu.VMEM
        )
        for w in weights
    ]

    out = pl.pallas_call(
        _make_mlp_kernel(cdtype),
        out_shape=jax.ShapeDtypeStruct((padded, 4), jnp.float32),
        grid=grid,
        in_specs=[point_spec, point_spec] + weight_specs,
        out_specs=pl.BlockSpec((tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pts.astype(jnp.float32), viewdirs.astype(jnp.float32), *weights)
    return out[:n]
