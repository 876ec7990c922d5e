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


def _mlp_kernel(
    pts_ref, dirs_ref,
    sx_ref, sd_ref,
    w1x_ref, w1s_ref, w1c_ref, b1_ref,
    wx0_ref, bx0_ref, wx1_ref, bx1_ref, wx2_ref, bx2_ref,
    wfeat_ref, bfeat_ref, walpha_ref, balpha_ref,
    wdf_ref, wdx_ref, wds_ref, wdc_ref, bdir_ref,
    wrgb_ref, brgb_ref,
    out_ref,
):
    f32 = jnp.float32
    pts = pts_ref[:]
    dirs = dirs_ref[:]

    # Encoded layer-1 input, folded into row-sliced matmuls (no concat).
    scaled = jnp.dot(pts, sx_ref[:], preferred_element_type=f32)  # (T, 30)
    h = (
        jnp.dot(pts, w1x_ref[:], preferred_element_type=f32)
        + jnp.dot(jnp.sin(scaled), w1s_ref[:], preferred_element_type=f32)
        + jnp.dot(jnp.cos(scaled), w1c_ref[:], preferred_element_type=f32)
        + b1_ref[:]
    )
    for w_ref, b_ref in ((wx0_ref, bx0_ref), (wx1_ref, bx1_ref), (wx2_ref, bx2_ref)):
        h = jnp.maximum(
            jnp.dot(h, w_ref[:], preferred_element_type=f32) + b_ref[:], 0.0
        )
    feat = jnp.maximum(
        jnp.dot(h, wfeat_ref[:], preferred_element_type=f32) + bfeat_ref[:], 0.0
    )
    alpha = jnp.dot(h, walpha_ref[:], preferred_element_type=f32) + balpha_ref[:]

    # Direction branch: cat(feat, enc(dirs)) @ Wdir folded the same way.
    dscaled = jnp.dot(dirs, sd_ref[:], preferred_element_type=f32)  # (T, 12)
    hd = (
        jnp.dot(feat, wdf_ref[:], preferred_element_type=f32)
        + jnp.dot(dirs, wdx_ref[:], preferred_element_type=f32)
        + jnp.dot(jnp.sin(dscaled), wds_ref[:], preferred_element_type=f32)
        + jnp.dot(jnp.cos(dscaled), wdc_ref[:], preferred_element_type=f32)
        + bdir_ref[:]
    )
    hd = jnp.maximum(hd, 0.0)
    rgb = jnp.dot(hd, wrgb_ref[:], preferred_element_type=f32) + brgb_ref[:]
    out_ref[:] = jnp.concatenate([rgb, alpha], axis=-1)


def _prepare_weights(params: Params, dtype):
    """Host-side weight re-layout for the kernel (pure permutations/casts)."""
    p = params
    w1x, w1s, w1c = _split_rows(jnp.asarray(p["layer1"]["kernel"]), _NUM_FREQ_XYZ)
    wdir = jnp.asarray(p["layers_dir"][0]["kernel"])  # (128 + 27, 64)
    wdf = wdir[:_HIDDEN]
    wdx, wds, wdc = _split_rows(wdir[_HIDDEN:], _NUM_FREQ_DIR)

    def c(x):
        return jnp.asarray(x, dtype)

    return (
        c(_freq_matrix(_NUM_FREQ_XYZ)), c(_freq_matrix(_NUM_FREQ_DIR)),
        c(w1x), c(w1s), c(w1c), c(p["layer1"]["bias"]),
        c(p["layers_xyz"][0]["kernel"]), c(p["layers_xyz"][0]["bias"]),
        c(p["layers_xyz"][1]["kernel"]), c(p["layers_xyz"][1]["bias"]),
        c(p["layers_xyz"][2]["kernel"]), c(p["layers_xyz"][2]["bias"]),
        c(p["fc_feat"]["kernel"]), c(p["fc_feat"]["bias"]),
        c(p["fc_alpha"]["kernel"]), c(p["fc_alpha"]["bias"]),
        c(wdf), c(wdx), c(wds), c(wdc), c(p["layers_dir"][0]["bias"]),
        c(p["fc_rgb"]["kernel"]), c(p["fc_rgb"]["bias"]),
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


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_flexible_mlp(
    params: Params,
    pts: jnp.ndarray,
    viewdirs: jnp.ndarray,
    tile: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Evaluate the default FlexibleNeRF radiance field, fused in VMEM.

    pts:      (N, 3) world-space sample points.
    viewdirs: (N, 3) per-point normalized view directions (pre-broadcast).
    Returns (N, 4) raw [r, g, b, sigma] in float32. N is padded to a tile
    multiple internally.
    """
    n = pts.shape[0]
    padded = (n + tile - 1) // tile * tile
    if padded != n:
        pts = jnp.pad(pts, ((0, padded - n), (0, 0)))
        viewdirs = jnp.pad(viewdirs, ((0, padded - n), (0, 0)))

    weights = _prepare_weights(params, jnp.float32)
    grid = (padded // tile,)
    point_spec = pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    weight_specs = [
        pl.BlockSpec(
            w.shape, lambda i, _nd=w.ndim: (0,) * _nd, memory_space=pltpu.VMEM
        )
        for w in weights
    ]

    out = pl.pallas_call(
        _mlp_kernel,
        out_shape=jax.ShapeDtypeStruct((padded, 4), jnp.float32),
        grid=grid,
        in_specs=[point_spec, point_spec] + weight_specs,
        out_specs=pl.BlockSpec((tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pts.astype(jnp.float32), viewdirs.astype(jnp.float32), *weights)
    return out[:n]
