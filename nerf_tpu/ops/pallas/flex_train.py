"""Fused FlexibleNeRF (4x128) TRAINING kernels: custom-VJP forward + backward.

Reverses the round-2 width-128 custom-VJP retirement WITH DATA. That
retirement projected <=1.15x from a fused-forward-only measurement plus a
"backward is matmul-shape-bound the same way" argument; the round-5 probe
(tools/flex_train_probe.py, real v5e) shows the argument fails exactly at
the shape that dominates training FLOPs: XLA fwd+bwd runs 65.4 TFLOP/s at
(1024 rays, 64 samples) — indeed near its ceiling, projected gain 1.05x —
but collapses to 39.8 TFLOP/s at (1024, 128), the FINE pass's shape (64
coarse + 64 resampled z-values, reference train_utils.py:103-105), while
the shipped fused forward (ops/pallas/mlp_t.py) holds 68 TFLOP/s there:
projected custom-VJP gain 1.71x on the pass that carries 2/3 of the
step's MLP FLOPs. Same adopt-or-retire methodology as the width-256
PaperNeRF decision (ops/pallas/paper_train.py), whose built kernel pair
then beat its own projection (1.73x end-to-end, BENCH_r05 stages).

Design: identical family to paper_train.py — read that module's docstring
for the layout rationale. Differences are purely the FlexibleNeRF
topology (reference nerf/models.py:185-256, default 4x128 shape of every
shipped checkpoint):

  * layer1's output is NOT ReLU'd (models.py:238 applies no activation;
    the first ReLU is inside the layers_xyz loop) — so its residual ``a0``
    carries no mask and the backward propagates through it unmasked.
  * no trunk skip at the default depth (_has_skip never fires for
    num_layers=4), so no encoding re-injection mid-trunk.
  * fc_feat IS ReLU'd (models.py:246) and fc_alpha reads the LAST TRUNK
    ACTIVATION h3, not feat (models.py:247) — both opposite to PaperNeRF.
  * one 64-wide dir layer; fc_feat+fc_alpha fuse into one (129, 128)
    matmul in BOTH directions (forward: mlp_t's trick; backward: the
    [dfeat_pre; dsigma] cotangents stack into one (129, T) block whose
    single W^T contraction yields dh3 and whose single dY X^T yields both
    weight gradients).

Residual traffic is ~1.5 KB/point bf16 (63+128*5+64 rows) vs PaperNeRF's
~5.5 KB, so training tiles run 2x wider (1024 lanes bf16).

Gradients w.r.t. pts and viewdirs are ZERO by design (training data; fine
z-samples detached — reference train_utils.py:103). The dispatch gate is
``RenderSettings.use_pallas_train``; never use for pose/camera
optimization (engine/pose_opt.py differentiates through viewdirs).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mlp import _HIDDEN, supports_fused
from .paper_t import _RAYS, _split_rows
from .train_vjp import (
    TrainKernelFamily,
    _sample_tile,
    build_train_vjp,
    matmul_precision as _matmul_precision,
    unregroup_rows as _unregroup_rows,
)

Params = Dict[str, Any]

_DIR_HIDDEN = 64

# VMEM budget per grid step (residuals double-buffer; ~1.5 KB/point bf16):
# 1024 lanes bf16 ~= 3.1 MB of residual blocks + f32 intermediates; f32
# residuals double the bytes, so the cap halves.
_MAX_TILE_TRAIN_BF16 = 1024  # 128 rays x 8 samples
_MAX_TILE_TRAIN_F32 = 512    # 128 rays x 4 samples

supports_fused_flex_train = supports_fused


def _sample_tile_train(s: int, compute_dtype="bfloat16") -> int:
    return _sample_tile(_FAMILY, s, compute_dtype)


def _prepare_weights_flex_train(params: Params, compute_dtype, num_freq_xyz):
    """Transpose/regroup FlexibleNeRF params for the feature-major kernels.

    Weight matrices cast to ``compute_dtype``; biases stay f32 (out, 1)
    columns. layer1's encoded-xyz rows regroup [x | sin | cos] to match the
    kernel's sublane-concat order; fc_feat+fc_alpha stack into (129, 128)."""

    def wt(x):
        return jnp.asarray(x, compute_dtype).T

    def bt(p):
        return jnp.asarray(p["bias"], jnp.float32).reshape(-1, 1)

    wx, ws, wc = _split_rows(jnp.asarray(params["layer1"]["kernel"]),
                             num_freq_xyz)
    w1 = jnp.concatenate([wt(wx), wt(ws), wt(wc)], axis=1)
    wdir = jnp.asarray(params["layers_dir"][0]["kernel"])  # (128+dim_dir, 64)
    wfa = jnp.concatenate([wt(params["fc_feat"]["kernel"]),
                           wt(params["fc_alpha"]["kernel"])], axis=0)
    bfa = jnp.concatenate([bt(params["fc_feat"]), bt(params["fc_alpha"])],
                          axis=0)
    out = [w1, bt(params["layer1"])]
    for i in range(3):
        out += [wt(params["layers_xyz"][i]["kernel"]),
                bt(params["layers_xyz"][i])]
    out += [wfa, bfa]
    out += [wt(wdir[:_HIDDEN]), bt(params["layers_dir"][0])]
    out += [wt(params["fc_rgb"]["kernel"]), bt(params["fc_rgb"])]
    return tuple(out)


# ---------------------------------------------------------------------------
# Forward kernel: mlp_t's evaluation + residual outputs.


def _make_fwd_kernel(compute_dtype, s_tile: int, num_freq_xyz: int):
    f32 = jnp.float32
    prec = _matmul_precision(compute_dtype)

    def kernel(
        pts_ref, dc_ref,
        w1_ref, b1_ref,
        wx0_ref, bx0_ref, wx1_ref, bx1_ref, wx2_ref, bx2_ref,
        wfa_ref, bfa_ref,
        wdf_ref, bd_ref,
        wrgb_ref, brgb_ref,
        out_ref,      # (4, T)
        enc_ref,      # (dim_xyz, T) residual
        a0_ref,       # (128, T) residual: layer1 output (NOT ReLU'd)
        hs_ref,       # (3, 128, T) residual: post-ReLU trunk activations
        feat_ref,     # (128, T) residual: post-ReLU fc_feat
        hd_ref,       # (64, T) residual: post-ReLU dir activation
    ):
        def c(x):
            return x.astype(compute_dtype)

        def mm(w_ref, x):
            return jnp.dot(c(w_ref[:]), c(x), preferred_element_type=f32,
                           precision=prec)

        pts = pts_ref[:]
        sf = jnp.sin(pts)
        cf = jnp.cos(pts)
        sins, coss = [sf], [cf]
        for _ in range(num_freq_xyz - 1):
            sf, cf = 2.0 * sf * cf, 1.0 - 2.0 * sf * sf
            sins.append(sf)
            coss.append(cf)
        enc = jnp.concatenate([pts] + sins + coss, axis=0)
        enc_ref[:] = c(enc)

        a0 = mm(w1_ref, enc) + b1_ref[:]   # no ReLU (models.py:238)
        a0_ref[:] = c(a0)
        h = a0
        for i, (w_ref, b_ref) in enumerate(
            ((wx0_ref, bx0_ref), (wx1_ref, bx1_ref), (wx2_ref, bx2_ref))
        ):
            h = jnp.maximum(mm(w_ref, h) + b_ref[:], 0.0)
            hs_ref[i] = c(h)

        fa = mm(wfa_ref, h) + bfa_ref[:]    # (129, T): [feat_pre; sigma]
        feat = jnp.maximum(fa[:_HIDDEN], 0.0)
        sigma = fa[_HIDDEN:_HIDDEN + 1]
        feat_ref[:] = c(feat)

        dc = pltpu.repeat(dc_ref[:], s_tile, axis=1)
        hd = jnp.maximum(mm(wdf_ref, feat) + dc + bd_ref[:], 0.0)
        hd_ref[:] = c(hd)
        rgb = mm(wrgb_ref, hd) + brgb_ref[:]
        out_ref[:] = jnp.concatenate([rgb, sigma], axis=0)

    return kernel


# ---------------------------------------------------------------------------
# Backward kernel: every parameter gradient in one pass over the tiles.


def _make_bwd_kernel(compute_dtype, s_tile: int, g_s: int):
    f32 = jnp.float32
    prec = _matmul_precision(compute_dtype)

    def kernel(
        dy_ref,       # (4, T) f32 cotangent [drgb | dsigma]
        enc_ref, a0_ref, hs_ref, feat_ref, hd_ref,   # residuals
        w1_ref, b1_ref,
        wx0_ref, bx0_ref, wx1_ref, bx1_ref, wx2_ref, bx2_ref,
        wfa_ref, bfa_ref,
        wdf_ref, bd_ref,
        wrgb_ref, brgb_ref,
        dwx_ref,      # (3, 128, 128): layers_xyz grads (stored (out, in))
        dw1_ref,      # (128, dim_xyz): layer1 (grouped rows)
        dwfa_ref,     # (129, 128): [fc_feat; fc_alpha]
        dwdf_ref,     # (64, 128): feat half of layers_dir[0]
        dwrgb_ref,    # (3, 64)
        db128_ref,    # (5, 128): b1, bx0, bx1, bx2, bfeat
        db64_ref,     # (1, 64): bd
        ddc_ref,      # (64, R): grad of the per-ray dir contribution
    ):
        i = pl.program_id(0)
        first = i == 0

        def c(x):
            return x.astype(compute_dtype)

        def mm_t(w_ref, dy):
            # w stored (out, in): dX (in, T) = W^T @ dY.
            return jax.lax.dot_general(
                c(w_ref[:]), c(dy), (((0,), (0,)), ((), ())),
                preferred_element_type=f32, precision=prec,
            )

        def d_w(dy, x):
            # dW stored-layout (out, in) = dY (out, T) @ X^T (T, in).
            return jax.lax.dot_general(
                c(dy), c(x), (((1,), (1,)), ((), ())),
                preferred_element_type=f32, precision=prec,
            )

        def acc(ref, val):
            @pl.when(first)
            def _():
                ref[...] = val

            @pl.when(jnp.logical_not(first))
            def _():
                ref[...] = ref[...] + val

        t = _RAYS * s_tile
        ones_row = jnp.ones((1, t), f32)

        def rowsum(dy):
            # Bias grad as an MXU contraction (see paper_train's note on the
            # precision policy and the 1D-relayout it avoids).
            return jax.lax.dot_general(
                ones_row, dy, (((1,), (1,)), ((), ())),
                preferred_element_type=f32, precision=prec,
            )

        dy = dy_ref[:]
        drgb, dsigma = dy[0:3], dy[3:4]
        enc = enc_ref[:]
        # ReLU masks compare in f32 (Mosaic has no bf16 cmpf — paper_train).
        feat = feat_ref[:].astype(f32)
        hd = hd_ref[:].astype(f32)

        # --- dir branch ----------------------------------------------------
        dwrgb = d_w(drgb, hd)
        dhd = jnp.where(hd > 0, mm_t(wrgb_ref, drgb), 0.0)
        dwdf = d_w(dhd, feat)
        db64 = rowsum(dhd)
        # Per-ray dir-contribution grad: sum dhd over this tile's samples
        # (lane j*R + r), accumulated over the ray tile's g_s sample chunks.
        r = _RAYS
        ddc = dhd[:, 0:r]
        for j in range(1, s_tile):
            ddc = ddc + dhd[:, j * r:(j + 1) * r]
        first_chunk = (i % g_s) == 0

        @pl.when(first_chunk)
        def _():
            ddc_ref[:] = ddc

        @pl.when(jnp.logical_not(first_chunk))
        def _():
            ddc_ref[:] = ddc_ref[:] + ddc

        # --- fused feat+alpha head (joins at h3) -----------------------------
        h3 = hs_ref[2].astype(f32)
        dfeat = jnp.where(feat > 0, mm_t(wdf_ref, dhd), 0.0)
        dfa = jnp.concatenate([dfeat, dsigma], axis=0)    # (129, T)
        dwfa = d_w(dfa, h3)
        dbfeat = rowsum(dfeat)
        dh = jnp.where(h3 > 0, mm_t(wfa_ref, dfa), 0.0)

        # --- trunk -----------------------------------------------------------
        h2 = hs_ref[1].astype(f32)
        h1 = hs_ref[0].astype(f32)
        a0 = a0_ref[:].astype(f32)
        dwx2 = d_w(dh, h2)
        dbx2 = rowsum(dh)
        dh = jnp.where(h2 > 0, mm_t(wx2_ref, dh), 0.0)
        dwx1 = d_w(dh, h1)
        dbx1 = rowsum(dh)
        dh = jnp.where(h1 > 0, mm_t(wx1_ref, dh), 0.0)
        dwx0 = d_w(dh, a0)
        dbx0 = rowsum(dh)
        da0 = mm_t(wx0_ref, dh)     # layer1 un-ReLU'd: no mask
        dw1 = d_w(da0, enc)
        db1 = rowsum(da0)

        acc(dwx_ref, jnp.stack([dwx0, dwx1, dwx2]))
        acc(dw1_ref, dw1)
        acc(dwfa_ref, dwfa)
        acc(dwdf_ref, dwdf)
        acc(dwrgb_ref, dwrgb)
        acc(db128_ref, jnp.concatenate([db1, dbx0, dbx1, dbx2, dbfeat],
                                       axis=0))
        acc(db64_ref, db64)

    return kernel


# ---------------------------------------------------------------------------
# Family spec + custom_vjp plumbing (shared builder: ops/pallas/train_vjp.py
# owns the tile layout, padding, BlockSpecs, host-side dir split and its
# precision policy, and the defvjp wiring).


def _residual_dims(dim_xyz):
    # Forward-kernel residual outputs, in signature order: enc, a0, hs
    # (3 trunk activations), feat, hd. Lane axis appended by the builder.
    return ((dim_xyz,), (_HIDDEN,), (3, _HIDDEN), (_HIDDEN,), (_DIR_HIDDEN,))


def _grad_dims(dim_xyz):
    # Backward-kernel accumulator outputs, in signature order (ddc is
    # appended by the builder): dwx, dw1, dwfa, dwdf, dwrgb, db128, db64.
    return (
        (3, _HIDDEN, _HIDDEN),
        (_HIDDEN, dim_xyz),
        (_HIDDEN + 1, _HIDDEN),
        (_DIR_HIDDEN, _HIDDEN),
        (3, _DIR_HIDDEN),
        (5, _HIDDEN),
        (1, _DIR_HIDDEN),
    )


def _assemble_grads(outs, dw_dir_rows, drgb_sum, dsigma_sum, num_freq_xyz):
    """Kernel accumulators -> the exact params pytree layout (kernels store
    (out, in); params store (in, out); layer1's encoded rows un-regroup
    from [x|sin|cos] back to the reference's interleaved order)."""
    dwx, dw1, dwfa, dwdf, dwrgb, db128, db64 = outs

    def lx(kernel, bias):
        return {"kernel": kernel, "bias": bias}

    return {
        "layer1": lx(_unregroup_rows(dw1.T, num_freq_xyz), db128[0]),
        "layers_xyz": [
            lx(dwx[0].T, db128[1]),
            lx(dwx[1].T, db128[2]),
            lx(dwx[2].T, db128[3]),
        ],
        "fc_feat": lx(dwfa[:_HIDDEN].T, db128[4]),
        "fc_alpha": lx(dwfa[_HIDDEN:].T, dsigma_sum.reshape(1)),
        "layers_dir": [
            lx(jnp.concatenate([dwdf.T, dw_dir_rows], axis=0), db64[0]),
        ],
        "fc_rgb": lx(dwrgb.T, drgb_sum),
    }


_FAMILY = TrainKernelFamily(
    dir_width=_DIR_HIDDEN,
    wdir_split_row=_HIDDEN,
    max_tile_bf16=_MAX_TILE_TRAIN_BF16,
    max_tile_f32=_MAX_TILE_TRAIN_F32,
    prepare_weights=_prepare_weights_flex_train,
    make_fwd_kernel=_make_fwd_kernel,
    make_bwd_kernel=_make_bwd_kernel,
    residual_dims=_residual_dims,
    grad_dims=_grad_dims,
    assemble_grads=_assemble_grads,
)

_flex_train = build_train_vjp(_FAMILY)


@functools.partial(
    jax.jit,
    static_argnames=("num_freq_xyz", "num_freq_dir", "interpret",
                     "compute_dtype"),
)
def fused_flex_mlp_train(
    params: Params,
    pts: jnp.ndarray,        # (N, S, 3)
    viewdirs: jnp.ndarray,   # (N, 3) per-ray
    num_freq_xyz: int = 10,
    num_freq_dir: int = 4,
    interpret: bool = False,
    compute_dtype: str = "float32",
) -> jnp.ndarray:
    """Differentiable fused FlexibleNeRF evaluation for TRAINING.

    Forward = the feature-major fused kernel (residuals saved); backward =
    one Pallas kernel producing every parameter gradient. Returns
    (N, S, 4) raw [r, g, b, sigma] float32. Gradients w.r.t. ``pts`` and
    ``viewdirs`` are zero by design (training data; see module docstring).
    """
    cfg = (int(num_freq_xyz), int(num_freq_dir), str(compute_dtype),
           bool(interpret))
    return _flex_train(cfg, params, pts, viewdirs)
