"""Shared custom-VJP plumbing for the fused TRAINING kernel families.

Both training-kernel families (PaperNeRF 8x256, ops/pallas/paper_train.py;
FlexibleNeRF 4x128, ops/pallas/flex_train.py) share everything around the
kernels: the ray/sample tile layout, padding, BlockSpec construction, the
host-side dir-contribution split and its gradient, the residual plumbing,
and the custom_vjp wiring. That structure used to live as two ~150-line
twins, and cross-cutting fixes had to be applied twice (the host-dot
precision-policy fix landed in flex_train and was back-patched into
paper_train in the same commit — the exact failure mode this module
removes). Each family module now declares a :class:`TrainKernelFamily`
and keeps only what is genuinely its own: the two kernel bodies, the
weight preparation, and the gradient-pytree assembly.

Layout contract (identical to ops/pallas/paper_t.py's render layout):
rays pad to a multiple of ``RAYS`` (128); samples split into chunks of
``s_t``; grid step ``i`` covers ray tile ``i // g_s``, sample chunk
``i % g_s``; lane ``j * RAYS + r`` within a tile is sample j of ray r.
The per-ray dir-contribution block is indexed ``i // g_s`` so it is
reused across a ray tile's sample chunks, and the backward's ddc output
accumulates over exactly those chunks (``(i % g_s) == 0`` initializes).

Precision policy: f32 compute means REALLY f32 — every matmul, including
the HOST-side dir-contribution dots here, runs HIGHEST under f32 parity.
At the TPU default (bf16 pass) a sub-ulp parameter perturbation vanishes
through the host dot, which silently breaks finite-difference checks of
the custom VJP (observed on-chip: fd/analytic = 0.51 while the backward
matched XLA — CLAUDE.md hazard entry).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = Dict[str, Any]

RAYS = 128  # ray-tile width (lanes per sample chunk); matches paper_t._RAYS


def matmul_precision(compute_dtype):
    """f32 compute means REALLY f32: without this, Mosaic (and XLA host
    dots) run f32 matmuls at the MXU's default bf16-pass precision and the
    f32 parity path carries bf16-class error (~7e-3) — observed on-chip in
    the backward's bias rows, and as vanishing sub-ulp perturbations in the
    host-side dir dot. bf16 compute keeps the fast default."""
    return (jax.lax.Precision.HIGHEST
            if jnp.dtype(compute_dtype) == jnp.float32
            else jax.lax.Precision.DEFAULT)


def tile_lanes(x: jnp.ndarray, g_r: int, g_s: int, s_t: int) -> jnp.ndarray:
    """(N_padded, S, C) -> (C, g_r*g_s*T) sample-major tile layout
    (lane within a tile = j*RAYS + r), matching paper_t's transform."""
    c = x.shape[-1]
    return (
        x.reshape(g_r, RAYS, g_s, s_t, c)
        .transpose(4, 0, 2, 3, 1)
        .reshape(c, g_r * g_s * s_t * RAYS)
    )


def untile_lanes(x: jnp.ndarray, g_r: int, g_s: int, s_t: int) -> jnp.ndarray:
    """(C, g_r*g_s*T) -> (N_padded, S, C)."""
    c = x.shape[0]
    return (
        x.reshape(c, g_r, g_s, s_t, RAYS)
        .transpose(1, 4, 2, 3, 0)
        .reshape(g_r * RAYS, g_s * s_t, c)
    )


def regroup_gather_indices(num_freq: int) -> np.ndarray:
    """Row order used by the [x | sin | cos] weight regrouping: grouped
    row i comes from original (interleaved per-frequency sin/cos,
    nerf_helpers.py:149-151) row G[i]."""
    g = [0, 1, 2]
    for f in range(num_freq):
        g += [3 + 6 * f + c for c in range(3)]
    for f in range(num_freq):
        g += [3 + 6 * f + 3 + c for c in range(3)]
    return np.asarray(g)


def unregroup_rows(dw_grouped: jnp.ndarray, num_freq: int) -> jnp.ndarray:
    """Inverse row permutation: (dim_xyz, out) grouped -> reference order."""
    inv = np.argsort(regroup_gather_indices(num_freq))
    return dw_grouped[inv]


class TrainKernelFamily(NamedTuple):
    """Everything family-specific about a fused training-kernel pair.

    The kernel factories receive the same arguments their modules always
    used; ``residual_dims``/``grad_dims`` list the LEADING dims of each
    tensor — the builder appends the lane/accumulator axes and constructs
    the matching BlockSpecs (whole blocks for grid-accumulated gradients,
    ``(dims..., t)`` lane blocks for residuals, and the trailing ddc block
    indexed per ray tile)."""

    # Geometry.
    dir_width: int          # sublanes of the per-ray dir-contribution block
    wdir_split_row: int     # first dir-encoding row of layers_dir[0].kernel
    max_tile_bf16: int      # lane budget per grid step (VMEM-calibrated)
    max_tile_f32: int
    # Kernels + weight prep.
    prepare_weights: Callable[[Params, Any, int], Tuple[jnp.ndarray, ...]]
    make_fwd_kernel: Callable[[Any, int, int], Callable]
    make_bwd_kernel: Callable[[Any, int, int], Callable]
    # Residual leading dims as functions of dim_xyz (lane axis appended).
    residual_dims: Callable[[int], Sequence[Tuple[int, ...]]]
    # Gradient-accumulator leading dims (ddc appended by the builder).
    grad_dims: Callable[[int], Sequence[Tuple[int, ...]]]
    # (grad_outs, dw_dir_rows, drgb_sum, dsigma_sum, num_freq_xyz) -> pytree
    assemble_grads: Callable[..., Params]


def _sample_tile(family: TrainKernelFamily, s: int, compute_dtype) -> int:
    max_tile = (
        family.max_tile_f32
        if jnp.dtype(compute_dtype) == jnp.float32
        else family.max_tile_bf16
    )
    cap = max(1, max_tile // RAYS)
    best = 1
    for d in range(1, min(s, cap) + 1):
        if s % d == 0:
            best = d
    return best


def _layout(family: TrainKernelFamily, n: int, s: int, compute_dtype):
    padded = -(-n // RAYS) * RAYS
    s_t = _sample_tile(family, s, compute_dtype)
    g_r = padded // RAYS
    g_s = s // s_t
    t = RAYS * s_t
    return padded, s_t, g_r, g_s, t


def _weight_specs(weights):
    return [
        pl.BlockSpec(w.shape, lambda i, _nd=w.ndim: (0,) * _nd,
                     memory_space=pltpu.VMEM)
        for w in weights
    ]


def _lane_spec(dims: Tuple[int, ...], t: int) -> pl.BlockSpec:
    nd = len(dims)
    return pl.BlockSpec(dims + (t,), lambda i, _nd=nd: (0,) * _nd + (i,),
                        memory_space=pltpu.VMEM)


def _fwd_impl(family: TrainKernelFamily, cfg, params, pts, viewdirs):
    num_freq_xyz, num_freq_dir, compute_dtype, interpret = cfg
    from ...ops.encoding import positional_encoding

    n, s = pts.shape[0], pts.shape[1]
    padded, s_t, g_r, g_s, t = _layout(family, n, s, compute_dtype)
    dim_xyz = 3 + 6 * num_freq_xyz
    cdtype = jnp.dtype(compute_dtype)

    wdir = jnp.asarray(params["layers_dir"][0]["kernel"])
    direnc = positional_encoding(viewdirs, num_freq_dir)
    dcontrib = jnp.dot(direnc, wdir[family.wdir_split_row:],
                       preferred_element_type=jnp.float32,
                       precision=matmul_precision(compute_dtype))
    if padded != n:
        pts = jnp.pad(pts, ((0, padded - n), (0, 0), (0, 0)))
        dcontrib = jnp.pad(dcontrib, ((0, padded - n), (0, 0)))

    weights = family.prepare_weights(params, cdtype, num_freq_xyz)
    pts_t = tile_lanes(pts, g_r, g_s, s_t).astype(jnp.float32)
    dc_t = dcontrib.T.astype(jnp.float32)

    lanes = g_r * g_s * t
    in_specs = [
        _lane_spec((3,), t),
        pl.BlockSpec((family.dir_width, RAYS),
                     lambda i, _gs=g_s: (0, i // _gs),
                     memory_space=pltpu.VMEM),
    ] + _weight_specs(weights)
    res_dims = tuple(family.residual_dims(dim_xyz))
    out_shapes = [jax.ShapeDtypeStruct((4, lanes), jnp.float32)] + [
        jax.ShapeDtypeStruct(dims + (lanes,), cdtype) for dims in res_dims
    ]
    out_specs = [_lane_spec((4,), t)] + [
        _lane_spec(dims, t) for dims in res_dims
    ]
    out, *res = pl.pallas_call(
        family.make_fwd_kernel(cdtype, s_t, num_freq_xyz),
        out_shape=out_shapes,
        grid=(g_r * g_s,),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(pts_t, dc_t, *weights)

    rf = untile_lanes(out, g_r, g_s, s_t)[:n]
    residuals = (tuple(res), direnc, weights)
    return rf, residuals


def _bwd_impl(family: TrainKernelFamily, cfg, n, s, residuals, g):
    num_freq_xyz, num_freq_dir, compute_dtype, interpret = cfg
    res, direnc, weights = residuals
    padded, s_t, g_r, g_s, t = _layout(family, n, s, compute_dtype)
    dim_xyz = 3 + 6 * num_freq_xyz

    g = g.astype(jnp.float32)
    if padded != n:
        g = jnp.pad(g, ((0, padded - n), (0, 0), (0, 0)))
    dy_t = tile_lanes(g, g_r, g_s, s_t)

    res_dims = tuple(family.residual_dims(dim_xyz))
    in_specs = [_lane_spec((4,), t)] + [
        _lane_spec(dims, t) for dims in res_dims
    ] + _weight_specs(weights)

    f32 = jnp.float32
    acc_dims = tuple(family.grad_dims(dim_xyz))
    out_shapes = [jax.ShapeDtypeStruct(dims, f32) for dims in acc_dims] + [
        jax.ShapeDtypeStruct((family.dir_width, padded), f32),  # ddc
    ]
    out_specs = [
        pl.BlockSpec(dims, lambda i, _nd=len(dims): (0,) * _nd,
                     memory_space=pltpu.VMEM)
        for dims in acc_dims
    ] + [
        pl.BlockSpec((family.dir_width, RAYS),
                     lambda i, _gs=g_s: (0, i // _gs),
                     memory_space=pltpu.VMEM),
    ]
    *grad_outs, ddc = pl.pallas_call(
        family.make_bwd_kernel(jnp.dtype(compute_dtype), s_t, g_s),
        out_shape=out_shapes,
        grid=(g_r * g_s,),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(dy_t, *res, *weights)

    # Host-side assembly into the exact params pytree layout (kernels store
    # (out, in); params store (in, out); encoded-row blocks un-regroup from
    # [x|sin|cos] back to the reference's interleaved order — family hook).
    dw_dir_rows = jnp.dot(direnc.T, ddc[:, :n].T,
                          preferred_element_type=jnp.float32,
                          precision=matmul_precision(compute_dtype))
    drgb_sum = jnp.sum(g[:, :, 0:3], axis=(0, 1))
    dsigma_sum = jnp.sum(g[:, :, 3], axis=(0, 1))
    return family.assemble_grads(grad_outs, dw_dir_rows, drgb_sum,
                                 dsigma_sum, num_freq_xyz)


def build_train_vjp(family: TrainKernelFamily):
    """The family's differentiable evaluation: a ``custom_vjp`` function
    ``f(cfg, params, pts, viewdirs) -> (N, S, 4)`` whose backward is the
    family's fused Pallas kernel. ``cfg`` = (num_freq_xyz, num_freq_dir,
    compute_dtype, interpret), hashable/static. Gradients w.r.t. pts and
    viewdirs are ZERO by design (training data; the dispatch gate is
    RenderSettings.use_pallas_train — never pose optimization)."""

    @functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
    def train_fn(cfg, params, pts, viewdirs):
        rf, _ = _fwd_impl(family, cfg, params, pts, viewdirs)
        return rf

    def train_fwd(cfg, params, pts, viewdirs):
        return _fwd_impl(family, cfg, params, pts, viewdirs)

    def train_bwd(cfg, residuals, g):
        n, s = g.shape[0], g.shape[1]  # static at trace time
        dparams = _bwd_impl(family, cfg, n, s, residuals, g)
        return (
            dparams,
            jnp.zeros((n, s, 3), jnp.float32),
            jnp.zeros((n, 3), jnp.float32),
        )

    train_fn.defvjp(train_fwd, train_bwd)
    return train_fn
