"""Feature-major fused encode+MLP Pallas kernel for the PaperNeRF family.

The 8x256 `PaperNeRFModel` (reference nerf/models.py:123-183) is where the
MXU actually pays for width: the width microbench (docs/PARITY.md) measures
256-wide bf16 matmul chains at 78% of MXU peak vs 56% at the Flexible
model's 128. This kernel extends the feature-major layout of
``ops/pallas/mlp_t.py`` (features on sublanes, points on lanes, sinusoids
via the double-angle recurrence) to the Paper architecture:

  * 8-layer 256-wide trunk with the encoding skip re-injected at layer 4
    (``w4 @ [enc; h]`` split into two matmuls — the (dim_xyz, T) encoding
    block stays resident in VMEM from layer 0)
  * the Paper quirks kept exactly: ``fc_feat`` output is NOT ReLU'd, alpha
    is read from *feat* (not the trunk), and ``layers_dir[3]`` is dead
    (reference models.py:162-182)
  * 256-wide activations are 2x the Flexible kernel's, so tiles are
    (128 rays x S_t samples) with a flattened 2D grid — ray tile i//g_s
    re-uses its per-ray direction contribution block across its g_s sample
    chunks without re-fetching (block index unchanged)

Parameterized over (num_encoding_fn_xyz, num_encoding_fn_dir, samples);
weights fold per call exactly like mlp_t. Forward-only; training autodiffs
the XLA path.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mlp import _split_rows

Params = Dict[str, Any]

_WIDTH = 256
_DIR_WIDTH = 128
_RAYS = 128           # lane quantum: dc blocks are (128, R)
_MAX_TILE = 2048      # lanes per tile: 256-wide f32 activations -> 2 MB each


def supports_fused_paper(model, params: Params) -> bool:
    """True when (model, params) is a PaperNeRF shape this kernel fuses.

    The reference hard-codes the 8/256/128 layout whatever the constructor
    args say (models.py:147-160), so only the encoding widths vary."""
    try:
        return (
            type(model).__name__ == "PaperNeRFModel"
            and model.use_viewdirs
            and model.include_input_xyz
            and model.include_input_dir
            and len(params.get("layers_xyz", ())) == 8
            and len(params.get("layers_dir", ())) == 4
            and params["layers_xyz"][1]["kernel"].shape == (_WIDTH, _WIDTH)
        )
    except (AttributeError, KeyError):
        return False


def _sample_tile(s: int) -> int:
    """Largest divisor of ``s`` keeping the tile under _MAX_TILE lanes."""
    cap = max(1, _MAX_TILE // _RAYS)
    best = 1
    for d in range(1, min(s, cap) + 1):
        if s % d == 0:
            best = d
    return best


def _make_paper_kernel(compute_dtype, rays_per_tile: int, s_tile: int,
                       num_freq_xyz: int):
    f32 = jnp.float32

    def kernel(
        pts_ref,      # (3, T) f32, sample-major: lane j*R + r
        dc_ref,       # (128, R) f32 per-ray direction contribution
        w0_ref, b0_ref,           # (256, dim_xyz) regrouped [x|sin|cos]
        wx1_ref, bx1_ref, wx2_ref, bx2_ref, wx3_ref, bx3_ref,
        w4e_ref, w4h_ref, b4_ref,  # skip layer: (256, dim_xyz) + (256, 256)
        wx5_ref, bx5_ref, wx6_ref, bx6_ref, wx7_ref, bx7_ref,
        wfeat_ref, bfeat_ref,      # (256, 256) — output NOT ReLU'd
        walpha_ref, balpha_ref,    # (1, 256) — reads feat
        wd0_ref, bd0_ref,          # (128, 256) feat half of layers_dir[0]
        wd1_ref, bd1_ref, wd2_ref, bd2_ref,  # (128, 128); layers_dir[3] dead
        wrgb_ref, brgb_ref,        # (3, 128)
        out_ref,      # (4, T) f32 [r, g, b, sigma]
    ):
        def c(x):
            return x.astype(compute_dtype)

        def mm(w_ref, x):
            return jnp.dot(c(w_ref[:]), c(x), preferred_element_type=f32)

        pts = pts_ref[:]
        # Double-angle sinusoid recurrence (see mlp_t.py for the numerics
        # argument: phase error doubles per octave = the f32 floor of the
        # direct x*2^f argument).
        sf = jnp.sin(pts)
        cf = jnp.cos(pts)
        sins, coss = [sf], [cf]
        for _ in range(num_freq_xyz - 1):
            sf, cf = 2.0 * sf * cf, 1.0 - 2.0 * sf * sf
            sins.append(sf)
            coss.append(cf)
        enc = jnp.concatenate([pts] + sins + coss, axis=0)  # (dim_xyz, T)

        h = jnp.maximum(mm(w0_ref, enc) + b0_ref[:], 0.0)
        for w_ref, b_ref in ((wx1_ref, bx1_ref), (wx2_ref, bx2_ref),
                             (wx3_ref, bx3_ref)):
            h = jnp.maximum(mm(w_ref, h) + b_ref[:], 0.0)
        # Skip: layers_xyz[4] consumes [enc; h] (reference models.py:166-168)
        h = jnp.maximum(mm(w4e_ref, enc) + mm(w4h_ref, h) + b4_ref[:], 0.0)
        for w_ref, b_ref in ((wx5_ref, bx5_ref), (wx6_ref, bx6_ref),
                             (wx7_ref, bx7_ref)):
            h = jnp.maximum(mm(w_ref, h) + b_ref[:], 0.0)

        feat = mm(wfeat_ref, h) + bfeat_ref[:]          # (256, T), no ReLU
        sigma = mm(walpha_ref, feat) + balpha_ref[:]    # (1, T) from feat

        dc = pltpu.repeat(dc_ref[:], s_tile, axis=1)    # (128, T)
        hd = jnp.maximum(mm(wd0_ref, feat) + dc + bd0_ref[:], 0.0)
        for w_ref, b_ref in ((wd1_ref, bd1_ref), (wd2_ref, bd2_ref)):
            hd = jnp.maximum(mm(w_ref, hd) + b_ref[:], 0.0)
        rgb = mm(wrgb_ref, hd) + brgb_ref[:]
        out_ref[:] = jnp.concatenate([rgb, sigma], axis=0)

    return kernel


def _prepare_weights_paper_t(params: Params, compute_dtype, num_freq_xyz):
    """Transpose/regroup the PaperNeRF params for the feature-major kernel.

    Weight matrices cast to ``compute_dtype``; biases stay f32 (out, 1)
    columns. The encoded-xyz weight rows of layer 0 and the skip layer are
    regrouped [x | sin | cos] to match the kernel's sublane-concat order."""
    dim_xyz = 3 + 6 * num_freq_xyz

    def wt(x):
        return jnp.asarray(x, compute_dtype).T

    def bt(p):
        return jnp.asarray(p["bias"], jnp.float32).reshape(-1, 1)

    def regroup(kernel):
        wx, ws, wc = _split_rows(jnp.asarray(kernel), num_freq_xyz)
        return jnp.concatenate([wt(wx), wt(ws), wt(wc)], axis=1)

    lx = params["layers_xyz"]
    w4 = jnp.asarray(lx[4]["kernel"])  # (dim_xyz + 256, 256), rows [enc; h]
    wdir = jnp.asarray(params["layers_dir"][0]["kernel"])  # (256 + dim_dir, 128)
    out = [regroup(lx[0]["kernel"]), bt(lx[0])]
    for i in (1, 2, 3):
        out += [wt(lx[i]["kernel"]), bt(lx[i])]
    out += [regroup(w4[:dim_xyz]), wt(w4[dim_xyz:]), bt(lx[4])]
    for i in (5, 6, 7):
        out += [wt(lx[i]["kernel"]), bt(lx[i])]
    out += [wt(params["fc_feat"]["kernel"]), bt(params["fc_feat"])]
    out += [wt(params["fc_alpha"]["kernel"]), bt(params["fc_alpha"])]
    out += [wt(wdir[:_WIDTH]), bt(params["layers_dir"][0])]
    for i in (1, 2):
        out += [wt(params["layers_dir"][i]["kernel"]),
                bt(params["layers_dir"][i])]
    out += [wt(params["fc_rgb"]["kernel"]), bt(params["fc_rgb"])]
    return tuple(out)


@functools.partial(
    jax.jit,
    static_argnames=("num_freq_xyz", "num_freq_dir", "interpret",
                     "compute_dtype"),
)
def fused_paper_mlp_t(
    params: Params,
    pts: jnp.ndarray,        # (N, S, 3)
    viewdirs: jnp.ndarray,   # (N, 3) per-ray
    num_freq_xyz: int = 6,
    num_freq_dir: int = 4,
    interpret: bool = False,
    compute_dtype: str = "float32",
) -> jnp.ndarray:
    """Feature-major fused PaperNeRF evaluation.

    Returns (N, S, 4) raw [r, g, b, sigma] float32.
    """
    from ...ops.encoding import positional_encoding

    n, s = pts.shape[0], pts.shape[1]
    wdir = jnp.asarray(params["layers_dir"][0]["kernel"])
    direnc = positional_encoding(viewdirs, num_freq_dir)          # (N, dim_dir)
    dcontrib = jnp.dot(direnc, wdir[_WIDTH:],
                       preferred_element_type=jnp.float32)        # (N, 128)

    r = _RAYS
    padded = -(-n // r) * r
    if padded != n:
        pad = padded - n
        pts = jnp.pad(pts, ((0, pad), (0, 0), (0, 0)))
        dcontrib = jnp.pad(dcontrib, ((0, pad), (0, 0)))

    cdtype = jnp.dtype(compute_dtype)
    weights = _prepare_weights_paper_t(params, cdtype, num_freq_xyz)

    s_t = _sample_tile(s)
    g_r = padded // r
    g_s = s // s_t
    t = r * s_t
    # Tile layout: ray tile gr, sample chunk gs; lane within tile = j*R + r'
    # (sample-major). Host-side transform: (N, S, 3) ->
    # (3, g_r, g_s, s_t, R) -> (3, g_r*g_s*T).
    pts_t = (
        pts.reshape(g_r, r, g_s, s_t, 3)
        .transpose(4, 0, 2, 3, 1)
        .reshape(3, g_r * g_s * t)
    ).astype(jnp.float32)
    dc_t = dcontrib.T.astype(jnp.float32)                      # (128, padded)

    in_specs = [
        pl.BlockSpec((3, t), lambda i: (0, i), memory_space=pltpu.VMEM),
        # Per-ray-tile dc block, constant across that tile's g_s sample
        # chunks (no re-fetch while the block index is unchanged).
        pl.BlockSpec((_DIR_WIDTH, r), lambda i, _gs=g_s: (0, i // _gs),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec(w.shape, lambda i, _nd=w.ndim: (0,) * _nd,
                     memory_space=pltpu.VMEM)
        for w in weights
    ]
    out = pl.pallas_call(
        _make_paper_kernel(cdtype, r, s_t, num_freq_xyz),
        out_shape=jax.ShapeDtypeStruct((4, g_r * g_s * t), jnp.float32),
        grid=(g_r * g_s,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((4, t), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pts_t, dc_t, *weights)
    # Invert the tile layout back to (N, S, 4).
    return (
        out.reshape(4, g_r, g_s, s_t, r)
        .transpose(1, 4, 2, 3, 0)
        .reshape(padded, s, 4)[:n]
    )
