"""Hierarchical coarse→fine NeRF rendering engine.

Behavioral parity target (reference: krrish94/nerf-pytorch):
  - ``predict_and_render_radiance`` -> nerf/train_utils.py:28-127
  - ``run_one_iter_of_nerf``        -> nerf/train_utils.py:130-202
  - ``run_network``                 -> nerf/train_utils.py:8-25

TPU-native design (inverts the reference's eager-mode architecture):
  * ONE statically-shaped, jit-compiled function per (models, settings)
    combination, built by the ``make_*`` factories below. The reference's
    two nested Python chunking loops (ray chunks train_utils.py:170, point
    chunks :19) become: no chunking at all for training batches (they fit),
    and a ``lax.map`` over fixed-size ray megabatches for full-image
    rendering — compiled once, executed as a device-side loop with zero
    host round trips.
  * RNG is threaded explicitly: one key per step, split into
    (perturb, coarse-noise, fine-noise), replacing torch's global RNG.
  * The fine-pass depth samples are ``stop_gradient``-ed exactly like the
    reference's ``z_samples.detach()`` (train_utils.py:103).

Reference quirk note: ``run_one_iter_of_nerf`` calls
``predict_and_render_radiance`` WITHOUT forwarding ``mode`` (train_utils.py:
171-181), so reference validation renders silently use the *train* section's
sampling settings for everything except chunksize. We do the correct thing
(each mode uses its own settings); for the shipped configs the sections only
differ in num_random_rays/chunksize, so numerics are unaffected.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.encoding import positional_encoding
from ..ops.rays import ndc_rays, ray_aabb_interval
from ..ops.sampling import coarse_z_values, perturb_z_values, sample_pdf
from ..ops.volume import RenderOutputs, volume_render_radiance_field

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Static (hashable) per-mode render configuration.

    Mirrors the reference's ``cfg.nerf.{train,validation}`` section plus the
    dataset/encoding fields the render path needs (SURVEY.md §5 config schema).
    """

    num_coarse: int = 64
    num_fine: int = 64
    chunksize: int = 16384
    perturb: bool = True
    radiance_field_noise_std: float = 0.0
    white_background: bool = False
    lindisp: bool = False
    near: float = 2.0
    far: float = 6.0
    use_viewdirs: bool = True
    use_ndc: bool = False
    # NDC needs the camera intrinsics (reference train_utils.py:158).
    height: int = 0
    width: int = 0
    focal_length: float = 0.0
    # Positional-encoding config (reference train_nerf.py:102-114).
    num_encoding_fn_xyz: int = 6
    num_encoding_fn_dir: int = 4
    include_input_xyz: bool = True
    include_input_dir: bool = True
    log_sampling_xyz: bool = True
    log_sampling_dir: bool = True
    # Coarse-to-fine encoding annealing (BARF eq. 14) for joint pose+scene
    # optimization: xyz band k is windowed by ops.encoding
    # .coarse_to_fine_window(alpha). Negative = off (the production render
    # and training paths). Static -> folds into constants per compile.
    pe_alpha_xyz: float = -1.0
    # Empty-space acceleration (no reference equivalent): when set to
    # (xmin, ymin, zmin, xmax, ymax, zmax), every ray's sample interval is
    # tightened to its crossing of this axis-aligned box (ops.rays
    # .ray_aabb_interval); rays that miss keep the full [near, far]. Derive
    # from a trained field with engine.geometry.density_aabb. Incompatible
    # with NDC (whose rays live in the projected cube already). Same sample
    # counts, denser placement on occupied space — use to trade samples for
    # speed at equal quality (docs/PARITY.md "AABB-tightened sampling").
    aabb: Optional[Tuple[float, float, float, float, float, float]] = None
    # Use the fused Pallas encode+MLP kernel for radiance-field evaluation
    # (forward-only — rendering/eval; training autodiffs the XLA path).
    # Fused families: default-shape FlexibleNeRF (ops/pallas/mlp_t.py,
    # supports_fused) and PaperNeRF 8x256 (ops/pallas/paper_t.py,
    # supports_fused_paper); other shapes fall back to XLA.
    use_pallas: bool = False
    # Use the fused Pallas TRAINING kernels (custom-VJP forward+backward)
    # for radiance-field evaluation. Fused families: default-shape
    # FlexibleNeRF 4x128 (ops/pallas/flex_train.py; XLA fwd+bwd collapses
    # to 39.8 TFLOP/s at the fine pass's (1024, 128) shape while the fused
    # forward holds 68 — docs/PARITY.md width-128 custom-VJP row) and
    # PaperNeRF 8x256 (ops/pallas/paper_train.py; measured 1.34x/1.75x
    # over XLA fwd+bwd on a v5e — width-256 row). Other shapes fall back
    # to XLA.
    # TRAINING-ONLY CONTRACT: gradients w.r.t. points/viewdirs are zero by
    # design (rays are data; fine z-samples are detached) — never enable
    # for pose/camera optimization.
    use_pallas_train: bool = False
    # Rematerialize the encode+MLP evaluation in the backward pass instead of
    # storing per-point activations (jax.checkpoint). Trades ~1/3 more FLOPs
    # for O(points x hidden) less HBM traffic — wins for large ray batches
    # where training is activation-bandwidth bound.
    remat: bool = False
    # MLP compute dtype for radiance-field evaluation: "float32" or
    # "bfloat16". bf16 runs the matmuls at the MXU-native rate (p99 relative
    # output error ~7e-3 — invisible in 8-bit images); recommended for
    # rendering/eval, keep float32 for training parity runs.
    compute_dtype: str = "float32"

    def eval_variant(self) -> "RenderSettings":
        """Deterministic copy for validation/eval rendering."""
        return dataclasses.replace(
            self, perturb=False, radiance_field_noise_std=0.0
        )


class RayRenderResult(NamedTuple):
    """Coarse + (optional) fine composited maps for a ray batch."""

    coarse: RenderOutputs
    fine: Optional[RenderOutputs]

    @property
    def rgb(self) -> jnp.ndarray:
        """The displayable map: fine if present, else coarse (eval_nerf.py:178)."""
        return self.fine.rgb if self.fine is not None else self.coarse.rgb


def render_maps_dict(out: RayRenderResult) -> Dict[str, jnp.ndarray]:
    """The canonical per-ray output-maps dict: rgb/disp/acc/depth for coarse
    (+fine when present). Single assembly point shared by the serial image
    renderer, both sharded renderers (parallel/dp.py), and the driver entry
    check — a new output key added here reaches every path at once.

    ``weights`` (per-sample, (..., S)) is deliberately NOT included: at image
    scale it is S x larger than every other map (an 800px frame's fine
    weights alone are ~320 MB) — callers needing it use the RayRenderResult
    from render_rays / make_render_fn directly.
    """
    res = {
        "rgb_coarse": out.coarse.rgb,
        "disp_coarse": out.coarse.disp,
        "acc_coarse": out.coarse.acc,
        "depth_coarse": out.coarse.depth,
    }
    if out.fine is not None:
        res.update(
            rgb_fine=out.fine.rgb,
            disp_fine=out.fine.disp,
            acc_fine=out.fine.acc,
            depth_fine=out.fine.depth,
        )
    return res


def encode_points(
    pts: jnp.ndarray,
    viewdirs: Optional[jnp.ndarray],
    s: RenderSettings,
) -> jnp.ndarray:
    """Positional-encode sample points (+ broadcast encoded viewdirs).

    Equivalent of the reference's ``run_network`` embedding block
    (train_utils.py:10-17), fused into the jitted graph.

    pts: (..., S, 3); viewdirs: (..., 3) or None. Returns (..., S, D).
    """
    enc = positional_encoding(
        pts, s.num_encoding_fn_xyz, s.include_input_xyz, s.log_sampling_xyz
    )
    if s.pe_alpha_xyz >= 0.0 and s.num_encoding_fn_xyz > 0:
        from ..ops.encoding import coarse_to_fine_window

        w = coarse_to_fine_window(
            s.num_encoding_fn_xyz, s.pe_alpha_xyz, enc.dtype
        )
        c = pts.shape[-1]
        mask = jnp.concatenate([
            jnp.ones(c if s.include_input_xyz else 0, enc.dtype),
            jnp.repeat(w, 2 * c),  # per-freq [sin(C), cos(C)] blocks
        ])
        enc = enc * mask
    if viewdirs is not None:
        enc_dir = positional_encoding(
            viewdirs, s.num_encoding_fn_dir, s.include_input_dir, s.log_sampling_dir
        )
        enc_dir = jnp.broadcast_to(
            enc_dir[..., None, :], pts.shape[:-1] + (enc_dir.shape[-1],)
        )
        enc = jnp.concatenate([enc, enc_dir], axis=-1)
    return enc


def _eval_radiance_field(model, params, pts, viewdirs, s: RenderSettings):
    """Evaluate the radiance field at sample points: fused Pallas kernel when
    enabled + applicable, else positional-encode + MLP apply via XLA."""
    # Training kernels first: the custom-VJP pair replaces BOTH directions
    # (use_pallas_train — see the RenderSettings field for the contract).
    if (s.use_pallas_train and viewdirs is not None and s.log_sampling_xyz
            and s.log_sampling_dir and s.pe_alpha_xyz < 0.0
            and jax.default_backend() == "tpu"):
        from ..ops.pallas.flex_train import (
            fused_flex_mlp_train,
            supports_fused_flex_train,
        )
        from ..ops.pallas.paper_train import (
            fused_paper_mlp_train,
            supports_fused_paper_train,
        )

        if supports_fused_flex_train(model, params) and pts.ndim == 3:
            return fused_flex_mlp_train(
                params, pts, viewdirs,
                num_freq_xyz=model.num_encoding_fn_xyz,
                num_freq_dir=model.num_encoding_fn_dir,
                compute_dtype=s.compute_dtype,
            )
        if supports_fused_paper_train(model, params) and pts.ndim == 3:
            return fused_paper_mlp_train(
                params, pts, viewdirs,
                num_freq_xyz=model.num_encoding_fn_xyz,
                num_freq_dir=model.num_encoding_fn_dir,
                compute_dtype=s.compute_dtype,
            )
    # pe_alpha annealing is XLA-path only (the fused kernel computes its own
    # unwindowed encoding in-register).
    if (s.use_pallas and viewdirs is not None and s.log_sampling_xyz
            and s.log_sampling_dir and s.pe_alpha_xyz < 0.0
            # The fused kernels are TPU Mosaic programs; on any other backend
            # (a CPU-only host rendering a reference checkpoint with the
            # default --renderer pallas) they fail to lower — fall back to
            # the numerically-equivalent XLA path instead of crashing.
            and jax.default_backend() == "tpu"):
        from ..ops.pallas.mlp import supports_fused
        from ..ops.pallas.mlp_t import fused_mlp_t
        from ..ops.pallas.paper_t import fused_paper_mlp_t, supports_fused_paper

        if supports_fused(model, params) and pts.ndim == 3:
            return fused_mlp_t(params, pts, viewdirs, compute_dtype=s.compute_dtype)
        if supports_fused_paper(model, params) and pts.ndim == 3:
            return fused_paper_mlp_t(
                params, pts, viewdirs,
                num_freq_xyz=model.num_encoding_fn_xyz,
                num_freq_dir=model.num_encoding_fn_dir,
                compute_dtype=s.compute_dtype,
            )

    def eval_fn(p, pts_, viewdirs_):
        enc = encode_points(pts_, viewdirs_, s)
        if s.compute_dtype != "float32":
            # Encoding stays f32 (high-frequency sinusoid precision); only
            # the MLP matmuls drop to the compute dtype. Output back to f32
            # for compositing.
            enc = enc.astype(jnp.dtype(s.compute_dtype))
        out = model.apply(p, enc)
        return out.astype(jnp.float32)

    if s.remat:
        eval_fn = jax.checkpoint(eval_fn)
    return eval_fn(params, pts, viewdirs)


def _render_stage(model, params, pts, viewdirs, z_vals, rd, s: RenderSettings, noise_key,
                  final_dists=None):
    """One coarse-or-fine stage: radiance-field eval + compositing.

    Pallas path = feature-major fused encode+MLP kernel (ops/pallas/mlp_t —
    activations never touch HBM) + compositing kernel. The radiance field
    DOES pass through HBM between them: at 16 B/point that is ~2 ms of a
    full 800px frame, which is why the round-1 whole-stage kernel
    (ops/pallas/stage.py) was retired from this path — its point-major
    layout capped tiles at 1k points and lost ~35% to grid overhead
    (see docs/PARITY.md, Pallas notes).
    """
    rf = _eval_radiance_field(model, params, pts, viewdirs, s)
    return _composite(rf, z_vals, rd, s, noise_key, final_dists)


def _composite(rf, z_vals, rd, s: RenderSettings, noise_key, final_dists=None):
    """Volume compositing: always the XLA renderer. Measured on-chip
    (round 2, 800px interleaved A/B): with the feature-major MLP kernel
    feeding it, XLA compositing beats chaining the round-1 Pallas composite
    kernel (592 vs 651 ms/frame bf16) — the scan is bandwidth-trivial and
    XLA fuses it with the surrounding reshapes, while the kernel adds a
    dispatch + layout round-trip (docs/PARITY.md, Pallas notes)."""
    return volume_render_radiance_field(
        rf, z_vals, rd,
        radiance_field_noise_std=s.radiance_field_noise_std,
        white_background=s.white_background,
        noise_key=noise_key,
        final_dists=final_dists,
    )


def render_rays(
    model_coarse,
    params_coarse: Params,
    model_fine,
    params_fine: Optional[Params],
    ray_origins: jnp.ndarray,
    ray_directions: jnp.ndarray,
    settings: RenderSettings,
    key: Optional[jax.Array] = None,
) -> RayRenderResult:
    """Render a flat batch of rays through the coarse→fine hierarchy.

    ray_origins/ray_directions: (N, 3). Pure function of its inputs; jit-safe
    with ``settings`` static. Reference: predict_and_render_radiance
    (train_utils.py:28-127) + the ray-packing prologue of run_one_iter_of_nerf
    (train_utils.py:143-168).
    """
    s = settings
    needs_rng = s.perturb or s.radiance_field_noise_std > 0.0
    if needs_rng and key is None:
        raise ValueError("render_rays needs a PRNG key when perturb/noise is on")
    if key is not None:
        k_perturb, k_noise_c, k_fine, k_noise_f = jax.random.split(key, 4)
    else:
        k_perturb = k_noise_c = k_fine = k_noise_f = None

    viewdirs = None
    if s.use_viewdirs:
        viewdirs = ray_directions / jnp.linalg.norm(
            ray_directions, axis=-1, keepdims=True
        )

    if s.use_ndc:
        ro, rd = ndc_rays(
            s.height, s.width, s.focal_length, 1.0, ray_origins, ray_directions
        )
    else:
        ro, rd = ray_origins, ray_directions

    num_rays = ro.shape[0]
    tightened = None
    if s.aabb is not None and not s.use_ndc:
        if s.num_coarse < 2:
            # last_bin_or_sentinel reads z[..., -2]; a size-1 samples axis
            # would raise an opaque trace-time IndexError.
            raise ValueError(
                "RenderSettings.aabb needs num_coarse >= 2 "
                f"(got {s.num_coarse})"
            )
        near, far = ray_aabb_interval(
            ro, rd, s.aabb[:3], s.aabb[3:], s.near, s.far
        )
        # Only rays whose interval ends BEFORE the far plane get the local
        # bin width: past their box exit, space is known-empty, and the
        # reference's 1e10 sentinel would make any residual boundary density
        # fully opaque. Rays still ending at the far plane — misses AND
        # near-only tightenings (box crossing extends past far) — keep exact
        # reference sentinel semantics: for them the region beyond the last
        # sample is NOT known-empty.
        tightened = far < s.far
    else:
        near = jnp.full((num_rays,), s.near, dtype=ro.dtype)
        far = jnp.full((num_rays,), s.far, dtype=ro.dtype)

    def last_bin_or_sentinel(z):
        if tightened is None:
            return None
        return jnp.where(tightened, z[..., -1] - z[..., -2], 1e10)

    z_vals = coarse_z_values(near, far, s.num_coarse, s.lindisp, dtype=ro.dtype)
    if s.perturb:
        z_vals = perturb_z_values(k_perturb, z_vals)

    pts = ro[..., None, :] + rd[..., None, :] * z_vals[..., :, None]
    coarse = _render_stage(
        model_coarse, params_coarse, pts, viewdirs, z_vals, rd, s, k_noise_c,
        final_dists=last_bin_or_sentinel(z_vals),
    )

    fine = None
    if s.num_fine > 0:
        z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        # Resampling stays on the XLA gather-free formulation even on the
        # pallas path: the fused kernel (ops/pallas/resample.py) measured
        # 742 -> 952 ms/frame at 800px bf16 when wired here — the compare
        # plane is VPU-bound and XLA already fuses it with the CDF build,
        # so the kernel only adds dispatch overhead (docs/PARITY.md).
        z_samples = sample_pdf(
            z_mid,
            coarse.weights[..., 1:-1],
            s.num_fine,
            key=k_fine,
            det=not s.perturb,
        )
        z_samples = jax.lax.stop_gradient(z_samples)
        z_all = jnp.sort(jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1)
        pts = ro[..., None, :] + rd[..., None, :] * z_all[..., :, None]
        fine_params = params_fine if params_fine is not None else params_coarse
        fine_model = model_fine if model_fine is not None else model_coarse
        fine = _render_stage(
            fine_model, fine_params, pts, viewdirs, z_all, rd, s, k_noise_f,
            final_dists=last_bin_or_sentinel(z_all),
        )

    return RayRenderResult(coarse, fine)


def make_render_fn(
    model_coarse,
    model_fine,
    settings: RenderSettings,
    jit: bool = True,
) -> Callable[..., RayRenderResult]:
    """Build ``render(params_coarse, params_fine, ro, rd, key) -> RayRenderResult``
    with models/settings closed over statically."""

    def render(params_coarse, params_fine, ray_origins, ray_directions, key=None):
        return render_rays(
            model_coarse,
            params_coarse,
            model_fine,
            params_fine,
            ray_origins,
            ray_directions,
            settings,
            key,
        )

    return jax.jit(render) if jit else render


def _pad_to_multiple(x: jnp.ndarray, multiple: int) -> Tuple[jnp.ndarray, int]:
    n = x.shape[0]
    padded = (n + multiple - 1) // multiple * multiple
    if padded != n:
        pad_width = [(0, padded - n)] + [(0, 0)] * (x.ndim - 1)
        x = jnp.pad(x, pad_width, mode="edge")
    return x, n


def make_image_render_fn(
    model_coarse,
    model_fine,
    settings: RenderSettings,
    jit: bool = True,
) -> Callable[..., Dict[str, jnp.ndarray]]:
    """Full-image renderer: chunked device-side ``lax.map`` over ray megabatches.

    Returns ``render_image(params_coarse, params_fine, ray_origins,
    ray_directions, key=None) -> dict`` with (H, W[,3])-shaped
    rgb/disp/acc maps for coarse and fine. This replaces the reference's
    host-side chunk loop + concat + reshape (train_utils.py:170-200) with a
    single compiled program; chunk size is ``settings.chunksize`` rays.
    """
    s = settings

    def render_image(params_coarse, params_fine, ray_origins, ray_directions, key=None):
        h, w = ray_origins.shape[0], ray_origins.shape[1]
        ro = ray_origins.reshape(-1, 3)
        rd = ray_directions.reshape(-1, 3)
        chunk = min(s.chunksize, ro.shape[0])
        ro, n = _pad_to_multiple(ro, chunk)
        rd, _ = _pad_to_multiple(rd, chunk)
        num_chunks = ro.shape[0] // chunk
        ro = ro.reshape(num_chunks, chunk, 3)
        rd = rd.reshape(num_chunks, chunk, 3)
        if key is not None:
            keys = jax.random.split(key, num_chunks)
        else:
            keys = jnp.zeros((num_chunks, 2), dtype=jnp.uint32)

        def render_chunk(args):
            ro_c, rd_c, key_c = args
            k = key_c if key is not None else None
            out = render_rays(
                model_coarse, params_coarse, model_fine, params_fine,
                ro_c, rd_c, s, k,
            )
            return render_maps_dict(out)

        maps = jax.lax.map(render_chunk, (ro, rd, keys))
        result = {}
        for name, val in maps.items():
            flat = val.reshape((num_chunks * chunk,) + val.shape[2:])[:n]
            result[name] = flat.reshape((h, w) + val.shape[2:])
        return result

    return jax.jit(render_image) if jit else render_image


def make_pose_render_fn(
    model_coarse,
    model_fine,
    settings: RenderSettings,
    height: int,
    width: int,
    focal: float,
    output: str = "maps",
) -> Callable[..., Any]:
    """Jitted pose -> image renderer with the relay-transfer tricks baked in.

    The shared wrapper behind eval_nerf.py / distill_dataset.py /
    eval_multiscene.py: ray generation happens INSIDE the jit (per view only
    a (3, 4) pose crosses the host<->device boundary, not ~H*W*24 bytes of
    eagerly-built ray bundles, each eager op its own remote dispatch), and
    the displayed map can be cast to uint8 on device so the per-frame fetch
    is 4x smaller and pipelines behind the next frame's compute.

    Returns ``render(params_coarse, params_fine, pose34) -> out`` where
    ``output`` selects:
      - "maps": dict of all (H, W[,3]) maps plus ``rgb_u8`` (eval_nerf.py)
      - "u8":   just the uint8 displayed image (distill_dataset.py)
      - "f32":  the [0,1]-clipped float image (metric evaluation)
    """
    from ..ops.rays import get_ray_bundle

    if output not in ("maps", "u8", "f32"):
        raise ValueError(f"unknown output mode {output!r}")
    base = make_image_render_fn(model_coarse, model_fine, settings, jit=False)

    @jax.jit
    def render(params_coarse, params_fine, pose34):
        ro, rd = get_ray_bundle(height, width, focal, pose34)
        maps = dict(base(params_coarse, params_fine, ro, rd))
        rgb = maps.get("rgb_fine", maps["rgb_coarse"])
        if output == "f32":
            return jnp.clip(rgb, 0.0, 1.0)
        u8 = (jnp.clip(rgb, 0.0, 1.0) * 255.0).astype(jnp.uint8)
        if output == "u8":
            return u8
        maps["rgb_u8"] = u8
        return maps

    return render
