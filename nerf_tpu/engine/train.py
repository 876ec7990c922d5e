"""Training engine: optimizer, LR schedule, jitted train step, ray batching.

Behavioral parity target (reference: krrish94/nerf-pytorch, train_nerf.py):
  - loss = MSE(coarse) + MSE(fine) on the selected ray batch (train_nerf.py:244-258)
  - PSNR reported from the COMBINED loss (train_nerf.py:258-260 — SURVEY.md §5
    quirk 4's convention, kept so reported numbers are comparable)
  - per-step exponential LR decay lr * factor^(step / (lr_decay * 1000))
    (train_nerf.py:264-270) — expressed as an optax schedule
  - optimizer selected by name from the config (train_nerf.py:137-143)

TPU-native design: the entire step — ray selection from a device-resident ray
store, rendering, loss, backward, Adam update, LR decay — is ONE jit-compiled
function with no host round trips. The reference's host-side
numpy random-choice ray selection (train_nerf.py:214-226) becomes a keyed
``jax.random.randint`` gather on device.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..ops.math import img2mse, mse2psnr
from .renderer import RenderSettings, render_rays

Params = Dict[str, Any]


class TrainState(NamedTuple):
    """Replicatable training state (a pure pytree)."""

    step: jnp.ndarray                 # scalar int32
    params_coarse: Params
    params_fine: Optional[Params]     # None when no fine model is configured
    opt_state: optax.OptState


def exponential_lr_schedule(
    initial_lr: float, lr_decay: float, lr_decay_factor: float
) -> optax.Schedule:
    """lr * factor^(step / (lr_decay * 1000)) — reference train_nerf.py:264-270."""
    return optax.exponential_decay(
        init_value=initial_lr,
        transition_steps=int(lr_decay * 1000),
        decay_rate=lr_decay_factor,
        staircase=False,
    )


def make_optimizer(
    optimizer_type: str,
    lr: float,
    lr_decay: Optional[float] = None,
    lr_decay_factor: Optional[float] = None,
    grad_clip_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    """Build an optax optimizer by (reference torch.optim) name.

    The reference does ``getattr(torch.optim, cfg.optimizer.type)``
    (train_nerf.py:139-141); we map the common names onto optax.
    ``grad_clip_norm`` adds global-norm clipping in front (a production
    stability feature the reference lacks).
    """
    schedule: Any
    if lr_decay and lr_decay_factor:
        schedule = exponential_lr_schedule(lr, lr_decay, lr_decay_factor)
    else:
        schedule = lr
    name = optimizer_type.lower()
    table: Dict[str, Callable[..., optax.GradientTransformation]] = {
        "adam": optax.adam,
        "adamw": optax.adamw,
        "sgd": optax.sgd,
        "rmsprop": optax.rmsprop,
        "adagrad": optax.adagrad,
        "adamax": optax.adamax,
        "adadelta": optax.adadelta,
        "nadam": optax.nadam,
        "radam": optax.radam,
        "rprop": optax.rprop,
    }
    if name not in table:
        # The few torch.optim names with no optax first-order equivalent
        # (getattr surface, reference train_nerf.py:139-141) get a targeted
        # explanation; anything else gets the list + the nearest alias.
        no_equiv = {
            "asgd": "averaged SGD has no optax equivalent; 'sgd' is nearest",
            "lbfgs": "L-BFGS needs a line-search-driven update loop "
                     "(optax.lbfgs) incompatible with the fixed train step; "
                     "use 'adam'",
            "sparseadam": "JAX arrays are dense; use 'adam'",
        }
        import difflib

        hint = no_equiv.get(name)
        if hint is None:
            close = difflib.get_close_matches(name, table, n=1)
            hint = f"did you mean {close[0]!r}?" if close else None
        raise ValueError(
            f"Unsupported optimizer {optimizer_type!r}; available: "
            f"{sorted(table)}" + (f" ({hint})" if hint else "")
        )
    if name == "rprop":
        # optax.rprop takes a plain float lr (its per-parameter adaptive step
        # sizes subsume a schedule — same reason torch.optim.Rprop has no
        # lr_scheduler interaction); use the initial lr, ignore the decay.
        opt = optax.rprop(learning_rate=float(lr))
    else:
        opt = table[name](learning_rate=schedule)
    if grad_clip_norm:
        opt = optax.chain(optax.clip_by_global_norm(float(grad_clip_norm)), opt)
    # optax.flatten: run the update on ONE raveled parameter vector instead of
    # 14 tiny per-leaf tensors. Profiling (docs/PARITY.md, training roofline)
    # showed per-leaf Adam updates of 128x128-class tensors costing 18% of
    # the train step on TPU (tiny-op launch latency); flattening is
    # numerically identical and worth ~5% end-to-end.
    return optax.flatten(opt)


def create_train_state(
    model_coarse,
    model_fine,
    optimizer: optax.GradientTransformation,
    key: jax.Array,
    dtype=jnp.float32,
) -> TrainState:
    k_coarse, k_fine = jax.random.split(key)
    params_coarse = model_coarse.init(k_coarse, dtype=dtype)
    params_fine = model_fine.init(k_fine, dtype=dtype) if model_fine is not None else None
    trainable = {"coarse": params_coarse, "fine": params_fine}
    opt_state = optimizer.init(trainable)
    return TrainState(jnp.asarray(0, jnp.int32), params_coarse, params_fine, opt_state)


class StepMetrics(NamedTuple):
    loss: jnp.ndarray
    coarse_loss: jnp.ndarray
    fine_loss: jnp.ndarray
    psnr: jnp.ndarray


def make_loss_fn(model_coarse, model_fine, settings: RenderSettings):
    """The single definition of the training loss: MSE(coarse) + MSE(fine)
    on the rendered ray batch (reference train_nerf.py:244-258). Shared by
    the serial, sharded, and multi-scene step builders so the convention
    (including PSNR-from-combined-loss) lives in exactly one place.

    Returns loss_fn(trainable, ro, rd, target, key) -> (loss, (coarse, fine)).
    """
    # The fused Pallas kernel is forward-only (no AD rule); anything built on
    # this loss differentiates the XLA path.
    settings = dataclasses.replace(settings, use_pallas=False)

    def loss_fn(trainable, ro, rd, target, key):
        out = render_rays(
            model_coarse, trainable["coarse"],
            model_fine, trainable["fine"],
            ro, rd, settings, key,
        )
        coarse_loss = img2mse(out.coarse.rgb, target)
        fine_loss = (
            img2mse(out.fine.rgb, target) if out.fine is not None else jnp.zeros(())
        )
        return coarse_loss + fine_loss, (coarse_loss, fine_loss)

    return loss_fn


def guard_non_finite(finite, new_trainable, trainable, new_opt_state, opt_state):
    """Roll back params + optimizer state when ``finite`` is False (NaN guard)."""
    guarded_trainable = jax.tree.map(
        lambda new, old: jnp.where(finite, new, old), new_trainable, trainable
    )
    guarded_opt = jax.tree.map(
        lambda new, old: jnp.where(finite, new, old), new_opt_state, opt_state
    )
    return guarded_trainable, guarded_opt


def all_finite(loss, grads):
    finite = jnp.isfinite(loss)
    for g in jax.tree.leaves(grads):
        finite = jnp.logical_and(finite, jnp.all(jnp.isfinite(g)))
    return finite


def make_train_step(
    model_coarse,
    model_fine,
    settings: RenderSettings,
    optimizer: optax.GradientTransformation,
    jit: bool = True,
    nan_guard: bool = False,
) -> Callable[[TrainState, jnp.ndarray, jnp.ndarray, jnp.ndarray, jax.Array],
              Tuple[TrainState, StepMetrics]]:
    """Build the jitted training step.

    step(state, ray_origins (B,3), ray_directions (B,3), target (B,3), key)
      -> (new_state, StepMetrics)

    ``nan_guard``: skip the parameter/optimizer update (keeping only the step
    increment) whenever the loss or any gradient is non-finite — a cheap
    failure-detection mechanism so a single bad batch can't destroy a long
    run (the reference has no failure handling at all, SURVEY.md §5).
    """
    loss_fn = make_loss_fn(model_coarse, model_fine, settings)

    def train_step(state: TrainState, ro, rd, target, key):
        trainable = {"coarse": state.params_coarse, "fine": state.params_fine}
        (loss, (closs, floss)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, ro, rd, target, key
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, trainable)
        new_trainable = optax.apply_updates(trainable, updates)
        if nan_guard:
            new_trainable, opt_state = guard_non_finite(
                all_finite(loss, grads), new_trainable, trainable,
                opt_state, state.opt_state,
            )
        new_state = TrainState(
            state.step + 1, new_trainable["coarse"], new_trainable["fine"], opt_state
        )
        metrics = StepMetrics(loss, closs, floss, mse2psnr(loss))
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,)) if jit else train_step


def make_train_loop(
    model_coarse,
    model_fine,
    settings: RenderSettings,
    optimizer: optax.GradientTransformation,
    batch_size: int,
    steps_per_call: int,
    jit: bool = True,
    nan_guard: bool = False,
    sample_mode: str = "gather",
):
    """Build a multi-step jitted training loop (the production hot path).

    loop(state, ro_store (N,3), rd_store (N,3), tgt_store (N,3), base_key)
      -> (state, StepMetrics with (steps_per_call,)-shaped fields)

    ``lax.scan``s ``steps_per_call`` full training steps — on-device ray-batch
    sampling included — inside ONE compiled program. Each dispatch through
    the host (expensive over a remote runtime: ~10-30 ms) then amortizes over
    K steps instead of paying per step; per-step RNG derives from
    fold_in(base_key, state.step) so resume/replay stay deterministic
    regardless of K.
    """
    step_fn = make_train_step(
        model_coarse, model_fine, settings, optimizer, jit=False, nan_guard=nan_guard
    )

    def loop(state: TrainState, ro_store, rd_store, tgt_store, base_key):
        def body(carry, _):
            st = carry
            key = jax.random.fold_in(base_key, st.step)
            k_sample, k_step = jax.random.split(key)
            ro, rd, tgt = sample_ray_batch(
                k_sample, ro_store, rd_store, tgt_store, batch_size,
                mode=sample_mode,
            )
            st, metrics = step_fn(st, ro, rd, tgt, k_step)
            return st, metrics

        return jax.lax.scan(body, state, None, length=steps_per_call)

    return jax.jit(loop, donate_argnums=(0,)) if jit else loop


def sample_ray_batch(
    key: jax.Array,
    ray_origins: jnp.ndarray,
    ray_directions: jnp.ndarray,
    targets: jnp.ndarray,
    batch_size: int,
    mode: str = "gather",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sample ``batch_size`` rays from a flat device-resident ray store.

    Replaces the reference's host-side image-then-pixels numpy selection
    (train_nerf.py:210-226) with on-device selection inside the jitted step.

    mode="gather": ``batch_size`` independent uniform row indices — exact
    uniform-with-replacement via a random row-gather over the store.

    mode="sliced": one uniform offset + a contiguous ``dynamic_slice`` —
    a random window of the store. Rays within a batch are distinct
    (without replacement within the window). Near-uniform, not exactly:
    the offset is uniform over [0, n-B], so the B-1 rows nearest either
    store edge are included less often (row 0 only when off==0) — a
    negligible bias for production stores (n >> B) but real at tiny-store
    scale; use gather where exactness matters. REQUIRES the store to be
    pre-shuffled (see ``data.rays_store.shuffle_ray_store``): on an
    image-ordered store a window is a correlated scanline.

    Measured on a v5e: the two are within ~1% even on a 16M-row store
    (the 1024-row gather is negligible next to the MLP work —
    docs/PARITY.md roofline notes), so gather stays the default for its
    exact reference-matching distribution.
    """
    if mode == "sliced":
        n = ray_origins.shape[0]
        if n < batch_size:
            # Shapes are static at trace time: fail here instead of letting
            # randint(maxval <= minval) produce undefined values under jit
            # and dynamic_slice silently clamp to a degenerate window.
            raise ValueError(
                f"sliced sampling needs store size >= batch ({n} < {batch_size})"
            )
        off = jax.random.randint(key, (), 0, n - batch_size + 1)
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, off, batch_size)  # noqa: E731
        return sl(ray_origins), sl(ray_directions), sl(targets)
    if mode != "gather":
        raise ValueError(f"unknown ray-sampling mode {mode!r}")
    idx = jax.random.randint(key, (batch_size,), 0, ray_origins.shape[0])
    return ray_origins[idx], ray_directions[idx], targets[idx]
