"""Checkpointing: native msgpack checkpoints + reference-format interop.

Reference checkpoint schema (krrish94/nerf-pytorch, train_nerf.py:373-388):
a ``torch.save`` dict with keys ``iter``, ``model_coarse_state_dict``,
``model_fine_state_dict`` (or None), ``optimizer_state_dict``, ``loss``,
``psnr``. ``eval_nerf.py:138-143`` additionally reads optional
``height/width/focal_length`` keys that train never writes; our exporter can
emit them.

Native format: a single ``.ntc`` file = flax msgpack of a plain dict
(step / params / opt_state / scalars / meta). No torch required at runtime —
torch is only imported (lazily) for the interop paths.

torch<->JAX weight layout: ``torch.nn.Linear.weight`` is (out, in); our
``kernel`` is (in, out). Conversion transposes. State-dict keys like
``layers_xyz.0.weight`` map onto nested ``params["layers_xyz"][0]["kernel"]``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _import_torch():
    """Import torch AFTER the JAX backend is initialized.

    Observed repeatedly on the remote (axon) TPU relay: processes that
    import torch before their first JAX device operation see host<->device
    transfers degraded ~1000x for the life of the process (a 120 KB fetch:
    ~30 ms -> ~50 s), while jax-first processes in the same period are
    fine. The relay also has independent flaky-claim episodes, so this is
    a strong correlation rather than a proven mechanism — but initializing
    the backend before a heavyweight thread-spawning library costs nothing
    and removed the slowdown every time it was applied. See CLAUDE.md.

    Host-only callers (checkpoint conversion/inspection that never touches
    the accelerator): force the CPU backend first —
    ``jax.config.update("jax_platforms", "cpu")`` before any backend init —
    or this touch claims the single TPU chip (convert_checkpoint.py does
    exactly this).

    A REAL device op is required: ``jax.devices()`` merely lists devices
    (measured: torch imported after devices() alone still degraded the
    process), while one tiny compute+fetch establishes the relay
    connection, after which post-torch roundtrips stay at ~30 ms.
    """
    np.asarray(jax.numpy.zeros(8) + 0)
    import torch  # lazy: interop only

    return torch


Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# torch state-dict <-> params pytree
# ---------------------------------------------------------------------------

def convert_torch_state_dict(state_dict: Dict[str, Any]) -> Params:
    """Convert a reference ``nn.Module.state_dict()``-style mapping to a params pytree.

    Accepts torch tensors or numpy arrays as values. ``*.weight`` (out, in)
    becomes ``kernel`` (in, out); ``*.bias`` stays ``bias``.
    """
    params: Params = {}
    # Collect list sizes first so indexed entries become real Python lists.
    list_sizes: Dict[str, int] = {}
    for key in state_dict:
        parts = key.split(".")
        if len(parts) == 3 and parts[1].isdigit():
            list_sizes[parts[0]] = max(list_sizes.get(parts[0], 0), int(parts[1]) + 1)
    for name, size in list_sizes.items():
        params[name] = [{} for _ in range(size)]

    for key, value in state_dict.items():
        arr = np.asarray(getattr(value, "numpy", lambda: value)())
        parts = key.split(".")
        if parts[-1] == "weight":
            leaf_name, leaf = "kernel", arr.T.copy()
        elif parts[-1] == "bias":
            leaf_name, leaf = "bias", arr.copy()
        else:
            raise ValueError(f"Unrecognized state-dict leaf: {key}")
        if len(parts) == 2:
            params.setdefault(parts[0], {})[leaf_name] = leaf
        elif len(parts) == 3 and parts[1].isdigit():
            params[parts[0]][int(parts[1])][leaf_name] = leaf
        else:
            raise ValueError(f"Unrecognized state-dict key structure: {key}")
    return params


def to_torch_state_dict(params: Params) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_torch_state_dict` (values are numpy arrays)."""
    out: Dict[str, np.ndarray] = {}

    def emit(prefix: str, layer: Dict[str, Any]) -> None:
        out[f"{prefix}.weight"] = np.asarray(layer["kernel"]).T.copy()
        out[f"{prefix}.bias"] = np.asarray(layer["bias"]).copy()

    for name, value in params.items():
        if isinstance(value, (list, tuple)):
            for i, layer in enumerate(value):
                emit(f"{name}.{i}", layer)
        else:
            emit(name, value)
    return out


def _module_prefix_order(params: Params) -> list:
    """The reference's per-family ``nn.Module`` attribute registration order
    (nerf/models.py) — the order ``model.parameters()`` yields tensors in,
    which fixes the param indices of its optimizer state
    (train_nerf.py:137-143).
    """
    prefixes = set(params.keys())
    if "fc_out" in prefixes:                       # FlexibleNeRF, no viewdirs
        return ["layer1", "layers_xyz", "fc_out"]
    if "layer1" in prefixes and "layers_xyz" in prefixes:  # FlexibleNeRF
        return ["layer1", "layers_xyz", "layers_dir", "fc_alpha", "fc_rgb", "fc_feat"]
    if "layers_xyz" in prefixes:                   # PaperNeRFModel
        return ["layers_xyz", "fc_feat", "fc_alpha", "layers_dir", "fc_rgb"]
    if "layer3_1" in prefixes:                     # MultiHeadNeRFModel
        return ["layer1", "layer2", "layer3_1", "layer3_2", "layer4", "layer5", "layer6"]
    if "fc_alpha" in prefixes:                     # ReplicateNeRFModel
        return ["layer1", "layer2", "layer3", "fc_alpha", "layer4", "layer5", "fc_rgb"]
    return ["layer1", "layer2", "layer3"]          # VeryTinyNeRFModel


def reference_state_dict_order(params: Params) -> list:
    """Ordered state-dict keys ("layer1.weight", "layer1.bias", ...) matching
    the reference model's ``parameters()`` iteration order."""
    keys = []
    for prefix in _module_prefix_order(params):
        if prefix not in params:
            continue
        value = params[prefix]
        if isinstance(value, (list, tuple)):
            for i in range(len(value)):
                keys.append(f"{prefix}.{i}.weight")
                keys.append(f"{prefix}.{i}.bias")
        else:
            keys.append(f"{prefix}.weight")
            keys.append(f"{prefix}.bias")
    return keys


def _find_adam_moments(opt_state: Any):
    """Locate (count, mu, nu) inside an optax opt-state pytree.

    Handles both live optax namedtuples (ScaleByAdamState, possibly nested in
    chain tuples) and the list-form trees restored from ``.ntc`` msgpack
    (where namedtuples became plain lists). Returns None if absent.
    """
    fields = getattr(opt_state, "_fields", None)
    if fields is not None and {"count", "mu", "nu"} <= set(fields):
        return opt_state.count, opt_state.mu, opt_state.nu
    def _moment_like(x: Any) -> bool:
        # mu/nu are either param-trees (dicts) or, with optax.flatten, one
        # raveled 1-D vector.
        return isinstance(x, dict) or getattr(x, "ndim", None) == 1

    if isinstance(opt_state, dict):
        if {"count", "mu", "nu"} <= set(opt_state):
            return opt_state["count"], opt_state["mu"], opt_state["nu"]
        values: Any = opt_state.values()
    elif isinstance(opt_state, (list, tuple)):
        if (
            len(opt_state) == 3
            and _moment_like(opt_state[1])
            and _moment_like(opt_state[2])
            and not isinstance(opt_state[0], (dict, list, tuple))
            and getattr(opt_state[0], "ndim", 0) == 0
        ):
            return opt_state[0], opt_state[1], opt_state[2]
        values = opt_state
    else:
        return None
    for item in values:
        found = _find_adam_moments(item)
        if found is not None:
            return found
    return None


def reference_optimizer_state_dict(
    opt_state: Any,
    params_coarse: Params,
    params_fine: Optional[Params],
    lr: float = 5.0e-3,
    betas: tuple = (0.9, 0.999),
    eps: float = 1e-8,
) -> Dict[str, Any]:
    """Build a ``torch.optim.Adam``-format state dict from an optax opt state.

    The reference resumes with ``optimizer.load_state_dict(...)``
    (train_nerf.py:157-163) over ``list(coarse.parameters()) +
    list(fine.parameters())``; this maps our Adam first/second moments (mu/nu)
    onto those param indices, transposing weight moments to torch's (out, in)
    layout. With no Adam moments in ``opt_state`` the result is a valid EMPTY
    Adam state dict (fresh moments on resume) rather than ``{}``, which the
    reference's ``load_state_dict`` would crash on.
    """
    torch = _import_torch()

    def ordered(tree: Optional[Params], params: Optional[Params]) -> list:
        if tree is None or params is None:
            return []
        sd = to_torch_state_dict(tree)
        return [sd[k] for k in reference_state_dict_order(params)]

    num_params = len(ordered(params_coarse, params_coarse)) + len(
        ordered(params_fine, params_fine)
    )
    state: Dict[int, Dict[str, Any]] = {}
    found = _find_adam_moments(opt_state) if opt_state is not None else None
    if found is not None:
        count, mu, nu = found
        if not isinstance(mu, dict):
            # optax.flatten stores the moments as one raveled vector over the
            # trainable tree {"coarse": ..., "fine": ...}; unravel with the
            # params template (identical structure by construction).
            from jax.flatten_util import ravel_pytree

            template = {"coarse": params_coarse, "fine": params_fine}
            _, unravel = ravel_pytree(jax.tree.map(np.asarray, template))
            mu = unravel(np.asarray(mu))
            nu = unravel(np.asarray(nu))
        mu_c, mu_f = mu.get("coarse"), mu.get("fine")
        nu_c, nu_f = nu.get("coarse"), nu.get("fine")
        exp_avgs = ordered(mu_c, params_coarse) + ordered(mu_f, params_fine)
        exp_avg_sqs = ordered(nu_c, params_coarse) + ordered(nu_f, params_fine)
        step_t = torch.tensor(float(np.asarray(count)))
        for i, (m, v) in enumerate(zip(exp_avgs, exp_avg_sqs)):
            state[i] = {
                "step": step_t,
                "exp_avg": torch.from_numpy(np.asarray(m, np.float32)),
                "exp_avg_sq": torch.from_numpy(np.asarray(v, np.float32)),
            }
        num_params = len(exp_avgs)
    return {
        "state": state,
        "param_groups": [
            {
                "lr": float(lr),
                "betas": tuple(betas),
                "eps": float(eps),
                "weight_decay": 0,
                "amsgrad": False,
                "params": list(range(num_params)),
            }
        ],
    }


def load_reference_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference ``.ckpt`` (a ``torch.save`` file) into numpy pytrees.

    Returns a dict with ``step``, ``params_coarse``, ``params_fine`` (or None),
    ``loss``, ``psnr``, and any extra scalar keys present.

    Uses the standalone torch-free reader (``engine.torch_reader`` —
    bit-for-bit parity with ``torch.load`` pinned by
    tests/test_torch_reader.py), so the read path neither depends on torch
    nor trips the relay hazard ``_import_torch`` exists for. torch remains
    a fallback for any exotic file the restricted unpickler refuses.
    """
    from .torch_reader import load_torch_file

    try:
        ckpt = load_torch_file(path)
    except OSError:
        # Plain file errors (missing path, permissions) are NOT reader
        # failures — torch.load would hit the same wall after paying a
        # warning plus a backend-initializing torch import. Let them surface.
        raise
    except Exception as e:
        # Surface the reader's reason before falling back: a silent
        # fallback would mask reader regressions (torch-ful installs) or
        # turn the real error into "ModuleNotFoundError: torch"
        # (torch-less installs).
        import warnings

        warnings.warn(
            f"standalone torch reader failed on {path!r} ({e!r}); "
            "falling back to torch.load"
        )
        torch = _import_torch()

        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    out: Dict[str, Any] = {
        "step": int(ckpt.get("iter", 0)),
        "params_coarse": convert_torch_state_dict(ckpt["model_coarse_state_dict"]),
        "params_fine": (
            convert_torch_state_dict(ckpt["model_fine_state_dict"])
            if ckpt.get("model_fine_state_dict") is not None
            else None
        ),
        "loss": float(ckpt["loss"]) if "loss" in ckpt else None,
        "psnr": float(ckpt["psnr"]) if "psnr" in ckpt else None,
    }
    for extra in ("height", "width", "focal_length"):
        if extra in ckpt:
            out[extra] = ckpt[extra]
    return out


def export_reference_checkpoint(
    path: str,
    step: int,
    params_coarse: Params,
    params_fine: Optional[Params],
    loss: float,
    psnr: float,
    optimizer_state_dict: Optional[Dict[str, Any]] = None,
    hwf: Optional[tuple] = None,
    opt_state: Any = None,
    lr: float = 5.0e-3,
) -> None:
    """Write a reference-schema ``.ckpt`` readable by the reference's eval_nerf.py
    AND resumable by its train_nerf.py (optimizer_state_dict carries our Adam
    moments when ``opt_state`` is given; otherwise a valid empty Adam state)."""
    torch = _import_torch()

    if optimizer_state_dict is None:
        optimizer_state_dict = reference_optimizer_state_dict(
            opt_state, params_coarse, params_fine, lr=lr
        )
    ckpt: Dict[str, Any] = {
        "iter": int(step),
        "model_coarse_state_dict": {
            k: torch.from_numpy(np.asarray(v)) for k, v in to_torch_state_dict(params_coarse).items()
        },
        "model_fine_state_dict": (
            {k: torch.from_numpy(np.asarray(v)) for k, v in to_torch_state_dict(params_fine).items()}
            if params_fine is not None
            else None
        ),
        "optimizer_state_dict": optimizer_state_dict,
        "loss": float(loss),
        "psnr": float(psnr),
    }
    if hwf is not None:
        ckpt["height"], ckpt["width"], ckpt["focal_length"] = hwf
    torch.save(ckpt, path)


# ---------------------------------------------------------------------------
# Native checkpoints (no torch dependency)
# ---------------------------------------------------------------------------

def _tuples_to_lists(tree: Any) -> Any:
    """Recursively convert (named)tuples to lists so msgpack accepts the tree.

    Leaf order is preserved, so restoring with a structure template +
    jax.tree.leaves round-trips exactly (see train_nerf.py resume path).
    """
    if isinstance(tree, dict):
        return {k: _tuples_to_lists(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_tuples_to_lists(v) for v in tree]
    return tree


def save_checkpoint(path: str, state: Dict[str, Any]) -> None:
    """Serialize an arbitrary pytree-of-arrays dict with flax msgpack."""
    from flax import serialization

    state = jax.tree.map(np.asarray, jax.device_get(state))
    data = serialization.msgpack_serialize(_tuples_to_lists(state))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def save_json_sidecar(path: str, meta: Dict[str, Any]) -> None:
    with open(path, "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)


def latest_checkpoint(logdir: str, prefix: str = "checkpoint", suffix: str = ".ntc") -> Optional[str]:
    """Find the highest-step checkpoint file in ``logdir``."""
    if not os.path.isdir(logdir):
        return None
    best, best_step = None, -1
    for name in os.listdir(logdir):
        if name.startswith(prefix) and name.endswith(suffix):
            digits = "".join(ch for ch in name[len(prefix):-len(suffix)] if ch.isdigit())
            step = int(digits) if digits else 0
            if step > best_step:
                best, best_step = os.path.join(logdir, name), step
    return best


def load_models_and_params(checkpoint_path: str, cfg):
    """Shared CLI loader: build the configured models and load their weights.

    Handles both native ``.ntc`` and reference ``.ckpt`` checkpoints; for
    reference files the models are built with ``reference_compat_shapes``
    (the reference never passed size hyperparameters through — SURVEY.md §5
    quirk 1 — so every shipped checkpoint is a default-shaped 4x128 model
    regardless of what its config claims). Used by eval_nerf.py and
    distill_dataset.py; returns
    ``(model_coarse, model_fine, params_coarse, params_fine, ckpt)`` with
    params as device arrays and ``ckpt`` the raw checkpoint dict (callers
    may read extras like the optional height/width/focal_length keys,
    reference eval_nerf.py:138-143).
    """
    from ..config import model_from_config  # lazy: breaks the import cycle

    is_reference = checkpoint_path.endswith(".ckpt")
    model_coarse = model_from_config(
        cfg.models.coarse, reference_compat_shapes=is_reference
    )
    model_fine = (
        model_from_config(cfg.models.fine, reference_compat_shapes=is_reference)
        if "fine" in cfg.models else None
    )
    ckpt = (
        load_reference_checkpoint(checkpoint_path)
        if is_reference else load_checkpoint(checkpoint_path)
    )
    import jax.numpy as jnp

    params_coarse = jax.tree.map(jnp.asarray, ckpt["params_coarse"])
    params_fine = (
        jax.tree.map(jnp.asarray, ckpt["params_fine"])
        if ckpt.get("params_fine") is not None else None
    )
    return model_coarse, model_fine, params_coarse, params_fine, ckpt
