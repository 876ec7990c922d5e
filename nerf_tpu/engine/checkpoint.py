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


def load_reference_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference ``.ckpt`` (torch zip format) into numpy pytrees.

    Returns a dict with ``step``, ``params_coarse``, ``params_fine`` (or None),
    ``loss``, ``psnr``, and any extra scalar keys present.
    """
    import torch  # lazy: interop only

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
) -> None:
    """Write a reference-schema ``.ckpt`` readable by the reference's eval_nerf.py."""
    import torch  # lazy: interop only

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
        "optimizer_state_dict": optimizer_state_dict or {},
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
