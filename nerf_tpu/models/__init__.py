"""Model registry.

The reference selects model classes by name via
``getattr(models, cfg.models.coarse.type)`` (train_nerf.py:117,
eval_nerf.py:107). We expose the same string-keyed lookup plus an explicit
registry helper.
"""

from __future__ import annotations

from typing import Any, Dict, Type

from .mlp import (
    FlexibleNeRFModel,
    MultiHeadNeRFModel,
    PaperNeRFModel,
    ReplicateNeRFModel,
    VeryTinyNeRFModel,
    linear,
    linear_init,
)

MODEL_REGISTRY: Dict[str, Type[Any]] = {
    "VeryTinyNeRFModel": VeryTinyNeRFModel,
    "MultiHeadNeRFModel": MultiHeadNeRFModel,
    "ReplicateNeRFModel": ReplicateNeRFModel,
    "PaperNeRFModel": PaperNeRFModel,
    "FlexibleNeRFModel": FlexibleNeRFModel,
}


def get_model(name: str, **kwargs):
    """Instantiate a model family by its reference class name.

    Unknown kwargs that a given family does not accept are rejected loudly —
    unlike the reference, which silently dropped num_layers/hidden_size
    (train_nerf.py:117-123; see SURVEY.md §5 quirk 1).
    """
    try:
        cls = MODEL_REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"Unknown model type {name!r}; available: {sorted(MODEL_REGISTRY)}"
        ) from None
    return cls(**kwargs)


__all__ = [
    "MODEL_REGISTRY",
    "get_model",
    "VeryTinyNeRFModel",
    "MultiHeadNeRFModel",
    "ReplicateNeRFModel",
    "PaperNeRFModel",
    "FlexibleNeRFModel",
    "linear",
    "linear_init",
]
