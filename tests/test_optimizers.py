"""Optimizer-by-name surface (reference train_nerf.py:139-141's
``getattr(torch.optim, cfg.optimizer.type)`` accepts any torch.optim name;
make_optimizer maps the common ones onto optax and fails helpfully on the
rest)."""

import jax
import jax.numpy as jnp
import pytest

from nerf_tpu.engine.train import make_optimizer

SUPPORTED = [
    "adam", "adamw", "sgd", "rmsprop", "adagrad",
    "adamax", "adadelta", "nadam", "radam", "rprop",
]


@pytest.mark.parametrize("name", SUPPORTED)
def test_supported_names_step(name):
    """Every supported torch.optim name builds and applies one update."""
    opt = make_optimizer(name, 1e-3, 250.0, 0.1)
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    state = opt.init(params)
    grads = {"w": jnp.full((4, 4), 0.5), "b": jnp.full((4,), 0.5)}
    new = params
    for _ in range(2):  # two steps: rprop's first step only sizes its steps
        updates, state = opt.update(grads, state, new)
        new = jax.tree.map(lambda p, u: p + u, new, updates)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in jax.tree.leaves(new))
    # The updates must actually move the weights.
    assert float(jnp.abs(new["w"] - params["w"]).max()) > 0


@pytest.mark.parametrize("name", SUPPORTED)
def test_case_insensitive(name):
    """Reference configs use torch.optim capitalization (Adam, RMSprop...)."""
    make_optimizer(name.capitalize(), 1e-3)


def test_torch_names_without_equivalent_explain():
    with pytest.raises(ValueError, match="sgd"):
        make_optimizer("ASGD", 1e-3)
    with pytest.raises(ValueError, match="line-search"):
        make_optimizer("LBFGS", 1e-3)
    with pytest.raises(ValueError, match="dense"):
        make_optimizer("SparseAdam", 1e-3)


def test_typo_gets_nearest_alias():
    with pytest.raises(ValueError, match="did you mean 'adam'"):
        make_optimizer("adsm", 1e-3)


def test_unknown_name_lists_supported():
    with pytest.raises(ValueError) as ei:
        make_optimizer("totally-unknown", 1e-3)
    for name in SUPPORTED:
        assert name in str(ei.value)
