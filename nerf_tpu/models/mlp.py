"""NeRF radiance-field MLP families as functional JAX pytrees.

Behavioral parity targets (reference: krrish94/nerf-pytorch, nerf/models.py):
  - ``VeryTinyNeRFModel``   -> models.py:4   (3 linear layers, joint xyz+dir input)
  - ``MultiHeadNeRFModel``  -> models.py:34  (separate sigma / rgb heads)
  - ``ReplicateNeRFModel``  -> models.py:81  (NeRF supplementary-figure layout)
  - ``PaperNeRFModel``      -> models.py:123 (8x256 trunk, skip at layer 4, 4x128 dir branch)
  - ``FlexibleNeRFModel``   -> models.py:185 (configurable depth/width/skip; the
                               model every shipped pretrained checkpoint uses)

Design: each family is a frozen dataclass holding only *static* hyperparameters,
with ``init(key) -> params`` and ``apply(params, x) -> (..., 4)`` pure
functions. Params are nested dicts of ``{"kernel": (in, out), "bias": (out,)}``
whose tree structure mirrors the reference's module attribute names, so the
torch->JAX checkpoint converter (nerf_tpu/engine/checkpoint.py) is a mechanical
key walk + transpose. All ``apply`` fns are jit/vmap/grad-safe with static
shapes, and all heavy math is ``x @ W`` matmuls the MXU executes directly.

Initialization matches ``torch.nn.Linear`` defaults: kernel and bias both
~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

Known reference quirks handled here:
  * ``FlexibleNeRFModel.forward`` references an undefined ``self.linear_layers``
    (models.py:243) so any config that actually reaches a skip connection
    crashes in the reference. We implement the *intended* skip (concat the
    encoded xyz back in), using the constructor's condition (models.py:210)
    consistently for both shapes and forward.
  * The entry scripts never pass num_layers/hidden_size through
    (train_nerf.py:117-123), so all pretrained checkpoints are the 4x128
    default. ``FlexibleNeRFModel()`` with no arguments reproduces that shape.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Linear-layer primitives
# ---------------------------------------------------------------------------

def linear_init(key: jax.Array, in_dim: int, out_dim: int, dtype=jnp.float32) -> Params:
    """torch.nn.Linear-style init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for W and b."""
    bound = 1.0 / math.sqrt(in_dim)
    k_w, k_b = jax.random.split(key)
    return {
        "kernel": jax.random.uniform(k_w, (in_dim, out_dim), dtype, -bound, bound),
        "bias": jax.random.uniform(k_b, (out_dim,), dtype, -bound, bound),
    }


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    kernel = p["kernel"].astype(x.dtype)
    bias = p["bias"].astype(x.dtype)
    return jnp.dot(x, kernel, preferred_element_type=x.dtype) + bias


def _relu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.relu(x)


def _xyz_dir_dims(
    num_encoding_fn_xyz: int,
    num_encoding_fn_dir: int,
    include_input_xyz: bool,
    include_input_dir: bool,
) -> tuple[int, int]:
    dim_xyz = (3 if include_input_xyz else 0) + 2 * 3 * num_encoding_fn_xyz
    dim_dir = (3 if include_input_dir else 0) + 2 * 3 * num_encoding_fn_dir
    return dim_xyz, dim_dir


# ---------------------------------------------------------------------------
# Model families
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class VeryTinyNeRFModel:
    """3-layer MLP over jointly-encoded (xyz [, dir]) input. Reference models.py:4-31."""

    filter_size: int = 128
    num_encoding_functions: int = 6
    use_viewdirs: bool = True

    @property
    def dim_xyz(self) -> int:
        return 3 + 3 * 2 * self.num_encoding_functions

    @property
    def dim_dir(self) -> int:
        return self.dim_xyz if self.use_viewdirs else 0

    @property
    def input_dim(self) -> int:
        return self.dim_xyz + self.dim_dir

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        k1, k2, k3 = jax.random.split(key, 3)
        f = self.filter_size
        return {
            "layer1": linear_init(k1, self.input_dim, f, dtype),
            "layer2": linear_init(k2, f, f, dtype),
            "layer3": linear_init(k3, f, 4, dtype),
        }

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        x = _relu(linear(params["layer1"], x))
        x = _relu(linear(params["layer2"], x))
        return linear(params["layer3"], x)


@dataclasses.dataclass(frozen=True)
class MultiHeadNeRFModel:
    """Separate sigma / rgb heads fed by a shared trunk. Reference models.py:34-78."""

    hidden_size: int = 128
    num_encoding_functions: int = 6
    use_viewdirs: bool = True

    @property
    def dim_xyz(self) -> int:
        return 3 + 3 * 2 * self.num_encoding_functions

    @property
    def dim_dir(self) -> int:
        return self.dim_xyz if self.use_viewdirs else 0

    @property
    def input_dim(self) -> int:
        return self.dim_xyz + self.dim_dir

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        ks = jax.random.split(key, 6)
        h = self.hidden_size
        return {
            "layer1": linear_init(ks[0], self.dim_xyz, h, dtype),
            "layer2": linear_init(ks[1], h, h, dtype),
            "layer3_1": linear_init(ks[2], h, 1, dtype),
            "layer3_2": linear_init(ks[3], h, h, dtype),
            "layer4": linear_init(ks[4], self.dim_dir + h, h, dtype),
            "layer5": linear_init(ks[5], h, h, dtype),
            "layer6": linear_init(jax.random.fold_in(key, 6), h, 3, dtype),
        }

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        xyz, view = x[..., : self.dim_xyz], x[..., self.dim_xyz :]
        h = _relu(linear(params["layer1"], xyz))
        h = _relu(linear(params["layer2"], h))
        sigma = linear(params["layer3_1"], h)
        feat = _relu(linear(params["layer3_2"], h))
        h = jnp.concatenate([feat, view], axis=-1)
        h = _relu(linear(params["layer4"], h))
        h = _relu(linear(params["layer5"], h))
        rgb = linear(params["layer6"], h)
        return jnp.concatenate([rgb, sigma], axis=-1)


@dataclasses.dataclass(frozen=True)
class ReplicateNeRFModel:
    """Supplementary-figure NeRF: 3-layer trunk + 2-layer dir branch. Reference models.py:81-120."""

    hidden_size: int = 256
    num_layers: int = 4  # accepted for registry parity; the layout is fixed (models.py:101-108)
    num_encoding_fn_xyz: int = 6
    num_encoding_fn_dir: int = 4
    include_input_xyz: bool = True
    include_input_dir: bool = True

    @property
    def dims(self) -> tuple[int, int]:
        return _xyz_dir_dims(
            self.num_encoding_fn_xyz,
            self.num_encoding_fn_dir,
            self.include_input_xyz,
            self.include_input_dir,
        )

    @property
    def dim_xyz(self) -> int:
        return self.dims[0]

    @property
    def dim_dir(self) -> int:
        return self.dims[1]

    @property
    def input_dim(self) -> int:
        return self.dim_xyz + self.dim_dir

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        ks = jax.random.split(key, 7)
        h = self.hidden_size
        return {
            "layer1": linear_init(ks[0], self.dim_xyz, h, dtype),
            "layer2": linear_init(ks[1], h, h, dtype),
            "layer3": linear_init(ks[2], h, h, dtype),
            "fc_alpha": linear_init(ks[3], h, 1, dtype),
            "layer4": linear_init(ks[4], h + self.dim_dir, h // 2, dtype),
            "layer5": linear_init(ks[5], h // 2, h // 2, dtype),
            "fc_rgb": linear_init(ks[6], h // 2, 3, dtype),
        }

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        xyz, direction = x[..., : self.dim_xyz], x[..., self.dim_xyz :]
        h = _relu(linear(params["layer1"], xyz))
        h = _relu(linear(params["layer2"], h))
        feat = linear(params["layer3"], h)
        alpha = linear(params["fc_alpha"], h)
        y = _relu(linear(params["layer4"], jnp.concatenate([feat, direction], axis=-1)))
        y = _relu(linear(params["layer5"], y))
        rgb = linear(params["fc_rgb"], y)
        return jnp.concatenate([rgb, alpha], axis=-1)


@dataclasses.dataclass(frozen=True)
class PaperNeRFModel:
    """NeRF paper Fig. 7 model: 8x256 trunk with a skip at layer 4. Reference models.py:123-182.

    Note the reference hard-codes the 8/256/128 layout regardless of the
    num_layers/hidden_size arguments (models.py:147-160); we keep that
    behavior (and the constructor args) for checkpoint compatibility.
    """

    num_layers: int = 8
    hidden_size: int = 256
    skip_connect_every: int = 4
    num_encoding_fn_xyz: int = 6
    num_encoding_fn_dir: int = 4
    include_input_xyz: bool = True
    include_input_dir: bool = True
    use_viewdirs: bool = True

    @property
    def dim_xyz(self) -> int:
        return _xyz_dir_dims(
            self.num_encoding_fn_xyz, self.num_encoding_fn_dir,
            self.include_input_xyz, self.include_input_dir,
        )[0]

    @property
    def dim_dir(self) -> int:
        if not self.use_viewdirs:
            return 0
        return _xyz_dir_dims(
            self.num_encoding_fn_xyz, self.num_encoding_fn_dir,
            self.include_input_xyz, self.include_input_dir,
        )[1]

    @property
    def input_dim(self) -> int:
        return self.dim_xyz + self.dim_dir

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        ks = jax.random.split(key, 16)
        layers_xyz = []
        for i in range(8):
            if i == 0:
                in_dim = self.dim_xyz
            elif i == 4:
                in_dim = self.dim_xyz + 256
            else:
                in_dim = 256
            layers_xyz.append(linear_init(ks[i], in_dim, 256, dtype))
        dir_in = 256 + self.dim_dir if self.use_viewdirs else 256
        layers_dir = [linear_init(ks[8], dir_in, 128, dtype)]
        for i in range(3):
            layers_dir.append(linear_init(ks[9 + i], 128, 128, dtype))
        return {
            "layers_xyz": layers_xyz,
            "fc_feat": linear_init(ks[12], 256, 256, dtype),
            "fc_alpha": linear_init(ks[13], 256, 1, dtype),
            "layers_dir": layers_dir,
            "fc_rgb": linear_init(ks[14], 128, 3, dtype),
        }

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        xyz, dirs = x[..., : self.dim_xyz], x[..., self.dim_xyz :]
        h = xyz
        for i in range(8):
            if i == 4:
                h = linear(params["layers_xyz"][i], jnp.concatenate([xyz, h], axis=-1))
            else:
                h = linear(params["layers_xyz"][i], h)
            h = _relu(h)
        feat = linear(params["fc_feat"], h)
        alpha = linear(params["fc_alpha"], feat)
        if self.use_viewdirs:
            h = linear(params["layers_dir"][0], jnp.concatenate([feat, dirs], axis=-1))
        else:
            h = linear(params["layers_dir"][0], feat)
        h = _relu(h)
        # The reference forward only runs layers_dir[1:3] (models.py:178-180);
        # layers_dir[3] exists in the checkpoint but is dead. We match that.
        for i in range(1, 3):
            h = _relu(linear(params["layers_dir"][i], h))
        rgb = linear(params["fc_rgb"], h)
        return jnp.concatenate([rgb, alpha], axis=-1)


@dataclasses.dataclass(frozen=True)
class FlexibleNeRFModel:
    """Configurable-depth NeRF MLP — the model used by every shipped checkpoint.

    Reference models.py:185-256. Defaults (4 layers, 128 hidden) reproduce the
    pretrained checkpoints' shapes (see BASELINE.md caveat).
    """

    num_layers: int = 4
    hidden_size: int = 128
    skip_connect_every: int = 4
    num_encoding_fn_xyz: int = 6
    num_encoding_fn_dir: int = 4
    include_input_xyz: bool = True
    include_input_dir: bool = True
    use_viewdirs: bool = True

    @property
    def dim_xyz(self) -> int:
        return _xyz_dir_dims(
            self.num_encoding_fn_xyz, self.num_encoding_fn_dir,
            self.include_input_xyz, self.include_input_dir,
        )[0]

    @property
    def dim_dir(self) -> int:
        if not self.use_viewdirs:
            return 0
        return _xyz_dir_dims(
            self.num_encoding_fn_xyz, self.num_encoding_fn_dir,
            self.include_input_xyz, self.include_input_dir,
        )[1]

    @property
    def input_dim(self) -> int:
        return self.dim_xyz + self.dim_dir

    def _has_skip(self, i: int) -> bool:
        """Skip-connection condition for layers_xyz[i] (reference models.py:210)."""
        return (
            i % self.skip_connect_every == 0
            and i > 0
            and i != self.num_layers - 1
        )

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        h = self.hidden_size
        ks = jax.random.split(key, self.num_layers + 4)
        params: Params = {"layer1": linear_init(ks[0], self.dim_xyz, h, dtype)}
        layers_xyz = []
        for i in range(self.num_layers - 1):
            in_dim = self.dim_xyz + h if self._has_skip(i) else h
            layers_xyz.append(linear_init(ks[1 + i], in_dim, h, dtype))
        params["layers_xyz"] = layers_xyz
        if self.use_viewdirs:
            params["layers_dir"] = [
                linear_init(ks[self.num_layers], self.dim_dir + h, h // 2, dtype)
            ]
            params["fc_alpha"] = linear_init(ks[self.num_layers + 1], h, 1, dtype)
            params["fc_rgb"] = linear_init(ks[self.num_layers + 2], h // 2, 3, dtype)
            params["fc_feat"] = linear_init(ks[self.num_layers + 3], h, h, dtype)
        else:
            params["fc_out"] = linear_init(ks[self.num_layers], h, 4, dtype)
        return params

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        if self.use_viewdirs:
            xyz, view = x[..., : self.dim_xyz], x[..., self.dim_xyz :]
        else:
            xyz = x[..., : self.dim_xyz]
        h = linear(params["layer1"], xyz)
        for i, layer in enumerate(params["layers_xyz"]):
            if self._has_skip(i):
                h = jnp.concatenate([h, xyz], axis=-1)
            h = _relu(linear(layer, h))
        if self.use_viewdirs:
            feat = _relu(linear(params["fc_feat"], h))
            alpha = linear(params["fc_alpha"], h)
            h = jnp.concatenate([feat, view], axis=-1)
            for layer in params["layers_dir"]:
                h = _relu(linear(layer, h))
            rgb = linear(params["fc_rgb"], h)
            return jnp.concatenate([rgb, alpha], axis=-1)
        return linear(params["fc_out"], h)
