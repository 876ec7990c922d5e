"""Default configuration schema + config -> engine object builders.

The schema mirrors the reference's YAML layout key-for-key (SURVEY.md §5;
reference config/lego.yml, config/fern.yml) so reference config files load
unmodified. Builders translate config sections into the engine's static
objects (RenderSettings, model instances, optimizer).

Reference quirk 1 (SURVEY.md §5): the reference never passes
num_layers/hidden_size/skip_connect_every to model constructors, so all its
checkpoints are default-shaped (4x128). ``model_from_config`` passes sizes
through by default (the correct behavior); pass
``reference_compat_shapes=True`` to reproduce the reference's
defaults-only construction when loading its pretrained checkpoints.
"""

from __future__ import annotations

from typing import Optional, Tuple

from ..engine.renderer import RenderSettings
from ..engine.train import make_optimizer
from ..models import get_model
from .cfgnode import CfgNode


def get_default_config() -> CfgNode:
    """The full default config tree (reference config/lego.yml schema)."""
    return CfgNode(
        {
            "experiment": {
                "id": "experiment",
                "logdir": "logs",
                "randomseed": 42,
                "train_iters": 200000,
                "validate_every": 100,
                "save_every": 5000,
                "print_every": 100,
                # Failure detection (no reference equivalent, SURVEY.md §5):
                # skip the param/optimizer update on non-finite loss/grads.
                "nan_guard": False,
            },
            "dataset": {
                "type": "blender",
                "basedir": "",
                "cachedir": None,
                "half_res": True,
                "testskip": 1,
                "no_ndc": True,
                "near": 2.0,
                "far": 6.0,
                "downsample_factor": 1,
                "llffhold": 8,
                "spherify": False,
                "path_zflat": False,
            },
            "models": {
                "coarse": _default_model_cfg(),
                "fine": _default_model_cfg(),
            },
            # grad_clip_norm: global-norm gradient clipping; 0 disables
            # (stability feature the reference lacks).
            "optimizer": {"type": "Adam", "lr": 5.0e-3, "grad_clip_norm": 0.0},
            "scheduler": {"lr_decay": 250, "lr_decay_factor": 0.1},
            "nerf": {
                "use_viewdirs": True,
                "encode_position_fn": "positional_encoding",
                "encode_direction_fn": "positional_encoding",
                "train": _default_mode_cfg(train=True),
                "validation": _default_mode_cfg(train=False),
            },
        }
    )


def _default_model_cfg() -> dict:
    return {
        "type": "FlexibleNeRFModel",
        "num_layers": 4,
        "hidden_size": 128,
        "skip_connect_every": 4,
        "num_encoding_fn_xyz": 10,
        "num_encoding_fn_dir": 4,
        "include_input_xyz": True,
        "include_input_dir": True,
        "log_sampling_xyz": True,
        "log_sampling_dir": True,
        "use_viewdirs": True,
    }


def _default_mode_cfg(train: bool) -> dict:
    cfg = {
        "chunksize": 131072,
        "perturb": train,
        "num_coarse": 64,
        "num_fine": 64,
        "white_background": False,
        "radiance_field_noise_std": 0.2 if train else 0.0,
        "lindisp": False,
        # TPU execution knobs (no reference equivalent):
        "use_pallas": False,   # fused Pallas radiance-field kernel (eval only)
        "remat": False,        # rematerialize MLP activations in backward
        "compute_dtype": "float32",  # MLP matmul dtype; bfloat16 = ~30% faster
    }
    if train:
        cfg["num_random_rays"] = 1024
        # Fused custom-VJP training kernels (PaperNeRF 8x256 only; measured
        # 1.34-1.75x over XLA fwd+bwd at compute_dtype bfloat16, 64-128
        # samples/ray — docs/PARITY.md). Under float32 the kernels run
        # HIGHEST-precision for parity and measure ~0.5x XLA (numerics
        # checking only). Zero grads to rays by design; never used by pose
        # optimization.
        cfg["use_pallas_train"] = False
        # Ray-batch selection from the device-resident store (engine.train.
        # sample_ray_batch): "gather" = independent uniform rows (exact
        # with-replacement), "sliced" = random contiguous window of the
        # shuffled store (train_nerf.py shuffles when this is on). Measured
        # ~1% apart on a v5e even at 16M rows (docs/PARITY.md) — gather
        # stays default for its exact reference-matching distribution.
        cfg["ray_sampling"] = "gather"
    return cfg


def load_config(path: str, overrides: Optional[list] = None) -> CfgNode:
    """Load a YAML (or Python-source) config merged over the defaults
    (new keys permitted). The reference's pre-rename schema
    (config/default.yml, config/tiny.yaml — SURVEY.md §2.15) is
    auto-migrated at merge time, so the reference's OWN shipped legacy
    files load here even though its train_nerf.py cannot consume them.
    Legacy keys arriving through ``overrides`` still raise with the new
    name (the renamed-key registry stays as the backstop for any legacy
    spelling the migration doesn't cover)."""
    cfg = get_default_config()
    cfg.set_new_allowed(True)
    cfg.register_renamed_key(
        "models.coarse.num_encoding_functions",
        "models.coarse.num_encoding_fn_xyz",
        "the encoding count is now split into xyz and dir variants",
    )
    cfg.register_renamed_key(
        "models.fine.num_encoding_functions", "models.fine.num_encoding_fn_xyz"
    )
    cfg.register_renamed_key("nerf.ndc", "dataset.no_ndc", "note the inverted sense")
    from .cfgnode import _load_cfg_py_source, load_cfg

    if path.endswith(".py"):
        loaded = _load_cfg_py_source(path)
    else:
        with open(path, "r") as f:
            loaded = load_cfg(f)
    migrations = migrate_legacy_schema(loaded)
    if migrations:
        import warnings

        warnings.warn(
            f"{path}: migrated pre-rename schema keys: " + "; ".join(migrations)
        )
    cfg.merge_from_other_cfg(loaded)
    if overrides:
        cfg.merge_from_list(overrides)
    _validate_encoding_fns(cfg)
    return cfg


def migrate_legacy_schema(loaded: CfgNode) -> list:
    """Rewrite the reference's pre-rename schema keys in place, returning a
    description of each migration applied (empty for current-schema files).

    Covers everything config/default.yml and config/tiny.yaml use that the
    current schema spells differently (/root/reference/config/default.yml):
      - models.*.num_encoding_functions: N   (one count for both encoders)
        -> num_encoding_fn_xyz = num_encoding_fn_dir = N
      - nerf.ndc: B                          (inverted sense, moved section)
        -> dataset.no_ndc = not B
      - nerf.near / nerf.far                 (moved section)
        -> dataset.near / dataset.far
    An explicit current-schema key in the same file always wins over the
    value a legacy key would migrate to.
    """
    applied = []
    models = loaded.get("models")
    if isinstance(models, dict):
        for which in ("coarse", "fine"):
            m = models.get(which)
            if isinstance(m, dict) and "num_encoding_functions" in m:
                n = m.pop("num_encoding_functions")
                for new in ("num_encoding_fn_xyz", "num_encoding_fn_dir"):
                    if new not in m:
                        m[new] = n
                applied.append(
                    f"models.{which}.num_encoding_functions={n} -> "
                    "num_encoding_fn_xyz/num_encoding_fn_dir"
                )
    nerf = loaded.get("nerf")
    if isinstance(nerf, dict):
        if "dataset" not in loaded and any(
            k in nerf for k in ("ndc", "near", "far")
        ):
            loaded["dataset"] = CfgNode({})
        if "ndc" in nerf:
            ndc = nerf.pop("ndc")
            if "no_ndc" not in loaded["dataset"]:
                loaded["dataset"]["no_ndc"] = not bool(ndc)
            applied.append(f"nerf.ndc={ndc} -> dataset.no_ndc={not bool(ndc)}")
        for k in ("near", "far"):
            if k in nerf:
                v = nerf.pop(k)
                if k not in loaded["dataset"]:
                    loaded["dataset"][k] = v
                applied.append(f"nerf.{k}={v} -> dataset.{k}")
    return applied


# The registry of encoding functions selectable via nerf.encode_position_fn /
# nerf.encode_direction_fn. The reference accepts the key in its YAMLs but
# never consults it (its train_nerf.py:102-114 always builds
# get_embedding_function); we validate it so a config naming a nonexistent
# encoder fails loudly instead of silently rendering garbage.
ENCODING_FNS = ("positional_encoding",)


def _validate_encoding_fns(cfg: CfgNode) -> None:
    for key in ("encode_position_fn", "encode_direction_fn"):
        name = getattr(cfg.nerf, key, "positional_encoding")
        if name not in ENCODING_FNS:
            raise ValueError(
                f"nerf.{key}={name!r} is not a known encoding function; "
                f"available: {ENCODING_FNS}"
            )


def render_settings_from_config(
    cfg: CfgNode,
    mode: str = "train",
    hwf: Optional[Tuple[int, int, float]] = None,
) -> RenderSettings:
    """Build static RenderSettings from cfg.nerf.<mode> + cfg.dataset + encoding.

    The reference threads these through getattr(options.nerf, mode)
    (train_utils.py:48 et al.); NDC gating follows cfg.dataset.no_ndc
    (train_utils.py:157 — the reference requires a literal False; we treat
    any falsy value as "use NDC").
    """
    mode_cfg = getattr(cfg.nerf, mode)
    model_cfg = cfg.models.coarse
    use_ndc = not cfg.dataset.no_ndc
    height, width, focal = (0, 0, 0.0) if hwf is None else hwf
    if use_ndc and hwf is None:
        raise ValueError("NDC rendering requires hwf=(height, width, focal)")
    return RenderSettings(
        num_coarse=int(mode_cfg.num_coarse),
        num_fine=int(mode_cfg.num_fine),
        chunksize=int(mode_cfg.chunksize),
        perturb=bool(mode_cfg.perturb),
        radiance_field_noise_std=float(mode_cfg.radiance_field_noise_std),
        white_background=bool(mode_cfg.white_background),
        lindisp=bool(mode_cfg.lindisp),
        near=float(cfg.dataset.near),
        far=float(cfg.dataset.far),
        use_viewdirs=bool(cfg.nerf.use_viewdirs),
        use_ndc=use_ndc,
        height=int(height),
        width=int(width),
        focal_length=float(focal),
        num_encoding_fn_xyz=int(model_cfg.num_encoding_fn_xyz),
        num_encoding_fn_dir=int(model_cfg.num_encoding_fn_dir),
        include_input_xyz=bool(model_cfg.include_input_xyz),
        include_input_dir=bool(model_cfg.include_input_dir),
        log_sampling_xyz=bool(model_cfg.log_sampling_xyz),
        log_sampling_dir=bool(model_cfg.log_sampling_dir),
        use_pallas=bool(getattr(mode_cfg, "use_pallas", False)),
        use_pallas_train=bool(getattr(mode_cfg, "use_pallas_train", False)),
        remat=bool(getattr(mode_cfg, "remat", False)),
        compute_dtype=str(getattr(mode_cfg, "compute_dtype", "float32")),
    )


def model_from_config(model_cfg: CfgNode, reference_compat_shapes: bool = False):
    """Instantiate a model family from a cfg.models.{coarse,fine} section."""
    name = model_cfg.type
    if reference_compat_shapes:
        # Reproduce the reference's constructor call (train_nerf.py:117-123):
        # only encoding/viewdir params are passed; sizes use class defaults.
        kwargs: dict = {}
        if name == "VeryTinyNeRFModel":
            kwargs = {"num_encoding_functions": model_cfg.num_encoding_fn_xyz}
        elif name == "MultiHeadNeRFModel":
            kwargs = {"num_encoding_functions": model_cfg.num_encoding_fn_xyz}
        else:
            kwargs = {
                "num_encoding_fn_xyz": model_cfg.num_encoding_fn_xyz,
                "num_encoding_fn_dir": model_cfg.num_encoding_fn_dir,
                "include_input_xyz": model_cfg.include_input_xyz,
                "include_input_dir": model_cfg.include_input_dir,
            }
            if name in ("PaperNeRFModel", "FlexibleNeRFModel"):
                kwargs["use_viewdirs"] = model_cfg.use_viewdirs
        return get_model(name, **kwargs)

    known: dict = {"type": None}
    candidates = {
        "num_layers": "num_layers",
        "hidden_size": "hidden_size",
        "skip_connect_every": "skip_connect_every",
        "num_encoding_fn_xyz": "num_encoding_fn_xyz",
        "num_encoding_fn_dir": "num_encoding_fn_dir",
        "include_input_xyz": "include_input_xyz",
        "include_input_dir": "include_input_dir",
        "use_viewdirs": "use_viewdirs",
    }
    import dataclasses

    from ..models import MODEL_REGISTRY

    cls = MODEL_REGISTRY.get(name)
    if cls is None:
        raise ValueError(f"Unknown model type {name!r}")
    field_names = {f.name for f in dataclasses.fields(cls)}
    kwargs = {}
    for cfg_key, field in candidates.items():
        if cfg_key in model_cfg and field in field_names:
            kwargs[field] = model_cfg[cfg_key]
    # families keyed on a single encoding count use the xyz one
    if "num_encoding_functions" in field_names and "num_encoding_fn_xyz" in model_cfg:
        kwargs["num_encoding_functions"] = model_cfg["num_encoding_fn_xyz"]
    if "filter_size" in field_names and "hidden_size" in model_cfg:
        kwargs["filter_size"] = model_cfg["hidden_size"]
    return get_model(name, **kwargs)


def optimizer_from_config(cfg: CfgNode):
    """Build the optax optimizer + schedule from cfg.optimizer / cfg.scheduler."""
    lr_decay = cfg.scheduler.lr_decay if "scheduler" in cfg else None
    lr_decay_factor = cfg.scheduler.lr_decay_factor if "scheduler" in cfg else None
    return make_optimizer(
        cfg.optimizer.type, float(cfg.optimizer.lr), lr_decay, lr_decay_factor,
        grad_clip_norm=float(getattr(cfg.optimizer, "grad_clip_norm", 0.0)) or None,
    )
