"""Config system tests: CfgNode semantics + loading the REFERENCE's own YAML
files (API-compatibility check) + builder functions."""

import os

import pytest
import yaml

from nerf_tpu.config import (
    CfgNode,
    get_default_config,
    load_config,
    model_from_config,
    optimizer_from_config,
    render_settings_from_config,
)

REF_LEGO = "/root/reference/config/lego.yml"
REF_FERN = "/root/reference/config/fern.yml"


def test_attribute_access_and_nesting():
    cfg = CfgNode({"a": {"b": {"c": 1}}, "d": "x"})
    assert cfg.a.b.c == 1
    assert cfg.d == "x"
    cfg.a.b.c = 2
    assert cfg["a"]["b"]["c"] == 2


def test_freeze_defrost():
    cfg = CfgNode({"a": {"b": 1}})
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.a.b = 5
    cfg.defrost()
    cfg.a.b = 5
    assert cfg.a.b == 5


def test_merge_type_coercion():
    cfg = CfgNode({"lr": 1.0, "n": 5, "name": "x", "tags": [1, 2]})
    other = CfgNode({"lr": 2, "tags": (3, 4)})  # int->float, tuple->list
    cfg.merge_from_other_cfg(other)
    assert cfg.lr == 2.0 and isinstance(cfg.lr, float)
    assert cfg.tags == [3, 4]
    with pytest.raises(ValueError):
        cfg.merge_from_other_cfg(CfgNode({"name": 3}))


def test_merge_rejects_unknown_keys_unless_allowed():
    cfg = CfgNode({"a": 1})
    with pytest.raises(KeyError):
        cfg.merge_from_other_cfg(CfgNode({"zzz": 1}))
    cfg.set_new_allowed(True)
    cfg.merge_from_other_cfg(CfgNode({"zzz": 1}))
    assert cfg.zzz == 1


def test_merge_from_list():
    cfg = CfgNode({"optimizer": {"lr": 5e-3, "type": "Adam"}})
    cfg.merge_from_list(["optimizer.lr", "1e-4", "optimizer.type", "SGD"])
    assert cfg.optimizer.lr == 1e-4
    assert cfg.optimizer.type == "SGD"
    with pytest.raises(KeyError):
        cfg.merge_from_list(["nope.x", "1"])


def test_dump_roundtrip():
    cfg = CfgNode({"a": {"b": 1}, "c": [1, 2]})
    loaded = yaml.safe_load(cfg.dump())
    assert loaded == {"a": {"b": 1}, "c": [1, 2]}


def test_reference_lego_config_loads():
    """The reference's own YAML files must load over our defaults unchanged."""
    cfg = load_config(REF_LEGO)
    assert cfg.dataset.type == "blender"
    assert cfg.nerf.train.num_random_rays == 1024
    assert cfg.nerf.train.chunksize == 131072
    assert cfg.models.coarse.num_encoding_fn_xyz == 10
    assert cfg.scheduler.lr_decay == 250
    s = render_settings_from_config(cfg, "train")
    assert s.num_coarse == 64 and s.num_fine == 64
    assert s.perturb is True and s.use_ndc is False
    assert s.near == 2.0 and s.far == 6.0
    assert s.radiance_field_noise_std == 0.2
    v = render_settings_from_config(cfg, "validation")
    assert v.perturb is False and v.radiance_field_noise_std == 0.0


def test_reference_fern_config_loads_ndc():
    cfg = load_config(REF_FERN)
    assert cfg.dataset.type == "llff"
    assert not cfg.dataset.no_ndc
    s = render_settings_from_config(cfg, "train", hwf=(378, 504, 407.0))
    assert s.use_ndc is True
    assert s.num_fine == 128
    assert s.height == 378 and s.width == 504
    with pytest.raises(ValueError):
        render_settings_from_config(cfg, "train")  # NDC without hwf


def test_model_from_config_sizes_take_effect():
    cfg = load_config(REF_LEGO)
    m = model_from_config(cfg.models.coarse)
    # lego.yml says 8 layers / 128 hidden — honored in the rebuild
    assert m.num_layers == 8 and m.hidden_size == 128
    ref = model_from_config(cfg.models.coarse, reference_compat_shapes=True)
    # reference-compat: class defaults (4 layers) as all pretrained ckpts have
    assert ref.num_layers == 4 and ref.hidden_size == 128
    assert ref.num_encoding_fn_xyz == 10  # encoding params ARE passed through


def test_optimizer_from_config():
    cfg = load_config(REF_LEGO)
    opt = optimizer_from_config(cfg)
    assert opt is not None


def test_default_config_complete():
    cfg = get_default_config()
    for section in ["experiment", "dataset", "models", "optimizer", "scheduler", "nerf"]:
        assert section in cfg


def test_reference_llff_generic_config_loads():
    cfg = load_config("/root/reference/config/llff.yml")
    assert cfg.dataset.type == "llff"
    s = render_settings_from_config(cfg, "train", hwf=(378, 504, 407.0))
    assert s.use_ndc is True


def test_own_config_variants_load():
    for path in ["configs/llff.yml", "configs/tiny.yml", "configs/lego.yml",
                 "configs/fern.yml", "configs/lego_lowres.yml",
                 "configs/synthetic_smoke.yml", "configs/lego_paper.yml",
                 "configs/lego_fused.yml"]:
        cfg = load_config(path)
        render_settings_from_config(cfg, "validation", hwf=(100, 100, 50.0))


def test_lego_fused_config_selects_training_kernels():
    """The shipped flagship-fused config turns on the 4x128 family's
    production TPU path: bf16 + the flex_train custom-VJP kernels (train
    mode only), on the same scene/protocol as lego_lowres."""
    from nerf_tpu.config.schema import model_from_config

    cfg = load_config("configs/lego_fused.yml")
    model = model_from_config(cfg.models.coarse)
    assert type(model).__name__ == "FlexibleNeRFModel"
    assert model.hidden_size == 128 and model.num_layers == 4
    s = render_settings_from_config(cfg, "train")
    assert s.use_pallas_train is True
    assert s.compute_dtype == "bfloat16"
    v = render_settings_from_config(cfg, "validation")
    assert v.use_pallas_train is False


def test_lego_paper_config_selects_training_kernels():
    """The shipped PaperNeRF config turns on the family's production TPU
    path: bf16 compute + the fused custom-VJP training kernels (train
    mode only — validation renders stay on the render path)."""
    from nerf_tpu.config.schema import model_from_config

    cfg = load_config("configs/lego_paper.yml")
    model = model_from_config(cfg.models.coarse)
    assert type(model).__name__ == "PaperNeRFModel"
    assert model.num_encoding_fn_xyz == 10
    s = render_settings_from_config(cfg, "train")
    assert s.use_pallas_train is True
    assert s.compute_dtype == "bfloat16"
    v = render_settings_from_config(cfg, "validation")
    assert v.use_pallas_train is False


def test_tpu_knobs_map_from_config():
    cfg = get_default_config()
    cfg.nerf.train.remat = True
    cfg.nerf.train.use_pallas = True
    cfg.nerf.train.use_pallas_train = True
    s = render_settings_from_config(cfg, "train")
    assert s.remat is True and s.use_pallas is True
    assert s.use_pallas_train is True
    v = render_settings_from_config(cfg, "validation")
    assert v.remat is False and v.use_pallas is False
    assert v.use_pallas_train is False


def test_deprecated_key_registry():
    """Merging a registered deprecated key warns and drops it
    (reference cfgnode.py:270-303 semantics)."""
    cfg = CfgNode({"a": {"b": 1}})
    cfg.register_deprecated_key("a.old")
    with pytest.warns(UserWarning, match="deprecated config key"):
        cfg.merge_from_other_cfg(CfgNode({"a": {"old": 9, "b": 2}}))
    assert "old" not in cfg.a
    assert cfg.a.b == 2
    # double registration is an error
    with pytest.raises(ValueError):
        cfg.register_deprecated_key("a.old")
    # merge_from_list also honors it
    with pytest.warns(UserWarning):
        cfg.merge_from_list(["a.old", "3"])
    assert "old" not in cfg.a


def test_renamed_key_registry():
    """Merging a renamed key raises naming the replacement
    (reference cfgnode.py:281-319 semantics)."""
    cfg = CfgNode({"model": {"width": 128}})
    cfg.register_renamed_key("model.hidden", "model.width", "width now counts lanes")
    with pytest.raises(KeyError, match="renamed to model.width"):
        cfg.merge_from_other_cfg(CfgNode({"model": {"hidden": 64}}))
    with pytest.raises(KeyError, match="width now counts lanes"):
        cfg.merge_from_list(["model.hidden", "64"])


def test_old_schema_config_auto_migrates(tmp_path):
    """The reference's pre-rename schema (config/default.yml uses
    num_encoding_functions, nerf.ndc, nerf.near/far) loads via merge-time
    migration, with a warning naming what moved."""
    path = tmp_path / "old.yml"
    path.write_text(
        "models:\n  coarse:\n    num_encoding_functions: 6\n"
        "nerf:\n  ndc: True\n  near: 0.\n  far: 1.\n"
    )
    with pytest.warns(UserWarning, match="migrated pre-rename schema"):
        cfg = load_config(str(path))
    assert cfg.models.coarse.num_encoding_fn_xyz == 6
    assert cfg.models.coarse.num_encoding_fn_dir == 6
    assert cfg.dataset.no_ndc is False  # inverted sense: ndc True -> no_ndc False
    assert cfg.dataset.near == 0.0 and cfg.dataset.far == 1.0
    # The legacy spelling never lands in the merged tree.
    assert "num_encoding_functions" not in cfg.models.coarse
    assert "ndc" not in cfg.nerf and "near" not in cfg.nerf


def test_old_schema_explicit_new_key_wins(tmp_path):
    """A file carrying BOTH spellings keeps the explicit current-schema
    value; the legacy key migrates only into gaps."""
    path = tmp_path / "mixed.yml"
    path.write_text(
        "models:\n  coarse:\n"
        "    num_encoding_functions: 6\n"
        "    num_encoding_fn_xyz: 10\n"
    )
    with pytest.warns(UserWarning):
        cfg = load_config(str(path))
    assert cfg.models.coarse.num_encoding_fn_xyz == 10  # explicit wins
    assert cfg.models.coarse.num_encoding_fn_dir == 6   # migrated into the gap


def test_old_schema_override_still_raises(tmp_path):
    """Legacy keys arriving through --overrides (not a file) still raise
    with the new name — the renamed-key registry is the backstop."""
    path = tmp_path / "ok.yml"
    path.write_text("experiment:\n  id: x\n")
    with pytest.raises(KeyError, match="num_encoding_fn_xyz"):
        load_config(str(path),
                    ["models.coarse.num_encoding_functions", "6"])


@pytest.mark.parametrize("name", ["default.yml", "tiny.yaml"])
def test_reference_legacy_configs_load(name):
    """The reference's SHIPPED legacy-schema files load end-to-end —
    strictly more functional than the reference, whose own train_nerf.py
    cannot consume them (SURVEY.md §2.15). Values assert against
    /root/reference/config/default.yml:20,31 (tiny.yaml shares the schema)."""
    path = os.path.join("/root/reference/config", name)
    if not os.path.exists(path):
        pytest.skip(f"reference config {name} not present")
    with pytest.warns(UserWarning, match="migrated pre-rename schema"):
        cfg = load_config(path)
    assert cfg.models.coarse.num_encoding_fn_xyz == 6
    assert cfg.models.fine.num_encoding_fn_dir == 6
    assert cfg.dataset.no_ndc is False          # nerf.ndc: True, inverted
    assert cfg.dataset.near == 0.0 and cfg.dataset.far == 1.0
    assert cfg.optimizer.type == "SGD"
    # The migrated tree builds real engine objects.
    from nerf_tpu.config import render_settings_from_config

    settings = render_settings_from_config(cfg, "train", hwf=(8, 8, 4.0))
    assert settings.use_ndc is True
    assert settings.near == 0.0 and settings.far == 1.0
    expected_coarse = 8 if name == "tiny.yaml" else 64
    assert settings.num_coarse == expected_coarse


def test_python_source_config(tmp_path):
    """load_cfg / merge_from_file accept a Python source file exporting
    ``cfg`` (reference cfgnode.py:348-384)."""
    path = tmp_path / "override.py"
    path.write_text(
        "base = 2\n"
        "cfg = {'experiment': {'train_iters': base * 50}}\n"
    )
    cfg = load_config(str(path))
    assert cfg.experiment.train_iters == 100
    bad = tmp_path / "bad.py"
    bad.write_text("x = 1\n")
    with pytest.raises(AttributeError):
        load_config(str(bad))


def test_encoding_fn_keys_validated(tmp_path):
    """nerf.encode_position_fn / encode_direction_fn are honored: the only
    registered encoder is positional_encoding; anything else fails loudly
    (the reference silently ignores the key, train_nerf.py:102-114)."""
    ok = tmp_path / "ok.yml"
    ok.write_text("nerf:\n  encode_position_fn: positional_encoding\n")
    load_config(str(ok))
    bad = tmp_path / "bad.yml"
    bad.write_text("nerf:\n  encode_direction_fn: fourier_features\n")
    with pytest.raises(ValueError, match="fourier_features"):
        load_config(str(bad))


def test_grad_clip_norm_reaches_optimizer():
    cfg = get_default_config()
    cfg.optimizer.grad_clip_norm = 1.0
    opt = optimizer_from_config(cfg)
    import jax
    import jax.numpy as jnp

    params = {"w": jnp.zeros((3,))}
    state = opt.init(params)
    big_grad = {"w": jnp.full((3,), 100.0)}
    updates, _ = opt.update(big_grad, state, params)
    # Clipped to global norm 1 before Adam: finite, tiny update
    assert float(jnp.linalg.norm(jax.tree.leaves(updates)[0])) < 10.0


def test_no_dead_config_keys():
    """Every leaf key in the default config must be load-bearing (consumed by
    a builder or CLI). This is the exhaustive wired-key inventory; adding a
    key to get_default_config() requires wiring it AND listing it here with
    its consumer (VERDICT r1 item 7)."""
    consumed = {
        # train_nerf.py / eval_nerf.py CLIs
        "experiment.id", "experiment.logdir", "experiment.randomseed",
        "experiment.train_iters", "experiment.validate_every",
        "experiment.save_every", "experiment.print_every",
        "experiment.nan_guard",                       # -> make_train_loop
        "dataset.type", "dataset.basedir", "dataset.cachedir",
        "dataset.half_res", "dataset.testskip",       # -> load_blender_data
        "dataset.no_ndc", "dataset.near", "dataset.far",   # -> RenderSettings
        "dataset.downsample_factor", "dataset.llffhold",
        "dataset.spherify", "dataset.path_zflat",     # -> load_llff_data
        # models.* -> model_from_config / RenderSettings
        "models.coarse.type", "models.coarse.num_layers",
        "models.coarse.hidden_size", "models.coarse.skip_connect_every",
        "models.coarse.num_encoding_fn_xyz", "models.coarse.num_encoding_fn_dir",
        "models.coarse.include_input_xyz", "models.coarse.include_input_dir",
        "models.coarse.log_sampling_xyz", "models.coarse.log_sampling_dir",
        "models.coarse.use_viewdirs",
        "models.fine.type", "models.fine.num_layers",
        "models.fine.hidden_size", "models.fine.skip_connect_every",
        "models.fine.num_encoding_fn_xyz", "models.fine.num_encoding_fn_dir",
        "models.fine.include_input_xyz", "models.fine.include_input_dir",
        "models.fine.log_sampling_xyz", "models.fine.log_sampling_dir",
        "models.fine.use_viewdirs",
        # optimizer/scheduler -> optimizer_from_config
        "optimizer.type", "optimizer.lr", "optimizer.grad_clip_norm",
        "scheduler.lr_decay", "scheduler.lr_decay_factor",
        # nerf.* -> render_settings_from_config / _validate_encoding_fns
        "nerf.use_viewdirs",
        "nerf.encode_position_fn", "nerf.encode_direction_fn",
    }
    for mode in ("train", "validation"):
        consumed |= {
            f"nerf.{mode}.chunksize", f"nerf.{mode}.perturb",
            f"nerf.{mode}.num_coarse", f"nerf.{mode}.num_fine",
            f"nerf.{mode}.white_background",
            f"nerf.{mode}.radiance_field_noise_std", f"nerf.{mode}.lindisp",
            f"nerf.{mode}.use_pallas", f"nerf.{mode}.remat",
            f"nerf.{mode}.compute_dtype",
        }
    consumed.add("nerf.train.num_random_rays")
    consumed.add("nerf.train.ray_sampling")  # -> train_nerf.py sample_mode
    # -> render_settings_from_config -> renderer._eval_radiance_field
    consumed.add("nerf.train.use_pallas_train")

    def leaves(node, prefix=""):
        out = set()
        for k, v in node.items():
            full = f"{prefix}{k}"
            if isinstance(v, CfgNode):
                out |= leaves(v, full + ".")
            else:
                out.add(full)
        return out

    actual = leaves(get_default_config())
    assert actual == consumed, (
        f"unwired keys: {sorted(actual - consumed)}; "
        f"stale inventory entries: {sorted(consumed - actual)}"
    )
