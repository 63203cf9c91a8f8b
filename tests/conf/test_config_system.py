"""Tests for the config store / compose / instantiate system."""

import os

import pytest

from mmlearn_tpu.conf import (
    MISSING,
    ConfigError,
    builds,
    compose,
    instantiate,
    merge,
    resolve_interpolations,
    store,
)


class _Widget:
    def __init__(self, size: int, name: str = "w", scale: float = 1.0):
        self.size = size
        self.name = name
        self.scale = scale


def test_builds_populates_signature():
    node = builds(_Widget)
    assert node["_target_"].endswith("_Widget")
    assert node["size"] == MISSING
    assert node["name"] == "w"
    assert node["scale"] == 1.0


def test_builds_partial():
    node = builds(_Widget, zen_partial=True, size=3)
    fn = instantiate(node)
    obj = fn(name="x")
    assert obj.size == 3 and obj.name == "x"


def test_instantiate_nested():
    node = {
        "outer": {
            "_target_": f"{__name__}._Widget",
            "size": 2,
            "name": "inner",
        }
    }
    out = instantiate(node)
    assert isinstance(out["outer"], _Widget)
    assert out["outer"].size == 2


def test_instantiate_missing_raises():
    node = builds(_Widget)
    with pytest.raises(ConfigError, match="size"):
        instantiate(node)


def test_merge_semantics():
    base = {"a": {"b": 1, "c": 2}, "l": [1, 2]}
    out = merge(base, {"a": {"b": 9}, "l": [3]})
    assert out == {"a": {"b": 9, "c": 2}, "l": [3]}


def test_interpolation():
    cfg = {
        "experiment_name": "exp1",
        "tags": ["${experiment_name}"],
        "dir": "out/${experiment_name}/x",
        "env_val": "${env:MMLEARN_TEST_VAR,fallback}",
    }
    out = resolve_interpolations(cfg)
    assert out["tags"] == ["exp1"]
    assert out["dir"] == "out/exp1/x"
    assert out["env_val"] == "fallback"
    os.environ["MMLEARN_TEST_VAR"] = "set"
    out = resolve_interpolations(cfg)
    assert out["env_val"] == "set"
    del os.environ["MMLEARN_TEST_VAR"]


def test_store_register_and_group_override():
    store(group="test_group", name="widget", size=4)(_Widget)
    assert store.has("test_group", "widget")
    cfg = compose({"widget": None}, overrides=["test_group@widget=widget"])
    assert cfg["widget"]["size"] == 4
    obj = instantiate(cfg["widget"])
    assert isinstance(obj, _Widget)


def test_compose_overrides():
    base = {"a": {"b": 1}, "name": MISSING}
    cfg = compose(base, overrides=["a.b=5", "name=hello", "+extra.k=2.5"])
    assert cfg["a"]["b"] == 5
    assert cfg["name"] == "hello"
    assert cfg["extra"]["k"] == 2.5


def test_compose_override_unknown_key_requires_plus():
    """Hydra semantics: a plain override of a nonexistent key is an error
    (a typo would otherwise plant a silently-ignored config key); the '+'
    prefix adds new keys."""
    base = {"a": {"b": 1}}
    with pytest.raises(ConfigError, match=r"\+a\.typo"):
        compose(base, overrides=["a.typo=5"])
    # keys that exist with a None value count as existing
    cfg = compose({"a": {"b": None}}, overrides=["a.b=3"])
    assert cfg["a"]["b"] == 3


def test_compose_override_through_none_placeholder():
    """Writing THROUGH an existing None-valued node is a plain override, not
    a new key: set_by_path creates dicts through None placeholders, so e.g.
    'trainer.mesh_shape.data=4' must work when trainer.mesh_shape defaults
    to None (docs/parallelism.md; advisor r4 high)."""
    base = {"trainer": {"mesh_shape": None}}
    cfg = compose(base, overrides=["trainer.mesh_shape.data=4"])
    assert cfg["trainer"]["mesh_shape"] == {"data": 4}
    # deeper nesting through the same placeholder
    cfg = compose(base, overrides=["trainer.mesh_shape.a.b=1"])
    assert cfg["trainer"]["mesh_shape"]["a"]["b"] == 1
    # but a typo'd sibling of the placeholder still errors
    with pytest.raises(ConfigError, match=r"\+trainer\.mesh_shap\b"):
        compose(base, overrides=["trainer.mesh_shap=4"])


def test_compose_delete():
    cfg = compose({"a": {"b": 1, "c": 2}}, overrides=["~a.b"])
    assert "b" not in cfg["a"]


def test_compose_experiment_yaml(tmp_path):
    store(group="test_group2", name="widget2", size=7)(_Widget)
    exp_dir = tmp_path / "experiment"
    exp_dir.mkdir()
    (exp_dir / "myexp.yaml").write_text(
        "defaults:\n"
        "  - /test_group2@model: widget2\n"
        "experiment_name: myexp\n"
        "model:\n"
        "  name: override\n"
    )
    base = {"experiment_name": MISSING, "model": None}
    cfg = compose(
        base,
        overrides=["+experiment=myexp"],
        searchpath=[str(tmp_path)],
    )
    assert cfg["experiment_name"] == "myexp"
    assert cfg["model"]["size"] == 7
    assert cfg["model"]["name"] == "override"


def test_base_config_builds():
    from mmlearn_tpu.conf import base_config

    cfg = base_config()
    assert cfg["task"] == MISSING
    assert "trainer" in cfg
    cfg2 = compose(cfg, overrides=["experiment_name=t"])
    assert cfg2["tags"] == ["t"]
    assert cfg2["runtime"]["output_dir"] == "outputs/t"


def test_cli_override_wins_regardless_of_position():
    """Hydra parity: overrides typed BEFORE +experiment= still beat the
    experiment file body (experiments are hoisted, not order-dependent)."""
    from mmlearn_tpu.cli.run import build_experiment

    before = build_experiment(
        ["trainer.max_steps=999", "+experiment=tiny_clip_synthetic"]
    )
    after = build_experiment(
        ["+experiment=tiny_clip_synthetic", "trainer.max_steps=999"]
    )
    assert before["trainer"]["max_steps"] == 999
    assert after["trainer"]["max_steps"] == 999


def test_container_interpolation_resolves_and_copies():
    from mmlearn_tpu.conf.config import resolve_interpolations

    out = resolve_interpolations({"b": {"x": "${c}"}, "c": 5, "a": "${b}"})
    assert out["a"] == {"x": 5}
    out["a"]["x"] = 99
    assert out["b"]["x"] == 5  # no aliasing between a and b


def test_nested_missing_value_rejected():
    import pytest

    from mmlearn_tpu.conf import ConfigError, instantiate

    with pytest.raises(ConfigError, match="Missing required value"):
        instantiate({"_target_": "builtins.dict", "cfg": {"lr": "???"}})
    # nested _target_ nodes validate their own kwargs (no false positive)
    out = instantiate(
        {"_target_": "builtins.dict",
         "sub": {"_target_": "builtins.dict", "a": 1}}
    )
    assert out == {"sub": {"a": 1}}


def test_run_experiment_rejects_unset_required_values():
    import pytest

    from mmlearn_tpu.cli.run import run_experiment
    from mmlearn_tpu.conf import ConfigError

    cfg = {"task": {"_target_": "builtins.dict"}, "experiment_name": "???",
           "trainer": {}, "datasets": {}, "dataloader": {}, "runtime": {}}
    with pytest.raises(ConfigError, match="experiment_name"):
        run_experiment(cfg)


def test_sweep_split_honors_quotes_and_brackets():
    from mmlearn_tpu.cli.run import _split_sweep_values

    assert _split_sweep_values("'a,b'") == ["'a,b'"]
    assert _split_sweep_values("1,2,3") == ["1", "2", "3"]
    assert _split_sweep_values("[1,2],[3,4]") == ["[1,2]", "[3,4]"]


def test_locate_reports_real_import_failures(tmp_path, monkeypatch):
    import sys

    from mmlearn_tpu.conf import ConfigError
    from mmlearn_tpu.conf.instantiate import locate

    pkg = tmp_path / "broken_mod_xyz.py"
    pkg.write_text("import definitely_not_installed_pkg_qq\n")
    monkeypatch.syspath_prepend(str(tmp_path))
    sys.modules.pop("broken_mod_xyz", None)
    try:
        locate("broken_mod_xyz.Thing")
        raise AssertionError("expected ConfigError")
    except ConfigError as err:
        assert "failed to import" in str(err)
