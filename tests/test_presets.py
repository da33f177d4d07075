"""Shipped per-dataset preset configs (configs/*.yaml).

The presets are the analogue of the reference's per-dataset parameter
pairs (cfg/mapping/mapping_<ds>.yaml + cfg/tracking/tracking_<ds>.yaml +
cfg/time_surface/ts_parameters.yaml). Each preset must load, and for the
four reference datasets must agree field-for-field with what
SystemConfig.from_yaml produces from the reference's own YAML files.
"""
import dataclasses
import os

import pytest

from esvo_tpu.runtime.config import SystemConfig

REF = "/root/reference/esvo_core/cfg"
PRESETS = ["rpg", "upenn", "hkust", "dsec", "simulation"]


@pytest.mark.parametrize("name", PRESETS)
def test_preset_loads(name):
    cfg = SystemConfig.from_preset(name)
    assert cfg.depth.patch_size_x == 15
    assert cfg.tracker.ls_norm in ("Huber", "l2")
    # post-init coherence: fusion/regularizer norms follow depth
    assert cfg.fusion.ls_norm == cfg.depth.ls_norm
    assert cfg.regularizer.radius == cfg.depth.regularization_radius


def test_unknown_preset_lists_available():
    with pytest.raises(FileNotFoundError, match="rpg"):
        SystemConfig.from_preset("nonexistent")


def test_unknown_key_rejected():
    with pytest.raises(KeyError, match="typo_key"):
        SystemConfig.from_dict({"mapping": {"typo_key": 1}})
    with pytest.raises(KeyError, match="badsection"):
        SystemConfig.from_dict({"badsection": {}})


@pytest.mark.parametrize("name", ["rpg", "upenn", "hkust", "dsec"])
@pytest.mark.skipif(not os.path.isdir(REF),
                    reason="reference checkout not present")
def test_preset_matches_reference_yaml(name):
    got = SystemConfig.from_preset(name)
    want = SystemConfig.from_yaml(
        f"{REF}/mapping/mapping_{name}.yaml",
        f"{REF}/tracking/tracking_{name}.yaml",
        f"{REF}/time_surface/ts_parameters.yaml")
    for section in ("surface", "bm", "depth", "fusion", "regularizer",
                    "tracker", "mapping", "tracking"):
        g, w = getattr(got, section), getattr(want, section)
        for f in dataclasses.fields(type(w)):
            assert getattr(g, f.name) == getattr(w, f.name), \
                f"{name}: {section}.{f.name}: preset {getattr(g, f.name)} " \
                f"!= reference {getattr(w, f.name)}"


def test_run_dataset_accepts_preset():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "run_dataset", os.path.join(os.path.dirname(__file__), "..",
                                    "scripts", "run_dataset.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    args = mod.parse_args(["--calib", "/tmp", "--preset", "rpg"])
    assert args.preset == "rpg"
