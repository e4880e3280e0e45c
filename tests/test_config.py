"""Config-system tests: deep merge + the precision_preset bundle.

The preset is sugar over the scoped matmul-precision knobs
(config.yaml "TPU-native additions"); the contract under test is that a
user-set knob always beats the preset and unknown presets fail loudly.
"""
import argparse

import pytest
import yaml

from spadot_tpu.config import apply_precision_preset, default_config, load_model_config


def _args(tmp_path, user: dict):
    path = tmp_path / "cfg.yaml"
    path.write_text(yaml.safe_dump(user))
    return argparse.Namespace(config=str(path))


def test_default_has_no_preset():
    cfg = default_config()
    assert cfg["precision_preset"] is None
    # shipped speed defaults (quality-gated; see config.yaml comments)
    assert cfg["gat_matmul_precision"] == "default"
    assert cfg["svgp_matmul_precision"] == "high"
    assert cfg["mlp_matmul_precision"] == "default"


def test_parity_preset_pins_all_three(tmp_path):
    cfg = load_model_config(_args(tmp_path, {"precision_preset": "parity"}))
    assert cfg["gat_matmul_precision"] == "highest"
    assert cfg["svgp_matmul_precision"] == "highest"
    assert cfg["mlp_matmul_precision"] == "highest"


def test_fast_preset_is_the_shipped_default(tmp_path):
    fast = load_model_config(_args(tmp_path, {"precision_preset": "fast"}))
    plain = load_model_config(_args(tmp_path, {}))
    for key in ("gat_matmul_precision", "svgp_matmul_precision",
                "mlp_matmul_precision"):
        assert fast[key] == plain[key]


def test_user_knob_beats_preset(tmp_path):
    cfg = load_model_config(_args(tmp_path, {
        "precision_preset": "parity",
        "svgp_matmul_precision": "high",
    }))
    assert cfg["svgp_matmul_precision"] == "high"  # explicit user choice kept
    assert cfg["gat_matmul_precision"] == "highest"
    assert cfg["mlp_matmul_precision"] == "highest"


def test_large_scale_preset(tmp_path):
    """large_scale = fast knobs + the measured >=50k requirements
    (docs/scaling.md): lr auto-scaling and batch 4096. An explicit user
    batch_size still wins."""
    cfg = load_model_config(_args(tmp_path, {"precision_preset": "large_scale"}))
    fast = load_model_config(_args(tmp_path, {"precision_preset": "fast"}))
    for key in ("gat_matmul_precision", "svgp_matmul_precision",
                "mlp_matmul_precision", "kmeans_refresh_warm"):
        assert cfg[key] == fast[key]
    assert cfg["lr"] == "auto"
    assert cfg["batch_size"] == 4096
    over = load_model_config(_args(tmp_path, {
        "precision_preset": "large_scale", "batch_size": 2048,
    }))
    assert over["batch_size"] == 2048


def test_unknown_preset_raises(tmp_path):
    with pytest.raises(ValueError, match="precision_preset"):
        load_model_config(_args(tmp_path, {"precision_preset": "turbo"}))


def test_apply_preset_direct_dict():
    cfg = default_config()
    cfg["precision_preset"] = "parity"
    out = apply_precision_preset(cfg)
    assert out["gat_matmul_precision"] == "highest"


def test_deep_merge_nested_ot_config(tmp_path):
    cfg = load_model_config(_args(tmp_path, {"ot_config": {"epsilon": 0.2}}))
    assert cfg["ot_config"]["epsilon"] == 0.2
    # untouched sibling keys survive the merge
    assert cfg["ot_config"]["growth_iters"] == 3


def test_resolve_lr_auto_scaling():
    """lr: 'auto' = min(3e-4, 3e-4*10k/total_spots) — docs/scaling.md rule,
    quality-backed at 2x102,400 spots (docs/tpu_logs/atlasq_lrscaled.log)."""
    from spadot_tpu.train.loop import resolve_lr

    assert resolve_lr("auto", 1_000) == pytest.approx(3e-4)   # capped
    assert resolve_lr("auto", 10_000) == pytest.approx(3e-4)
    assert resolve_lr("AUTO", 204_800) == pytest.approx(3e-4 * 10_000 / 204_800)
    assert resolve_lr(1e-3, 204_800) == 1e-3                  # numeric passthrough
    # YAML 1.1 parses dot-less sci notation as a string - must still work
    assert resolve_lr("3e-4", 204_800) == pytest.approx(3e-4)


def test_resolve_lr_rejects_other_strings():
    from spadot_tpu.train.loop import resolve_lr

    with pytest.raises(ValueError, match="auto"):
        resolve_lr("fast", 100)


def test_every_config_key_documented():
    """Config-surface hygiene (round-4 verdict, Next #5): every top-level
    key in config.yaml (and every ot_config subkey) must appear in
    docs/configuration.md — the supported / experimental partition is only
    trustworthy if no flag can exist outside it."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "spadot_tpu", "config.yaml")) as f:
        cfg = yaml.safe_load(f)
    with open(os.path.join(repo, "docs", "configuration.md")) as f:
        doc = f.read()
    missing = [k for k in cfg if f"`{k}`" not in doc]
    missing += [
        f"ot_config.{k}" for k in (cfg.get("ot_config") or {})
        if f"`{k}`" not in doc
    ]
    assert not missing, f"config keys missing from docs/configuration.md: {missing}"
