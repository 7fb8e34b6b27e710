import os

from stylesinger_tpu.config import (
    Config, apply_overrides, load_config, save_config, tiny_test_config)


def test_defaults_complete():
    cfg = load_config()
    assert cfg.hidden_size == 256
    assert cfg.audio_sample_rate == 48000
    assert cfg.f0_gen == "gmdiff"
    assert cfg.decoder == "diffsinger"
    assert len(cfg.spec_min) == 80 and len(cfg.spec_max) == 80


def test_yaml_cascade(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("hidden_size: 128\nlr: 1.0\n")
    child = tmp_path / "child.yaml"
    child.write_text(f"base_config: [{base}]\nlr: 3.0\n")
    cfg = load_config(str(child))
    assert cfg.hidden_size == 128  # from base
    assert cfg.lr == 3.0           # child overrides


def test_cascade_cycle_detected(tmp_path):
    a = tmp_path / "a.yaml"
    b = tmp_path / "b.yaml"
    a.write_text(f"base_config: [{b}]\n")
    b.write_text(f"base_config: [{a}]\n")
    import pytest
    with pytest.raises(ValueError):
        load_config(str(a))


def test_overrides_coercion():
    cfg = Config(a=1, nested={"x": 1})
    apply_overrides(cfg, "a=2,b=true,c=1.5,nested.x=7,d=[1,2]")
    assert cfg.a == 2 and cfg["b"] is True and cfg["c"] == 1.5
    assert cfg.nested["x"] == 7 and cfg["d"] == [1, 2]


def test_save_roundtrip(tmp_path):
    cfg = tiny_test_config()
    path = save_config(cfg, str(tmp_path))
    assert os.path.exists(path)
    cfg2 = load_config(path)
    assert cfg2.hidden_size == cfg.hidden_size


def test_attribute_access():
    cfg = tiny_test_config()
    assert cfg.hidden_size == cfg["hidden_size"]
    cfg2 = cfg.replace(hidden_size=8)
    assert cfg2.hidden_size == 8 and cfg.hidden_size == 32


def test_egs_recipe_cascade():
    """The shipped egs/ recipe loads through the YAML cascade."""
    import os
    from stylesinger_tpu.config import load_config
    root = os.path.join(os.path.dirname(__file__), "..")
    cfg = load_config(os.path.join(root, "egs", "stylesinger.yaml"))
    assert cfg["hidden_size"] == 256          # from tts/base.yaml
    assert cfg["lambda_ph_dur"] == 0.1        # from tts/fs2.yaml
    assert cfg["max_updates"] == 320000       # from config_base.yaml
    assert cfg["f0_gen"] == "gmdiff"          # from stylesinger.yaml
    assert cfg["nRQ"] == 128


def test_explicit_spec_override_beats_data_stats(tmp_path):
    """ADVICE r1: --hparams spec_min/spec_max must win over the binarizer's
    spec_stats.json even when use_data_spec_stats is on."""
    import json
    import os

    from stylesinger_tpu.config import load_config

    bin_dir = str(tmp_path)
    with open(os.path.join(bin_dir, "spec_stats.json"), "w") as f:
        json.dump({"spec_min": [-1.0], "spec_max": [1.0]}, f)
    cfg = load_config(overrides=f"spec_min=[-9.0],spec_max=[9.0]",
                      binary_data_dir=bin_dir, use_data_spec_stats=True)
    assert cfg["spec_min"] == [-9.0] and cfg["spec_max"] == [9.0]
    cfg2 = load_config(binary_data_dir=bin_dir, use_data_spec_stats=True)
    assert cfg2["spec_min"] == [-1.0] and cfg2["spec_max"] == [1.0]
