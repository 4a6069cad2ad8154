"""Config system: CLI arg rewriting + coercion (reference prep_args,
src/utils.py:149-162), YAML loading, presets, strict unknown-key rejection."""

import pytest

from stego_tpu.config import PRESETS, Config, prep_args


def test_prep_args_styles_and_coercion():
    out = prep_args([
        "res=224", "--batch_size", "16", "lr=5e-4", "crop_type=null",
        "use_salience=true", "dropout=False", "experiment_name=exp1",
    ])
    assert out["res"] == 224
    assert out["batch_size"] == 16
    assert out["lr"] == pytest.approx(5e-4)
    assert out["crop_type"] is None
    assert out["use_salience"] is True
    assert out["dropout"] is False
    assert out["experiment_name"] == "exp1"


def test_prep_args_list_syntax():
    """Hydra/YAML-style inline lists on the CLI (what a reference user
    types: model_paths='[a, b]')."""
    out = prep_args(['model_paths=["/tmp/a", /tmp/b]'])
    assert out["model_paths"] == ["/tmp/a", "/tmp/b"]
    assert prep_args(["model_paths=[]"])["model_paths"] == []
    assert prep_args(["model_paths=[x]"])["model_paths"] == ["x"]


def test_prep_args_rejects_bad_style():
    with pytest.raises(ValueError):
        prep_args(["res", "224"])
    with pytest.raises(ValueError):
        prep_args(["--res"])


def test_from_dict_strict_unknown_keys():
    with pytest.raises(ValueError, match="Unknown config keys"):
        Config.from_dict({"not_a_key": 1}, strict=True)
    # non-strict drops them (YAML bases may carry hydra blocks etc.)
    cfg = Config.from_dict({"not_a_key": 1, "res": 128})
    assert cfg.res == 128


def test_from_yaml_with_overrides(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text("res: 112\nbatch_size: 4\nhydra:\n  run: {}\n")
    cfg = Config.from_yaml(str(p), batch_size=8)
    assert cfg.res == 112
    assert cfg.batch_size == 8  # override wins


def test_presets_have_reference_sextuples():
    for name, d in PRESETS.items():
        for k in ("neg_inter_weight", "pos_inter_weight", "pos_intra_weight",
                  "neg_inter_shift", "pos_inter_shift", "pos_intra_shift"):
            assert k in d, (name, k)
        Config(**{k: v for k, v in d.items()})  # constructible
