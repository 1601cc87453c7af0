"""Config and registry guardrails (reference tests/unit/test_v3_guardrails.py
philosophy): wrong inputs fail loudly and early."""

import pytest

from pytorch_connectomics_tpu.config import ConfigError, load_config
from pytorch_connectomics_tpu.config.profiles import ProfileError


BASE = {
    "model": {
        "arch": {"type": "monai_unet"},
        "input_size": [8, 16, 16],
        "monai": {"filters": [4, 8]},
        "loss": {"losses": [{"function": "DiceLoss"}]},
    },
    "data": {
        "train": {"image": "random://g/im", "label": "random://g/label"},
        "dataloader": {"patch_size": [8, 16, 16]},
    },
}


def _cfg(**patch):
    import copy

    raw = copy.deepcopy(BASE)
    for k, v in patch.items():
        raw[k] = v
    return raw


def test_unknown_top_level_key_rejected():
    with pytest.raises(ConfigError):
        load_config(raw_dict=_cfg(bogus_section={"x": 1}), mode="train")


def test_unknown_nested_key_rejected():
    raw = _cfg()
    raw["model"]["not_a_field"] = True
    with pytest.raises(ConfigError):
        load_config(raw_dict=raw, mode="train")


def test_unknown_profile_name_rejected():
    raw = _cfg()
    raw["model"]["loss"] = {"profile": "loss_does_not_exist"}
    with pytest.raises(ProfileError):
        load_config(raw_dict=raw, mode="train")


def test_unknown_decoding_template_rejected():
    raw = _cfg()
    raw["decoding"] = {"enabled": True, "steps": [{"template": "nope"}]}
    with pytest.raises(ProfileError):
        load_config(raw_dict=raw, mode="train")


def test_bad_overlap_rejected():
    raw = _cfg()
    raw["inference"] = {"window": {"overlap": 1.5}}
    with pytest.raises(ConfigError):
        load_config(raw_dict=raw, mode="test")


def test_missing_train_data_rejected():
    raw = _cfg()
    raw["data"].pop("train")
    with pytest.raises(ConfigError):
        load_config(raw_dict=raw, mode="train")


def test_missing_loss_rejected_in_train():
    raw = _cfg()
    raw["model"]["loss"] = {"losses": []}
    with pytest.raises(ConfigError):
        load_config(raw_dict=raw, mode="train")


def test_unknown_loss_function_rejected():
    from pytorch_connectomics_tpu.losses import get_loss

    with pytest.raises(KeyError):
        get_loss("NotALoss")


def test_unknown_decoder_rejected():
    from pytorch_connectomics_tpu.decoding import get_decoder

    with pytest.raises(KeyError):
        get_decoder("not_a_decoder")


def test_unknown_architecture_rejected():
    from pytorch_connectomics_tpu.models import get_architecture

    with pytest.raises(KeyError):
        get_architecture("not_an_arch")


def test_unknown_target_rejected():
    from pytorch_connectomics_tpu.config.schema import LabelTransformConfig, build_dataclass
    from pytorch_connectomics_tpu.data.targets import build_target_fn

    cfg = build_dataclass(LabelTransformConfig, {"targets": [{"name": "not_a_target"}]})
    with pytest.raises(KeyError):
        build_target_fn(cfg)


def test_chunk_smaller_than_window_rejected():
    from pytorch_connectomics_tpu.runtime.preflight import preflight_check

    raw = _cfg()
    raw["inference"] = {
        "window": {"window_size": [8, 16, 16]},
        "chunked": {"enabled": True, "chunk_size": [4, 8, 8]},
    }
    cfg = load_config(raw_dict=raw, mode="test")
    with pytest.raises(ValueError):
        preflight_check(cfg, "test")
