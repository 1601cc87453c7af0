"""Config system tests — schema defaults, _base_ chains, profile expansion,
stage merge, overrides (contract modeled on reference tests/unit/test_hydra_config.py)."""

import textwrap

import pytest

from pytorch_connectomics_tpu.config import (
    Config,
    ConfigError,
    build_dataclass,
    config_hash,
    load_config,
    to_dict,
)


def write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(textwrap.dedent(text))
    return p


MINIMAL = """
experiment_name: mini
default:
  model:
    arch: {type: monai_unet}
    in_channels: 1
    out_channels: 1
    input_size: [16, 32, 32]
    loss:
      losses:
        - {function: DiceLoss, weight: 1.0, pred_slice: "0:1", target_slice: "0:1"}
  data:
    train: {image: "random://t/im", label: "random://t/lb"}
    dataloader: {batch_size: 2, patch_size: [16, 32, 32]}
train:
  optimization:
    max_epochs: 1
    n_steps_per_epoch: 2
    optimizer: {name: AdamW, lr: 1e-4}
"""


def test_defaults():
    cfg = build_dataclass(Config, {})
    assert cfg.model.in_channels == 1
    assert cfg.system.seed == 42
    assert cfg.model.output_size == cfg.model.input_size


def test_unknown_key_rejected():
    with pytest.raises(ConfigError):
        build_dataclass(Config, {"model": {"bogus_key": 1}})


def test_minimal_roundtrip(tmp_path):
    p = write(tmp_path, "mini.yaml", MINIMAL)
    cfg = load_config(p, mode="train")
    assert cfg.experiment_name == "mini"
    assert cfg.model.input_size == [16, 32, 32]
    assert cfg.optimization.max_epochs == 1
    assert cfg.data.dataloader.batch_size == 2
    assert cfg.model.loss.losses[0].function == "DiceLoss"


def test_stage_merge_train_vs_test(tmp_path):
    p = write(
        tmp_path,
        "s.yaml",
        MINIMAL
        + """
test:
  data:
    test: {image: "random://t/test_im"}
  optimization:
    max_epochs: 7
""",
    )
    cfg_train = load_config(p, mode="train")
    cfg_test = load_config(p, mode="test")
    assert cfg_train.optimization.max_epochs == 1
    assert cfg_test.optimization.max_epochs == 7
    assert cfg_test.data.test.image == "random://t/test_im"


def test_base_inheritance(tmp_path):
    write(tmp_path, "base.yaml", "experiment_name: base\nsave_path: outputs/base\n")
    p = write(
        tmp_path,
        "child.yaml",
        """
_base_: [base.yaml]
experiment_name: child
""" + MINIMAL.replace("experiment_name: mini\n", ""),
    )
    cfg = load_config(p, mode="train")
    assert cfg.experiment_name == "child"
    assert cfg.save_path == "outputs/base"


def test_profile_expansion_pipeline_binary(tmp_path):
    p = write(
        tmp_path,
        "prof.yaml",
        """
experiment_name: prof
default:
  pipeline_profile: binary
  model:
    arch: {type: rsunet}
    input_size: [16, 32, 32]
  data:
    train: {image: "random://p/im", label: "random://p/lb"}
    dataloader: {patch_size: [16, 32, 32]}
train:
  optimization: {max_epochs: 1}
""",
    )
    cfg = load_config(p, mode="train")
    assert cfg.model.out_channels == 1
    fns = [t.function for t in cfg.model.loss.losses]
    assert "WeightedBCEWithLogitsLoss" in fns and "DiceLoss" in fns


def test_pipeline_profile_aff9_decoding_template(tmp_path):
    p = write(
        tmp_path,
        "aff.yaml",
        """
experiment_name: aff
default:
  pipeline_profile: aff9
  model:
    arch: {type: rsunet}
    input_size: [16, 32, 32]
  data:
    train: {image: "random://a/im", label: "random://a/lb"}
    dataloader: {patch_size: [16, 32, 32]}
train:
  optimization: {max_epochs: 1}
""",
    )
    cfg = load_config(p, mode="train")
    assert cfg.model.out_channels == 9
    assert cfg.data.label_transform.targets[0].name == "affinity"
    assert cfg.decoding.steps[0].name == "waterz"
    assert cfg.inference.test_time_augmentation.ensemble_mode == "min"


def test_explicit_value_beats_profile(tmp_path):
    p = write(
        tmp_path,
        "over.yaml",
        """
experiment_name: over
default:
  pipeline_profile: binary
  model:
    arch: {type: rsunet}
    out_channels: 2
    input_size: [16, 32, 32]
  data:
    train: {image: "random://o/im", label: "random://o/lb"}
    dataloader: {patch_size: [16, 32, 32]}
train:
  optimization: {max_epochs: 1}
""",
    )
    cfg = load_config(p, mode="train")
    assert cfg.model.out_channels == 2


def test_cli_overrides(tmp_path):
    p = write(tmp_path, "mini.yaml", MINIMAL)
    cfg = load_config(p, mode="train", overrides=["optimization.max_epochs=9", "system.seed=7"])
    assert cfg.optimization.max_epochs == 9
    assert cfg.system.seed == 7


def test_optimizer_profile(tmp_path):
    p = write(
        tmp_path,
        "opt.yaml",
        MINIMAL.replace(
            "  optimization:",
            "  optimization:\n    profile: warmup_cosine_lr",
        ),
    )
    cfg = load_config(p, mode="train")
    assert cfg.optimization.scheduler.name == "WarmupCosineLR"
    # explicit lr wins over profile default
    assert cfg.optimization.optimizer.lr == pytest.approx(1e-4)


def test_config_hash_stable(tmp_path):
    p = write(tmp_path, "mini.yaml", MINIMAL)
    a = config_hash(load_config(p, mode="train"))
    b = config_hash(load_config(p, mode="train"))
    assert a == b and len(a) == 16
    c = config_hash(load_config(p, mode="train", overrides=["system.seed=9"]))
    assert c != a


def test_to_dict_roundtrip(tmp_path):
    p = write(tmp_path, "mini.yaml", MINIMAL)
    cfg = load_config(p, mode="train")
    d = to_dict(cfg)
    assert d["model"]["input_size"] == [16, 32, 32]


def test_validation_errors(tmp_path):
    p = write(tmp_path, "bad.yaml", MINIMAL.replace("[16, 32, 32]", "[16, 32]", 1))
    with pytest.raises(ConfigError):
        load_config(p, mode="train")


def test_num_gpus_alias(tmp_path):
    p = write(tmp_path, "mini.yaml", MINIMAL + "\nsystem: {num_gpus: 1}\n")
    cfg = load_config(p, mode="train")
    assert cfg.system.num_devices == 1


def test_reference_minimal_tutorial_loads():
    """Our loader consumes the reference's own minimal tutorial YAML."""
    import pathlib

    ref = pathlib.Path("/root/reference/tutorials/minimal.yaml")
    if not ref.exists():
        pytest.skip("reference not mounted")
    cfg = load_config(ref, mode="train")
    assert cfg.model.arch.type == "monai_unet"
    assert cfg.data.dataloader.patch_size == [32, 64, 64]


def test_malis_worker_budget_and_cpu_detection():
    """SLURM/cgroup-aware CPU detection + MALIS thread auto-default
    (reference hardware/auto_config.py:37,96)."""
    from pytorch_connectomics_tpu.config.loader import (
        available_cpus,
        resolve_malis_worker_budget,
    )
    from pytorch_connectomics_tpu.config.schema import Config, build_dataclass

    assert available_cpus() >= 1
    cfg = build_dataclass(
        Config,
        {"model": {"loss": {"losses": [
            {"function": "MalisLoss"},
            {"function": "MalisLoss", "kwargs": {"num_workers": 3}},
            {"function": "DiceLoss"},
        ]}},
         "data": {"dataloader": {"batch_size": 2}}},
    )
    total = resolve_malis_worker_budget(cfg)
    # auto entry gets min(2*2, 8) = 4; explicit keeps 3
    assert cfg.model.loss.losses[0].kwargs["num_workers"] == 4
    assert cfg.model.loss.losses[1].kwargs["num_workers"] == 3
    assert "num_workers" not in (cfg.model.loss.losses[2].kwargs or {})
    assert total == 7


def test_base_chain_later_wins(tmp_path):
    """Multi-base chains merge bases-first; later bases override earlier."""
    (tmp_path / "a.yaml").write_text(
        "model: {arch: {type: mednext}, in_channels: 1, out_channels: 3}\n"
    )
    (tmp_path / "b.yaml").write_text("model: {out_channels: 7}\n")
    (tmp_path / "top.yaml").write_text(
        "_base_: [a.yaml, b.yaml]\n"
        "model: {loss: {losses: [{function: DiceLoss}]}}\n"
        "data: {train: {image: 'random://x/im', label: 'random://x/lb'}}\n"
    )
    cfg = load_config(tmp_path / "top.yaml", mode="train")
    assert cfg.model.out_channels == 7  # b beats a
    assert cfg.model.in_channels == 1  # a survives where b silent


def test_nested_base_chain(tmp_path):
    """A base may itself have a _base_ (transitive resolution)."""
    (tmp_path / "root.yaml").write_text(
        "model: {arch: {type: mednext}, mednext: {size: S}}\n"
    )
    (tmp_path / "mid.yaml").write_text(
        "_base_: [root.yaml]\nmodel: {mednext: {kernel_size: 5}}\n"
    )
    (tmp_path / "leaf.yaml").write_text(
        "_base_: [mid.yaml]\n"
        "model: {loss: {losses: [{function: DiceLoss}]}}\n"
        "data: {train: {image: 'random://y/im', label: 'random://y/lb'}}\n"
    )
    cfg = load_config(tmp_path / "leaf.yaml", mode="train")
    assert cfg.model.mednext.size == "S"
    assert cfg.model.mednext.kernel_size == 5


def test_stage_overlay_beats_default(tmp_path):
    (tmp_path / "c.yaml").write_text(
        "model: {arch: {type: mednext}, loss: {losses: [{function: DiceLoss}]}}\n"
        "default: {optimization: {max_epochs: 10}}\n"
        "train: {optimization: {max_epochs: 3},\n"
        "        data: {train: {image: 'random://z/im', label: 'random://z/lb'}}}\n"
    )
    assert load_config(tmp_path / "c.yaml", mode="train").optimization.max_epochs == 3


def test_tune_inherits_test_data(tmp_path):
    (tmp_path / "d.yaml").write_text(
        "model: {arch: {type: mednext}, loss: {losses: [{function: DiceLoss}]}}\n"
        "test: {data: {test: {image: 'random://q/im'}}}\n"
    )
    cfg = load_config(tmp_path / "d.yaml", mode="tune")
    assert cfg.data.test.image == "random://q/im"


def test_cli_override_types(tmp_path):
    (tmp_path / "e.yaml").write_text(
        "model: {arch: {type: mednext}, loss: {losses: [{function: DiceLoss}]}}\n"
        "data: {train: {image: 'random://w/im', label: 'random://w/lb'}}\n"
    )
    cfg = load_config(
        tmp_path / "e.yaml",
        overrides=[
            "optimization.max_epochs=7",
            "optimization.optimizer.lr=0.005",
            "monitor.nan_detection=false",
            "model.input_size=[16,32,32]",
        ],
        mode="train",
    )
    assert cfg.optimization.max_epochs == 7
    assert cfg.optimization.optimizer.lr == 0.005
    assert cfg.monitor.nan_detection is False
    assert cfg.model.input_size == [16, 32, 32]


def test_config_hash_sensitive_to_values(tmp_path):
    base = (
        "model: {arch: {type: mednext}, loss: {losses: [{function: DiceLoss}]}}\n"
        "data: {train: {image: 'random://h/im', label: 'random://h/lb'}}\n"
    )
    (tmp_path / "f.yaml").write_text(base)
    h1 = config_hash(load_config(tmp_path / "f.yaml", mode="train"))
    h2 = config_hash(
        load_config(tmp_path / "f.yaml", overrides=["model.out_channels=5"], mode="train")
    )
    assert h1 != h2


def test_unknown_profile_rejected(tmp_path):
    import pytest

    from pytorch_connectomics_tpu.config.schema import ConfigError

    (tmp_path / "g.yaml").write_text(
        "model: {arch: {type: mednext}, loss: {profile: no_such_profile}}\n"
        "data: {train: {image: 'random://g/im', label: 'random://g/lb'}}\n"
    )
    with pytest.raises((ConfigError, KeyError, ValueError)):
        load_config(tmp_path / "g.yaml", mode="train")


class TestKwargValidation:
    """Signature-derived unknown-key rejection (reference config_io.py:94,
    schema/data.py:258-532 typed per-aug configs)."""

    def test_unknown_aug_transform_rejected(self):
        from pytorch_connectomics_tpu.config.kwarg_validation import (
            validate_augmentation_config,
        )
        from pytorch_connectomics_tpu.config.schema import AugmentationConfig

        bad = build_dataclass(
            AugmentationConfig, {"enabled": True, "fliip": {"prob": 0.5}}
        )
        with pytest.raises(ConfigError, match="unknown transform 'fliip'"):
            validate_augmentation_config(bad)

    def test_unknown_aug_option_rejected(self):
        from pytorch_connectomics_tpu.config.kwarg_validation import (
            validate_augmentation_config,
        )
        from pytorch_connectomics_tpu.config.schema import AugmentationConfig

        bad = build_dataclass(
            AugmentationConfig,
            {"enabled": True, "misalignment": {"prob": 0.3, "displacment": 8}},
        )
        with pytest.raises(ConfigError, match="displacment"):
            validate_augmentation_config(bad)

    def test_valid_aug_config_passes(self):
        from pytorch_connectomics_tpu.config.kwarg_validation import (
            validate_augmentation_config,
        )
        from pytorch_connectomics_tpu.config.schema import AugmentationConfig

        ok = build_dataclass(
            AugmentationConfig,
            {
                "enabled": True,
                "flip": {"prob": 0.7, "axes": [1, 2]},
                "misalignment": {"enabled": True, "displacement": 8},
                "axis_permute": {"prob": 0.2},  # extra-dict transform
            },
        )
        assert validate_augmentation_config(ok) == []

    def test_unknown_decode_step_kwarg_rejected(self):
        import pytorch_connectomics_tpu.decoding  # noqa: F401 — registers decoders
        from pytorch_connectomics_tpu.config.kwarg_validation import (
            validate_decoding_config,
        )
        from pytorch_connectomics_tpu.config.schema import DecodingConfig

        bad = build_dataclass(
            DecodingConfig,
            {"enabled": True, "steps": [{"name": "threshold", "kwargs": {"treshold": 0.5}}]},
        )
        with pytest.raises(ConfigError, match="treshold"):
            validate_decoding_config(bad)
        with pytest.raises(ConfigError, match="unknown decoder"):
            validate_decoding_config(
                build_dataclass(
                    DecodingConfig, {"enabled": True, "steps": [{"name": "nope"}]}
                )
            )

    def test_abiss_free_kwargs_pass_through(self):
        import pytorch_connectomics_tpu.decoding  # noqa: F401
        from pytorch_connectomics_tpu.config.kwarg_validation import (
            validate_decoding_config,
        )
        from pytorch_connectomics_tpu.config.schema import DecodingConfig

        ok = build_dataclass(
            DecodingConfig,
            {"enabled": True, "steps": [{"name": "abiss", "kwargs": {"ws_size": 100, "ws_low": 0.01}}]},
        )
        assert validate_decoding_config(ok) == []
