import json

import numpy as np
import pytest


def test_nnunet_plans_build_and_forward(tmp_path):
    import jax
    import jax.numpy as jnp

    from pytorch_connectomics_tpu.config.schema import ModelConfig, build_dataclass
    from pytorch_connectomics_tpu.models import build_model, init_model

    plans = {
        "configurations": {
            "3d_fullres": {
                "patch_size": [16, 32, 32],
                "spacing": [4.0, 1.0, 1.0],
                "architecture": {
                    "arch_kwargs": {
                        "features_per_stage": [8, 16, 32],
                        "strides": [[1, 1, 1], [2, 2, 2], [2, 2, 2]],
                        "kernel_sizes": [[3, 3, 3]] * 3,
                        "n_conv_per_stage": [2, 2, 2],
                    }
                },
            }
        }
    }
    p = tmp_path / "plans.json"
    p.write_text(json.dumps(plans))
    cfg = build_dataclass(
        ModelConfig,
        {"arch": {"type": "nnunet"}, "in_channels": 1, "out_channels": 2,
         "input_size": [16, 32, 32], "nnunet": {"plans_path": str(p)}},
    )
    model = build_model(cfg)
    params = init_model(model, cfg, jax.random.PRNGKey(0))
    out = jax.jit(model.apply)(params, jnp.zeros((1, 16, 32, 32, 1)))
    assert out.shape == (1, 16, 32, 32, 2)


def test_nnunet_resenc_and_2d_plans(tmp_path):
    """ResEnc presets route to ResidualEncoderUNet; 2-D plans expand to
    singleton-z ops; unknown network classes fail loudly; norm/nonlin from
    arch_kwargs are honored (nnunetv2 plans surface)."""
    import jax
    import jax.numpy as jnp

    from pytorch_connectomics_tpu.config.schema import ModelConfig, build_dataclass
    from pytorch_connectomics_tpu.models import build_model, init_model
    from pytorch_connectomics_tpu.models.nnunet import (
        ResidualEncoderUNet, parse_nnunet_plans,
    )

    def mk(arch_extra, config="3d_fullres", strides=None, kernels=None):
        plans = {"configurations": {config: {
            "patch_size": [16, 32, 32],
            "architecture": {
                "network_class_name": arch_extra,
                "arch_kwargs": {
                    "features_per_stage": [8, 16],
                    "strides": strides or [[1, 1, 1], [2, 2, 2]],
                    "kernel_sizes": kernels or [[3, 3, 3]] * 2,
                    "n_blocks_per_stage": [1, 2],
                    "n_conv_per_stage": [2, 2],
                    "n_conv_per_stage_decoder": [2],
                    "norm_op": "torch.nn.modules.instancenorm.InstanceNorm3d",
                    "nonlin": "torch.nn.LeakyReLU",
                },
            },
        }}}
        p = tmp_path / f"plans_{arch_extra.rsplit('.',1)[-1]}_{config}.json"
        p.write_text(json.dumps(plans))
        return p

    # ResEnc routes to the residual topology and runs
    p = mk("dynamic_network_architectures.architectures.unet.ResidualEncoderUNet")
    cfg = build_dataclass(ModelConfig, {
        "arch": {"type": "nnunet"}, "in_channels": 1, "out_channels": 2,
        "input_size": [16, 32, 32],
        "nnunet": {"plans_path": str(p)},
    })
    model = build_model(cfg)
    assert isinstance(model, ResidualEncoderUNet)
    params = init_model(model, cfg, jax.random.PRNGKey(0))
    out = jax.jit(model.apply)(params, jnp.zeros((1, 16, 32, 32, 1)))
    assert out.shape == (1, 16, 32, 32, 2)

    # unknown class -> loud error (never a silently-wrong topology)
    p_bad = mk("some.pkg.FancyNet")
    cfg_bad = build_dataclass(ModelConfig, {
        "arch": {"type": "nnunet"}, "in_channels": 1, "out_channels": 2,
        "input_size": [16, 32, 32], "nnunet": {"plans_path": str(p_bad)}})
    import pytest
    with pytest.raises(ValueError, match="network_class_name"):
        build_model(cfg_bad)

    # 2-D plans: (k,k)/(s,s) expand to (1,k,k)/(1,s,s)
    p2d = mk("dynamic_network_architectures.architectures.unet.PlainConvUNet",
             config="2d", strides=[[1, 1], [2, 2]], kernels=[[3, 3]] * 2)
    parsed = parse_nnunet_plans(p2d, "2d")
    assert parsed["strides"] == ((1, 1, 1), (1, 2, 2))
    assert parsed["kernel_sizes"] == ((1, 3, 3), (1, 3, 3))
    assert parsed["norm"] == "instance" and parsed["act"] == "leaky_relu"


def test_prediction_crops():
    from pytorch_connectomics_tpu.inference.prediction_crops import (
        affinity_border_mask,
        apply_prediction_crops,
        crop_prediction,
    )

    pred = np.random.rand(8, 16, 16, 2).astype(np.float32)
    out = crop_prediction(pred, (1, 2, 2))
    assert out.shape == (6, 12, 12, 2)
    mask = affinity_border_mask((8, 16, 16), ["0-0-5", "2-0-0"])
    assert mask[0, 0, 0] == 0 and mask[1, 8, 8] == 0
    assert mask[2, 8, 8] == 1 and mask[4, 8, 10] == 1
    res = apply_prediction_crops(pred, affinity_offsets=["0-0-5"])
    assert res[0, 0, 0, 0] == 0.0  # border zeroed... x border
    assert res.shape == pred.shape


def test_preflight_checks():
    from pytorch_connectomics_tpu.config import load_config
    from pytorch_connectomics_tpu.runtime.preflight import preflight_check

    raw = {
        "model": {
            "arch": {"type": "monai_unet"},
            "input_size": [8, 16, 16],
            "loss": {"losses": [{"function": "DiceLoss"}], "deep_supervision": True},
        },
        "data": {"train": {"image": "random://pf/im", "label": "random://pf/lb"},
                  "dataloader": {"patch_size": [8, 16, 16]}},
    }
    cfg = load_config(raw_dict=raw, mode="train")
    with pytest.raises(ValueError):
        preflight_check(cfg, "train")
    cfg.model.loss.deep_supervision = False
    assert isinstance(preflight_check(cfg, "train"), list)


def test_preflight_patchify_divisibility():
    from pytorch_connectomics_tpu.config import load_config
    from pytorch_connectomics_tpu.runtime.preflight import preflight_check

    def _cfg(input_size, stride=None):
        return load_config(raw_dict={
            "model": {
                "arch": {"type": "mednext"},
                "input_size": input_size,
                "mednext": {"size": "S", "patchify_stem": True,
                            "patchify_stride": stride},
                "loss": {"losses": [{"function": "DiceLoss"}]},
            },
            "data": {"train": {"image": "random://pf/im", "label": "random://pf/lb"},
                     "dataloader": {"patch_size": input_size}},
        }, mode="train")

    # 64^3 divides 2*16 on every axis — ok
    preflight_check(_cfg([64, 64, 64]), "train")
    # 48 does not divide 32 — raises
    with pytest.raises(ValueError, match="divisible"):
        preflight_check(_cfg([48, 64, 64]), "train")
    # aniso stride (1,2,2): z only needs /16 — 48 is fine on z
    preflight_check(_cfg([48, 64, 64], stride=[1, 2, 2]), "train")
    with pytest.raises(ValueError, match="divisible"):
        preflight_check(_cfg([48, 64, 48], stride=[1, 2, 2]), "train")


def test_preflight_mutex_short_range_warns():
    from pytorch_connectomics_tpu.config import load_config
    from pytorch_connectomics_tpu.runtime.preflight import preflight_check

    def _cfg(offsets, step_offsets=None):
        kw = {"offsets": step_offsets} if step_offsets else {}
        return load_config(raw_dict={
            "model": {"arch": {"type": "mednext"}, "input_size": [64, 64, 64],
                      "out_channels": len(offsets),
                      "loss": {"losses": [{"function": "DiceLoss"}]}},
            "data": {
                "train": {"image": "random://pf/im", "label": "random://pf/lb"},
                "dataloader": {"patch_size": [64, 64, 64]},
                "label_transform": {
                    "targets": [{"name": "affinity",
                                 "kwargs": {"offsets": offsets}}]},
            },
            "decoding": {"enabled": True,
                         "steps": [{"name": "mutex_watershed", "kwargs": kw}]},
        }, mode="train")

    short = [[0, 0, 1], [0, 1, 0], [1, 0, 0]]
    warns = preflight_check(_cfg(short), "train")
    assert any("mutex_watershed" in w for w in warns)
    # long-range offsets present -> no mutex warning
    long_r = short + [[0, 0, -9], [0, -9, 0], [-4, 0, 0]]
    warns = preflight_check(_cfg(long_r), "train")
    assert not any("mutex_watershed" in w for w in warns)
    # step-level offsets override the target's
    warns = preflight_check(_cfg(short, step_offsets=long_r), "train")
    assert not any("mutex_watershed" in w for w in warns)


def test_nnunet_anisotropic_plans(tmp_path):
    """Real nnU-Net plans use anisotropic strides, non-cubic kernels, and
    per-stage conv counts — the loader must honor all three (reference
    nnunet_models.py arch_kwargs passthrough)."""
    import jax
    import jax.numpy as jnp

    from pytorch_connectomics_tpu.config.schema import ModelConfig, build_dataclass
    from pytorch_connectomics_tpu.models import build_model, init_model

    plans = {
        "configurations": {
            "3d_fullres": {
                "patch_size": [8, 32, 32],
                "spacing": [8.0, 1.0, 1.0],
                "architecture": {
                    "arch_kwargs": {
                        "features_per_stage": [8, 16, 32],
                        "strides": [[1, 1, 1], [1, 2, 2], [2, 2, 2]],
                        "kernel_sizes": [[1, 3, 3], [3, 3, 3], [3, 3, 3]],
                        "n_conv_per_stage": [1, 2, 3],
                    }
                },
            }
        }
    }
    p = tmp_path / "plans.json"
    p.write_text(json.dumps(plans))
    cfg = build_dataclass(
        ModelConfig,
        {"arch": {"type": "nnunet"}, "in_channels": 1, "out_channels": 2,
         "input_size": [8, 32, 32], "nnunet": {"plans_path": str(p)}},
    )
    model = build_model(cfg)
    assert tuple(model.n_conv_per_stage) == (1, 2, 3)
    params = init_model(model, cfg, jax.random.PRNGKey(0))
    out = jax.jit(model.apply)(params, jnp.zeros((1, 8, 32, 32, 1)))
    assert out.shape == (1, 8, 32, 32, 2)
    # stage 0 has exactly ONE encoder conv (per-stage count honored):
    # its params contain ConvNormAct_0 but the second-stage extra conv ids
    names = str(jax.tree_util.tree_structure(params))
    assert "ConvNormAct_0" in names


def test_nnunet_decoder_conv_counts(tmp_path):
    """nnU-Net v2 plans always carry BOTH n_conv_per_stage (encoder) and
    n_conv_per_stage_decoder; the decoder must honor its own (deepest-first)
    list, not reuse the encoder counts (dynamic_network_architectures
    UNetDecoder contract)."""
    import jax
    import jax.numpy as jnp

    from pytorch_connectomics_tpu.config.schema import ModelConfig, build_dataclass
    from pytorch_connectomics_tpu.models import build_model, init_model

    plans = {
        "configurations": {
            "3d_fullres": {
                "patch_size": [8, 16, 16],
                "spacing": [1.0, 1.0, 1.0],
                "architecture": {
                    "arch_kwargs": {
                        "features_per_stage": [8, 16, 32],
                        "strides": [[1, 1, 1], [2, 2, 2], [2, 2, 2]],
                        "kernel_sizes": [[3, 3, 3]] * 3,
                        "n_conv_per_stage": [2, 2, 2],
                        "n_conv_per_stage_decoder": [1, 1],
                    }
                },
            }
        }
    }
    p = tmp_path / "plans.json"
    p.write_text(json.dumps(plans))
    cfg = build_dataclass(
        ModelConfig,
        {"arch": {"type": "nnunet"}, "in_channels": 1, "out_channels": 2,
         "input_size": [8, 16, 16], "nnunet": {"plans_path": str(p)}},
    )
    model = build_model(cfg)
    assert tuple(model.n_conv_per_stage_decoder) == (1, 1)
    params = init_model(model, cfg, jax.random.PRNGKey(0))
    top = params["params"] if "params" in params else params
    n_cna = sum(1 for k in top if str(k).startswith("ConvNormAct_"))
    # 6 encoder convs (2+2+2) + 2 decoder convs (1+1); encoder-count reuse
    # would build 10
    assert n_cna == 8
    out = jax.jit(model.apply)(params, jnp.zeros((1, 8, 16, 16, 1)))
    assert out.shape == (1, 8, 16, 16, 2)
