"""Tests for the aux components: bbox, tiles, nnunet preprocess, swin-unetr,
experiment log, oracle metrics, auto-config planner, skeleton processor,
balancing, direct-2d inference."""

import numpy as np
import pytest


def test_bbox_utils():
    from pytorch_connectomics_tpu.data.bbox import crop_to_foreground, instance_bboxes

    lab = np.zeros((8, 16, 16), np.uint32)
    lab[2:5, 3:9, 4:10] = 1
    lab[6:8, 10:14, 10:14] = 2
    boxes = instance_bboxes(lab)
    assert boxes[1] == ((2, 5), (3, 9), (4, 10))
    cropped, sl = crop_to_foreground(lab, lab > 0)
    assert cropped.shape == (6, 11, 10)


def test_tile_volume(tmp_path):
    from PIL import Image

    from pytorch_connectomics_tpu.data.tiles import TileVolume, write_tile_spec

    rng = np.random.default_rng(0)
    full = (rng.random((2, 8, 12)) * 255).astype(np.uint8)
    sections = []
    for z in range(2):
        row = []
        for r in range(2):
            for c in range(3):
                tile = full[z, r * 4 : (r + 1) * 4, c * 4 : (c + 1) * 4]
                name = f"z{z}_r{r}c{c}.png"
                Image.fromarray(tile).save(tmp_path / name)
                row.append(name)
        sections.append(row)
    spec = write_tile_spec(tmp_path / "spec.json", (4, 4), (2, 3), sections)
    tv = TileVolume(spec, tmp_path)
    assert tv.shape == (2, 8, 12)
    np.testing.assert_array_equal(tv[0:2, 0:8, 0:12], full)
    np.testing.assert_array_equal(tv[1:2, 2:7, 3:11], full[1:2, 2:7, 3:11])


def test_nnunet_preprocess_roundtrip():
    from pytorch_connectomics_tpu.data.nnunet_preprocess import (
        nnunet_preprocess,
        nnunet_restore,
    )

    img = np.zeros((16, 32, 32), np.float32)
    img[4:12, 8:24, 8:24] = np.random.rand(8, 16, 16)
    lbl = (img > 0.5).astype(np.uint8)
    pim, plb, rec = nnunet_preprocess(img, lbl, source_spacing=(8, 4, 4), target_spacing=(8, 8, 8))
    assert rec.crop_slices is not None
    restored = nnunet_restore((plb > 0).astype(np.uint8), rec)
    assert restored.shape == img.shape


def test_swin_unetr_forward():
    import jax
    import jax.numpy as jnp

    from pytorch_connectomics_tpu.config.schema import ModelConfig, build_dataclass
    from pytorch_connectomics_tpu.models import build_model, init_model

    cfg = build_dataclass(
        ModelConfig,
        {"arch": {"type": "monai_swin_unetr"}, "in_channels": 1, "out_channels": 2,
         "input_size": [16, 32, 32],
         "monai": {"feature_size": 8, "depths": [1, 1, 1, 1], "window_size": [2, 4, 4]}},
    )
    model = build_model(cfg)
    params = init_model(model, cfg, jax.random.PRNGKey(0))
    out = jax.jit(model.apply)(params, jnp.zeros((1, 16, 32, 32, 1)))
    assert out.shape == (1, 16, 32, 32, 2)


def test_experiment_log(tmp_path):
    from pytorch_connectomics_tpu.decoding.experiment_log import ExperimentLog

    log = ExperimentLog(tmp_path / "exp.jsonl")
    log.append("decode", "abc", {"threshold": 0.5}, {"adapted_rand": 0.2})
    log.append("decode", "abc", {"threshold": 0.7}, {"adapted_rand": 0.1})
    assert len(log.entries()) == 2
    assert log.best("adapted_rand")["params"]["threshold"] == 0.7


def test_oracle_metrics():
    from pytorch_connectomics_tpu.metrics.oracle import adapted_rand_oracle, oracle_merge

    gt = np.zeros((4, 8, 8), np.uint32)
    gt[:, :, :4] = 1
    gt[:, :, 4:] = 2
    # over-segmented candidate: 4 fragments
    seg = gt.copy()
    seg[2:][seg[2:] == 1] = 3
    seg[2:][seg[2:] == 2] = 4
    are, oracle_are = adapted_rand_oracle(seg, gt)
    assert are > 0 and oracle_are == pytest.approx(0.0, abs=1e-9)
    merged = oracle_merge(seg, gt)
    # fixture has no background: exactly the two GT ids remain
    assert len(np.unique(merged)) == 2


def test_auto_config_planner():
    from pytorch_connectomics_tpu.config.auto_config import plan_for_memory

    big = plan_for_memory(hbm_gb=95)
    small = plan_for_memory(hbm_gb=8)
    assert np.prod(big.patch_size) * big.batch_size > np.prod(small.patch_size) * small.batch_size


def test_skeleton_volume_processor(tmp_path):
    import h5py

    from pytorch_connectomics_tpu.chunked import SkeletonVolumeProcessor

    lab = np.zeros((8, 32, 32), np.uint32)
    lab[2:6, 4:28, 14:18] = 1  # a tube along y
    out = np.zeros_like(lab)
    proc = SkeletonVolumeProcessor(lab.shape, (8, 32, 32), stride=(1, 2, 2), min_voxels=10)
    proc.run(reader=lambda sl: lab[sl], writer=out)
    assert (out == 1).sum() > 5  # rasterized centerline exists
    assert (out[lab == 0] == 0).mean() > 0.95  # mostly inside the instance


def test_gradnorm_weights():
    import jax.numpy as jnp

    from pytorch_connectomics_tpu.losses.balancing import gradnorm_weights

    init = jnp.array([1.0, 1.0])
    w = jnp.array([1.0, 1.0])
    # task 0 is learning fast (low loss), task 1 stuck -> task 1 gains weight
    for _ in range(50):
        w = gradnorm_weights([jnp.asarray(0.1), jnp.asarray(1.0)], init, w, lr=0.1)
    assert float(w[1]) > float(w[0])
    assert float(w.sum()) == pytest.approx(2.0, rel=1e-3)


def test_direct_2d_inference():
    import jax.numpy as jnp

    from pytorch_connectomics_tpu.config import load_config
    from pytorch_connectomics_tpu.inference.manager import InferenceManager

    raw = {
        "model": {
            "arch": {"type": "monai_unet"},
            "in_channels": 1, "out_channels": 1,
            "input_size": [1, 32, 32],
            "monai": {"filters": [4, 8], "num_res_units": 1, "strides": [[1, 2, 2]]},
            "loss": {"losses": [{"function": "DiceLoss"}]},
        },
        "data": {"train": {"image": "random://d2/im"}, "dataloader": {"patch_size": [1, 32, 32]}},
        "inference": {"direct_2d": True, "model": {"act": "sigmoid"}},
    }
    cfg = load_config(raw_dict=raw, mode="test")
    import jax

    from pytorch_connectomics_tpu.models import build_model, init_model

    manager = InferenceManager(cfg, build_model(cfg.model))
    params = init_model(manager_model := build_model(cfg.model), cfg.model, jax.random.PRNGKey(0))["params"]
    vol = np.random.rand(5, 32, 32).astype(np.float32)
    out = manager.predict(params, vol)
    assert out.shape == (5, 32, 32, 1)
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_multihead_inference_merge():
    """Multi-head model -> channel-concatenated prediction through the
    InferenceManager (reference multi-head merge, test_pipeline.py:915)."""
    import jax
    import numpy as np

    from pytorch_connectomics_tpu.config import load_config
    from pytorch_connectomics_tpu.inference.manager import InferenceManager
    from pytorch_connectomics_tpu.models import build_model, init_model

    raw = {
        "model": {
            "arch": {"type": "mednext"},
            "in_channels": 1, "out_channels": 4,
            "input_size": [16, 16, 16],
            "mednext": {
                "size": "custom", "base_channels": 8, "exp_ratio": 2,
                "block_counts": [1] * 9,
                "heads": [
                    {"name": "aff", "out_channels": 3, "num_blocks": 1},
                    {"name": "mask", "out_channels": 1, "num_blocks": 1},
                ],
            },
            "loss": {"losses": [{"function": "DiceLoss"}]},
        },
        "data": {"train": {"image": "random://mh/im"}, "dataloader": {"patch_size": [16, 16, 16]}},
        "inference": {"window": {"window_size": [16, 16, 16], "overlap": 0.25, "sw_batch_size": 2}},
    }
    cfg = load_config(raw_dict=raw, mode="test")
    model = build_model(cfg.model)
    params = init_model(model, cfg.model, jax.random.PRNGKey(0))["params"]
    manager = InferenceManager(cfg, model)
    vol = np.random.rand(16, 16, 16).astype(np.float32)
    out = manager.predict(params, vol)
    assert out.shape == (16, 16, 16, 4)  # aff(3) + mask(1), sorted head order

    # head selection narrows to one head's channels
    cfg.inference.model.output_head = "mask"
    m2 = InferenceManager(cfg, model)
    out2 = m2.predict(params, vol)
    assert out2.shape == (16, 16, 16, 1)


def test_nnunet_separate_z_rules():
    """Separate-z triggers on either-spacing anisotropy, force override, and
    non-z low-res axes (reference nnunet_preprocess.py:456)."""
    import numpy as np

    from pytorch_connectomics_tpu.data.nnunet_preprocess import (
        resample_volume,
        resolve_separate_z,
    )

    # isotropic -> no split
    assert resolve_separate_z((1, 1, 1), (1, 1, 1)) == (False, None)
    # anisotropic source -> split on z
    assert resolve_separate_z((8, 1, 1), (8, 1, 1)) == (True, 0)
    # isotropic source but anisotropic TARGET -> split
    assert resolve_separate_z((2, 2, 2), (8, 1, 1))[0] is True
    # low-res axis follows the largest source spacing (x here)
    assert resolve_separate_z((1, 1, 8), (1, 1, 8)) == (True, 2)
    # force override
    assert resolve_separate_z((8, 1, 1), (8, 1, 1), force_separate_z=False) == (False, None)
    assert resolve_separate_z((1.1, 1, 1), (1.1, 1, 1), force_separate_z=True) == (True, 0)

    # x-axis separate resample keeps label values intact (nearest on x)
    lbl = np.zeros((8, 8, 6), np.uint32)
    lbl[2:6, 2:6, 2:4] = 7
    out = resample_volume(lbl, (1, 1, 8), (1, 1, 4), is_label=True)
    assert out.shape == (8, 8, 12)
    assert set(np.unique(out)) <= {0, 7}


def test_mednext_2d_mode():
    """dim='2d': in-plane kernels/strides only; z survives the U (reference
    mednext dim='2d' for 2-D stacks like CEM-MitoLab)."""
    import jax
    import jax.numpy as jnp

    from pytorch_connectomics_tpu.config.schema import ModelConfig, build_dataclass
    from pytorch_connectomics_tpu.models import build_model, init_model

    cfg = build_dataclass(
        ModelConfig,
        {"arch": {"type": "mednext"}, "in_channels": 1, "out_channels": 3,
         "input_size": [1, 32, 32],
         "mednext": {"size": "S", "kernel_size": 3, "dim": "2d"},
         "loss": {"losses": [{"function": "DiceLoss"}]},
         "compute_dtype": "float32"},
    )
    model = build_model(cfg)
    v = init_model(model, cfg, jax.random.PRNGKey(0))
    out = model.apply(v, jnp.zeros((1, 1, 32, 32, 1)))
    assert out.shape == (1, 1, 32, 32, 3)
    k = v["params"]["_Stage_0"]["MedNeXtBlock_0"]["Conv_0"]["kernel"]
    assert k.shape[:3] == (1, 3, 3)  # in-plane depthwise kernel


def test_nnunet_preprocess_config_wiring(tmp_path):
    """nnunet_preprocessing config builds a dataset over crop/resampled
    volumes, and the hook owns normalization (zscore output)."""
    import h5py

    from pytorch_connectomics_tpu.config.schema import Config, build_dataclass
    from pytorch_connectomics_tpu.data.pipeline import build_dataset

    img = np.zeros((24, 24, 24), np.float32)
    img[4:20, 4:20, 4:20] = 100 + 10 * np.random.rand(16, 16, 16)
    lbl = (img > 100).astype(np.uint8)
    ip, lp = str(tmp_path / "im.h5"), str(tmp_path / "lb.h5")
    with h5py.File(ip, "w") as f:
        f.create_dataset("main", data=img)
    with h5py.File(lp, "w") as f:
        f.create_dataset("main", data=lbl)

    cfg = build_dataclass(
        Config,
        {
            "model": {"arch": {"type": "mednext"}},
            "data": {
                "train": {"image": ip, "label": lp},
                "dataloader": {"patch_size": [8, 8, 8]},
                "nnunet_preprocessing": {
                    "enabled": True,
                    "source_spacing": [8, 4, 4],
                    "target_spacing": [8, 8, 8],
                },
            },
        },
    )
    ds = build_dataset(cfg, cfg.data.train, train=True)
    # foreground crop (16^3) then in-plane downsample by 2 -> (16, 8, 8)
    assert ds.images[0].shape == (16, 8, 8)
    # zscore normalization applied by the hook
    assert abs(float(ds.images[0].mean())) < 1e-3
    assert ds.labels[0].shape == ds.images[0].shape


def test_nnunet_preprocess_lazy_dataset_rejected():
    from pytorch_connectomics_tpu.config.schema import Config, build_dataclass
    from pytorch_connectomics_tpu.data.pipeline import build_dataset

    cfg = build_dataclass(
        Config,
        {
            "model": {"arch": {"type": "mednext"}},
            "data": {
                "train": {"image": "random://train"},
                "dataloader": {"use_lazy_zarr": True},
                "nnunet_preprocessing": {"enabled": True},
            },
        },
    )
    import pytest

    with pytest.raises(ValueError, match="cached"):
        build_dataset(cfg, cfg.data.train, train=True)


def test_nnunet_restore_multichannel_alignment():
    """Per-channel restore puts predictions back at the source-grid voxels."""
    from pytorch_connectomics_tpu.data.nnunet_preprocess import (
        nnunet_preprocess,
        nnunet_restore,
    )

    img = np.zeros((12, 20, 20), np.float32)
    img[2:10, 5:15, 5:15] = 1.0
    pim, _, rec = nnunet_preprocess(
        img, source_spacing=(8, 4, 4), target_spacing=(8, 8, 8)
    )
    pred = np.stack([np.ones_like(pim), np.zeros_like(pim)], axis=-1)
    restored = np.stack(
        [nnunet_restore(pred[..., c], rec, is_label=False) for c in range(2)],
        axis=-1,
    )
    assert restored.shape == img.shape + (2,)
    # foreground region carries channel-0 ones; outside the crop is zero
    assert restored[6, 10, 10, 0] == 1.0
    assert restored[0, 0, 0, 0] == 0.0


def test_autodownload_missing_train_data_raises_with_instructions(tmp_path, monkeypatch):
    """Missing train data matching a registry entry raises with fetch
    instructions (reference data_factory.py:372-434); random:// passes."""
    import pytest

    from pytorch_connectomics_tpu.config.schema import Config, build_dataclass
    from pytorch_connectomics_tpu.data.download import (
        infer_dataset_from_path,
        maybe_autodownload_train_data,
    )

    monkeypatch.delenv("PYTC_AUTO_DOWNLOAD", raising=False)
    cfg = build_dataclass(
        Config,
        {"model": {"arch": {"type": "mednext"}},
         "data": {"train": {"image": "datasets/snemi/train_im.h5"}}},
    )
    with pytest.raises(FileNotFoundError, match="snemi"):
        maybe_autodownload_train_data(cfg, interactive=False)

    assert infer_dataset_from_path("datasets/snemi/train_im.h5") == "snemi"
    assert infer_dataset_from_path("/nowhere/volume.h5") is None

    # synthetic volumes never trigger the check
    cfg2 = build_dataclass(
        Config,
        {"model": {"arch": {"type": "mednext"}},
         "data": {"train": {"image": "random://train"}}},
    )
    maybe_autodownload_train_data(cfg2, interactive=False)

    # existing data passes
    d = tmp_path / "vol.h5"
    d.write_bytes(b"x")
    cfg3 = build_dataclass(
        Config,
        {"model": {"arch": {"type": "mednext"}},
         "data": {"train": {"image": str(d)}}},
    )
    maybe_autodownload_train_data(cfg3, interactive=False)
