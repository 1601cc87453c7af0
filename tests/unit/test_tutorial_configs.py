"""All shipped tutorial configs must load and validate in every mode
(reference ``scripts/validate_tutorial_configs.py`` + CI config validation)."""

from pathlib import Path

import pytest

from pytorch_connectomics_tpu.config import load_config
from pytorch_connectomics_tpu.models import build_model

TUTORIALS = sorted((Path(__file__).resolve().parents[2] / "tutorials").glob("*.yaml"))


@pytest.mark.parametrize("path", TUTORIALS, ids=[p.stem for p in TUTORIALS])
def test_tutorial_config_loads_train(path):
    from pytorch_connectomics_tpu.config.schema import ConfigError

    try:
        cfg = load_config(path, mode="train")
    except ConfigError as e:
        if "data.train.image" in str(e):
            pytest.skip("decode/eval-only workload (no train split)")
        raise
    assert cfg.model.loss.losses, f"{path.stem}: no loss terms resolved"
    # model must be constructible
    model = build_model(cfg.model)
    assert model is not None


@pytest.mark.parametrize("path", TUTORIALS, ids=[p.stem for p in TUTORIALS])
def test_tutorial_config_loads_test(path):
    cfg = load_config(path, mode="test")
    assert cfg.inference.window.window_size is not None
