"""Whole-volume vs chunked inference must produce the same raw prediction
on identical weights (reference ``tests/inference/test_nisb`` pattern,
run fully synthetically: random:// volume + freshly-initialized model)."""

from pathlib import Path

import numpy as np
import pytest

HERE = Path(__file__).resolve().parent


@pytest.fixture(scope="module")
def runs(tmp_path_factory):
    import jax

    from pytorch_connectomics_tpu.config import load_config
    from pytorch_connectomics_tpu.models import build_model, init_model
    from pytorch_connectomics_tpu.runtime.test_pipeline import run_test_pipeline

    out = {}
    params = model = None
    for name in ("whole", "chunked"):
        cfg = load_config(HERE / f"{name}.yaml", mode="test")
        if model is None:
            model = build_model(cfg.model)
            params = init_model(model, cfg.model, jax.random.PRNGKey(7))["params"]
        run_dir = tmp_path_factory.mktemp(name)
        run_test_pipeline(cfg, model, params, run_dir)
        preds = sorted(run_dir.glob("*prediction*.h5"))
        assert preds, f"{name}: no raw prediction written"
        from pytorch_connectomics_tpu.data.io import read_volume

        out[name] = read_volume(str(preds[0]))
    return out


def test_whole_vs_chunked_predictions_match(runs):
    whole, chunked = runs["whole"], runs["chunked"]
    assert whole.shape == chunked.shape
    np.testing.assert_allclose(whole, chunked, atol=2e-3)


def test_predictions_are_nontrivial(runs):
    # guards against an all-constant output making the equality vacuous
    assert float(np.std(runs["whole"])) > 1e-4
