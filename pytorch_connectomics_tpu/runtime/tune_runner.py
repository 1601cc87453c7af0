"""Tune mode: cache raw predictions (inference only), then search decode
parameters against GT.

Reference: ``run_tuning`` (``connectomics/runtime/tune_runner.py:207``) with
our own tuner replacing Optuna; tune-test applies best params then runs the
test pipeline (``tune_runner.py:480``, ``dispatch.py:226-238``).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

from ..config.loader import config_hash
from ..config.schema import Config, to_dict
from ..data.io import read_volume
from ..decoding.tuning import DecodingTuner, load_best_params, make_decode_objective
from .output_naming import (
    prediction_filename,
    prediction_tag,
    tuned_params_filename,
    volume_name_from_path,
)
from .test_pipeline import run_test_pipeline, _as_list

logger = logging.getLogger(__name__)


def run_tuning(
    cfg: Config,
    model,
    params,
    output_dir: str | Path,
    checkpoint: Optional[str] = None,
    mesh=None,
) -> Path:
    """Returns path to the best-params YAML."""
    out_dir = Path(output_dir)
    # 1. ensure cached predictions exist (inference-only pass)
    run_test_pipeline(cfg, model, params, out_dir, checkpoint, mesh, mode="tune")

    # 2. load predictions + GT, build objective over first tune volume(s)
    from ..inference.manager import InferenceManager

    manager = InferenceManager(cfg, model, mesh=mesh)
    tag = prediction_tag(
        checkpoint,
        tta_passes=manager.predictor.num_variants,
        head=cfg.inference.model.output_head,
        channels=cfg.inference.model.select_channel,
    )
    images = _as_list(cfg.data.test.image)
    labels = _as_list(cfg.data.test.label)
    if not labels:
        raise ValueError("tune mode needs data.test.label ground truth")
    # every tune volume contributes: metric averaged per trial, each volume
    # decoded independently (reference per-volume evaluation)
    pairs = []
    for image_path, label_path in zip(images, labels):
        vol_name = volume_name_from_path(image_path)
        pred = read_volume(str(out_dir / prediction_filename(vol_name, tag)))
        gt = read_volume(label_path)
        if cfg.data.test.transpose:
            gt = np.transpose(gt, cfg.data.test.transpose)
        pairs.append((pred, gt))

    tuning = cfg.decoding.tuning
    decoding_dict = to_dict(cfg.decoding)
    decoding_dict.pop("tuning", None)
    from ..decoding.tuning import (
        find_waterz_step,
        make_multi_volume_objective,
        make_waterz_batch_objective,
    )

    if tuning.batch_thresholds and find_waterz_step(decoding_dict) is not None:
        # waterz batch mode: one watershed+RAG per trial per volume sweeps
        # every merge threshold (reference optuna_tuner.py:1155)
        objective = make_waterz_batch_objective(
            [p for p, _ in pairs], [g for _, g in pairs], decoding_dict,
            tuning.metric, tuning.batch_thresholds,
            minimize=tuning.direction != "maximize",
        )
        logger.info(
            "waterz batch tuning: %d volumes x %d thresholds per trial",
            len(pairs), len(tuning.batch_thresholds),
        )
    elif len(pairs) > 1:
        objective = make_multi_volume_objective(
            pairs, decoding_dict, tuning.metrics or tuning.metric
        )
    else:
        objective = make_decode_objective(
            pairs[0][0], pairs[0][1], decoding_dict, tuning.metrics or tuning.metric
        )
    tuner = DecodingTuner(tuning, objective)
    best = tuner.optimize()
    logger.info(
        "tuning done: best %s = %s with %s%s",
        tuning.metrics or tuning.metric,
        best.values if tuner.multi else best.value,
        best.params,
        f" (attrs {best.user_attrs})" if best.user_attrs else "",
    )
    if "best_threshold" in best.user_attrs:
        # batch mode: fold the winning sweep threshold into best_params so
        # tune-test applies it like any other tuned param
        idx = find_waterz_step(decoding_dict)
        best.params[f"steps.{idx}.kwargs.threshold"] = best.user_attrs["best_threshold"]
    study_path = out_dir / tuned_params_filename(tag)
    tuner.save_study(study_path)
    return study_path


def apply_best_params(cfg: Config, study_path: str | Path) -> Config:
    """Patch decoding config with tuned params (tune-test mode)."""
    import copy

    from ..config.schema import DecodingConfig, build_dataclass
    from ..decoding.tuning import _set_dotted_with_list_indices

    best = load_best_params(study_path)
    d = to_dict(cfg.decoding)
    d.pop("tuning", None)
    for k, v in best.items():
        _set_dotted_with_list_indices(d, k, v)
    cfg = copy.deepcopy(cfg)
    cfg.decoding = build_dataclass(DecodingConfig, d)
    return cfg
