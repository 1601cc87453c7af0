"""Decoding stage orchestration for one volume
(reference ``run_decoding_stage``, ``connectomics/decoding/stage.py:250``):
QC mask -> steps or graph -> postprocessing."""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional

import numpy as np

from ..config.schema import DecodingConfig
from . import decoders  # noqa: F401 - registers built-ins
from .postprocess import apply_postprocessing
from .qc import scan_affinity_quality
from .registry import run_graph, run_steps

logger = logging.getLogger(__name__)


def run_decoding_stage(
    prediction: np.ndarray,
    cfg: DecodingConfig,
    extra_inputs: Optional[Dict[str, np.ndarray]] = None,
) -> np.ndarray:
    """prediction (C,Z,Y,X) or (Z,Y,X,C) -> decoded labels (Z,Y,X) uint32."""
    pred = np.asarray(prediction, dtype=np.float32)
    if pred.ndim == 3:
        pred = pred[None]
    elif pred.ndim == 4 and pred.shape[0] > pred.shape[-1]:
        # assume channel-last input from inference: move to channel-first
        pred = np.moveaxis(pred, -1, 0)
    if cfg.qc.enabled:
        from .qc import AffinityQCParams, write_qc_report

        params = AffinityQCParams(
            z_stride=cfg.qc.z_stride,
            drift_thresh=cfg.qc.z_mean_drift,
            border_width=cfg.qc.border_width,
            bg_thresh=cfg.qc.bg_thresh,
        )
        mask, report = scan_affinity_quality(
            pred, cfg.qc.z_mean_drift, cfg.qc.border_low_intensity,
            border_width=cfg.qc.border_width,
            img=(extra_inputs or {}).get("image"), params=params,
        )
        if cfg.qc.report_path:
            write_qc_report(report, cfg.qc.report_path, params)
            logger.info("QC report written to %s", cfg.qc.report_path)
        else:
            logger.info("QC: %s", report.to_markdown(params).replace("\n", " | "))
        pred = pred * mask[None]
    if cfg.graph:
        inputs = {"prediction": pred}
        inputs.update(extra_inputs or {})
        labels = run_graph(inputs, cfg.graph)
    elif cfg.steps:
        labels = run_steps(pred, cfg.steps)
    else:
        from .decoders import decode_binary_cc

        labels = decode_binary_cc(pred)
    labels = apply_postprocessing(labels, cfg.postprocessing)
    return np.asarray(labels)


def run_streamed_decoding_stage(
    reader,
    vol_shape,
    cfg: DecodingConfig,
) -> np.ndarray:
    """Memory-bounded chunk-parallel decode from a lazy affinity reader
    (``reader(slices) -> (C, z, y, x)`` float array for a region).

    Supports exactly ONE decode step — ``affinity_cc`` or ``waterz`` — whose
    chunked implementations are exactly equal to the whole-volume decoders
    (see :mod:`..decoding.streamed`), followed by normal postprocessing.
    Enabled via ``decoding.streamed: true``; chunk geometry from
    ``decoding.streamed_chunk``.
    """
    from .streamed import streamed_affinity_cc_decode, streamed_waterz_decode

    if cfg.graph or len(cfg.steps) != 1:
        raise ValueError(
            "decoding.streamed supports exactly one decode step "
            "(affinity_cc or waterz); got "
            f"{[s.name for s in cfg.steps] or 'graph'}"
        )
    if cfg.qc.enabled:
        raise ValueError(
            "decoding.streamed does not support the affinity QC mask pass "
            "(use the StreamingQCAccumulator during chunked inference instead)"
        )
    step = cfg.steps[0]
    kw = dict(step.kwargs or {})
    chunk = tuple(cfg.streamed_chunk)
    if step.name == "affinity_cc":
        labels = streamed_affinity_cc_decode(
            reader, vol_shape, chunk,
            threshold=float(kw.get("threshold", 0.75)),
            min_size=int(kw.get("min_size", 0)),
        )
    elif step.name == "waterz":
        if kw.get("fragments", "cc") != "cc":
            raise ValueError(
                "decoding.streamed waterz requires fragments='cc' "
                "(watershed fragments are not exactly chunkable)"
            )
        labels = streamed_waterz_decode(
            reader, vol_shape, chunk,
            threshold=float(kw.get("threshold", 0.5)),
            # same clamp as decode_waterz's cc-fragment path
            fragment_threshold=max(0.9, float(kw.get("fragment_threshold", 0.5))),
            min_size=int(kw.get("min_size", 0)),
        )
    else:
        raise ValueError(
            f"decoding.streamed does not support step '{step.name}' "
            "(only affinity_cc and waterz)"
        )
    labels = apply_postprocessing(labels, cfg.postprocessing)
    return np.asarray(labels)
