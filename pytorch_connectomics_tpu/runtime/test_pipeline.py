"""Test pipeline: inference -> decode -> evaluate per test volume, with
prediction caching and chunked-mode branch.

Reference: ``run_test_step`` (``training/lightning/test_pipeline.py:489-1102``)
— cache classification (:536), chunked branch (:688), whole-volume TTA
prediction (:915), save intermediate (:993), decode (:1071), evaluate
(:1081) — reorganized as a plain function over the jitted inference engines.
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

from ..config.loader import config_hash
from ..config.schema import Config
from ..data.io import read_volume
from ..decoding.stage import run_decoding_stage
from ..evaluation.stage import run_evaluation_stage
from ..inference import (
    InferenceManager,
    LazyVolumeAccessor,
    apply_prediction_transform,
    run_chunked_inference,
    save_prediction,
    validate_prediction_cache,
)
from .output_naming import (
    decoded_filename,
    prediction_filename,
    prediction_tag,
    volume_name_from_path,
)
from .sharding import shard_paths

logger = logging.getLogger(__name__)


def _as_list(x):
    if x is None:
        return []
    return list(x) if isinstance(x, (list, tuple)) else [x]


def run_test_pipeline(
    cfg: Config,
    model,
    params,
    output_dir: str | Path,
    checkpoint: Optional[str] = None,
    mesh=None,
    mode: str = "test",
) -> Dict[str, Dict[str, float]]:
    """Run inference (+decode +evaluate) over all test volumes.

    Returns {volume_name: metrics}. In ``tune`` mode stops after caching raw
    predictions (reference ``test_pipeline.py:1044-1056``).
    """
    out_dir = Path(output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    images = _as_list(cfg.data.test.image)
    labels = _as_list(cfg.data.test.label)
    # resolve the sharding mode (explicit args / launcher env / chunk grid)
    # through the decision engine (reference runtime/sharding.py:35-300)
    from .sharding import plan_test_sharding

    plan = plan_test_sharding(cfg, num_volumes=len(images))
    for note in plan.notes:
        logger.info("shard plan: %s", note)
    if plan.empty:
        return {}
    if plan.mode == "independent":
        # shard image+label pairs JOINTLY so ground truth stays aligned
        paired = list(zip(images, labels + [None] * len(images)))
        paired = shard_paths(paired, plan.shard_id, plan.num_shards)
        images = [p[0] for p in paired]
        labels = [p[1] for p in paired if p[1] is not None]
    if not plan.tta_sharding:
        # rank-mixing hazard for multi-volume / independent-shard runs
        cfg.inference.test_time_augmentation.shard_across_devices = False
    manager = InferenceManager(cfg, model, mesh=mesh)
    cfg_hash = config_hash(cfg)
    tag = prediction_tag(
        checkpoint,
        tta_passes=manager.predictor.num_variants,
        head=cfg.inference.model.output_head,
        channels=cfg.inference.model.select_channel,
    )
    all_metrics: Dict[str, Dict[str, float]] = {}

    # decode-only mode: an external prediction replaces inference entirely
    # (reference waterz_decoding.yaml load_prediction_path)
    ext_pred = cfg.decoding.load_prediction_path if cfg.decoding.enabled else None
    if ext_pred and not images:
        images = [ext_pred]

    for vi, image_path in enumerate(images):
        vol_name = volume_name_from_path(image_path)
        pred_path = out_dir / prediction_filename(vol_name, tag)
        dec_path = out_dir / decoded_filename(
            vol_name, tag,
            decoding_cfg=cfg.decoding if cfg.decoding.enabled else None,
        )
        t0 = time.time()

        prediction = None
        nn_rec = None
        pred_cached = False
        if ext_pred:
            logger.info("decode-only: loading prediction %s", ext_pred)
            prediction = read_volume(ext_pred)
            if prediction.ndim == 3:
                prediction = prediction[None]
            if prediction.dtype == np.uint8:  # uint8 affinity convention
                prediction = prediction.astype(np.float32) / 255.0
            prediction = np.moveaxis(prediction, 0, -1)  # stored (C,Z,Y,X)
        elif validate_prediction_cache(pred_path, cfg_hash, checkpoint or ""):
            logger.info("cache hit: %s", pred_path)
            pred_cached = True
            prediction = read_volume(str(pred_path))
            prediction = np.moveaxis(prediction, 0, -1)  # stored (C,Z,Y,X)
        elif cfg.inference.chunked.enabled:
            accessor = LazyVolumeAccessor(
                image_path,
                transpose=cfg.data.test.transpose,
                pad=cfg.data.test.pad,
                normalize=cfg.data.preprocessing.normalize,
                scale=cfg.data.test.read_scale,
            )
            run_chunked_inference(
                manager.predictor,
                params,
                accessor,
                pred_path,
                cfg.inference.chunked,
                shard_id=cfg.system.shard_id,
                num_shards=cfg.system.num_shards,
                # checkpoint is part of the signature so (a) the resume
                # manifest invalidates partial chunks computed from different
                # weights and (b) the artifact's provenance attrs let
                # validate_prediction_cache reject it on a checkpoint change.
                signature={
                    "config_hash": cfg_hash,
                    "checkpoint": str(checkpoint or "") or "random-init",
                },
            )
            prediction = np.moveaxis(read_volume(str(pred_path)), 0, -1)
        else:
            from ..data.preprocess import normalize_volume

            if cfg.data.test.read_scale:
                vol = LazyVolumeAccessor(
                    image_path,
                    transpose=cfg.data.test.transpose,
                    normalize=cfg.data.preprocessing.normalize,
                    scale=cfg.data.test.read_scale,
                ).read_all()
            else:
                vol = read_volume(image_path)
                if cfg.data.test.transpose:
                    vol = np.transpose(vol, cfg.data.test.transpose)
                if not cfg.data.nnunet_preprocessing.enabled:
                    vol = normalize_volume(vol, cfg.data.preprocessing.normalize)
            if cfg.data.nnunet_preprocessing.enabled:
                # nnU-Net crop/resample/normalize before inference; the
                # prediction is restored to input space below (reference
                # inference/output.py restore wiring)
                from ..data.nnunet_preprocess import preprocess_fn_from_config

                nn_pre = preprocess_fn_from_config(
                    cfg.data.nnunet_preprocessing,
                    split_resolution=cfg.data.test.resolution,
                )
                vol, _, nn_rec = nn_pre(vol)
            prediction = manager.predict(params, vol)  # (Z,Y,X,C)
            if nn_rec is not None and cfg.data.nnunet_preprocessing.restore_to_input_space:
                from ..data.nnunet_preprocess import nnunet_restore

                prediction = np.stack(
                    [
                        nnunet_restore(prediction[..., c], nn_rec, is_label=False)
                        for c in range(prediction.shape[-1])
                    ],
                    axis=-1,
                )
            if cfg.inference.output.save_raw:
                stored = np.moveaxis(
                    apply_prediction_transform(prediction, cfg.inference.output), -1, 0
                )
                save_prediction(
                    pred_path, stored, cfg_hash, checkpoint or "", tag
                )
            if cfg.inference.output.save_all_heads and getattr(manager, "head_spans", None):
                # per-head artifacts alongside the merged prediction
                # (reference save-all-heads, test_pipeline.py:993-1039)
                from .output_naming import head_filenames

                names = head_filenames(
                    vol_name, tag, [h for h, _, _ in manager.head_spans]
                )
                for hname, c0, c1 in manager.head_spans:
                    hstored = np.moveaxis(
                        apply_prediction_transform(
                            prediction[..., c0:c1], cfg.inference.output
                        ), -1, 0,
                    )
                    save_prediction(
                        out_dir / names[hname], hstored, cfg_hash,
                        checkpoint or "", f"{tag}_head_{hname}",
                    )
        infer_s = time.time() - t0
        voxels = int(np.prod(prediction.shape[:3]))
        logger.info(
            "inference[%s]: %.1fs (%.2f Mvox/s)", vol_name, infer_s, voxels / max(infer_s, 1e-9) / 1e6
        )
        if mode == "tune":
            all_metrics[vol_name] = {"cached": 1.0}
            continue

        # pre-decode crops: crop_pad + affinity-offset border invalidation
        # (reference prediction_crops.py)
        if cfg.inference.output.crop_pad:
            from ..inference.prediction_crops import apply_prediction_crops

            prediction = apply_prediction_crops(
                prediction, crop_pad=cfg.inference.output.crop_pad
            )

        decoded = None
        if cfg.decoding.enabled and (cfg.decoding.steps or cfg.decoding.graph):
            if cfg.decoding.reuse_cached and pred_cached and dec_path.exists():
                # re-entrancy: the decoded name encodes the decode recipe and
                # the prediction came from a valid cache — whole-stage skip
                # (reference cache_resolver, dispatch.py:288-346)
                logger.info("decode cache hit: %s", dec_path)
                decoded = read_volume(str(dec_path)).astype(np.uint32)
            else:
                t1 = time.time()
                if cfg.decoding.streamed:
                    # chunk-parallel decode through the same streamed engines
                    # used at production scale (exact whole-volume parity)
                    from ..decoding.stage import run_streamed_decoding_stage

                    pred_cf = np.moveaxis(prediction, -1, 0)

                    def _reader(slices):
                        return pred_cf[(slice(None),) + tuple(slices)]

                    decoded = run_streamed_decoding_stage(
                        _reader, prediction.shape[:3], cfg.decoding
                    )
                else:
                    decoded = run_decoding_stage(prediction, cfg.decoding)
                logger.info("decode[%s]: %.1fs, %d instances", vol_name, time.time() - t1,
                            len(np.unique(decoded)) - 1)
                from ..data.io import save_volume

                save_volume(str(dec_path), decoded.astype(np.uint32))

        if cfg.evaluation.enabled and vi < len(labels):
            gt = read_volume(labels[vi])
            if cfg.data.test.transpose:
                gt = np.transpose(gt, cfg.data.test.transpose)
            if getattr(cfg.data.data_transform, "align_to_image", False):
                # minor GT/prediction size mismatches reconciled by center
                # pad/crop (reference align_to_image, test_pipeline.py:282)
                from ..data.preprocess import center_align

                ref_shape = (
                    prediction.shape[:3] if prediction is not None
                    else np.asarray(decoded).shape if decoded is not None else None
                )
                if ref_shape is not None and tuple(gt.shape[-3:]) != tuple(ref_shape):
                    lead = gt.ndim - 3
                    gt = center_align(gt, gt.shape[:lead] + tuple(ref_shape))
            metrics = run_evaluation_stage(
                prediction, decoded, gt, cfg.evaluation, out_dir, vol_name
            )
            all_metrics[vol_name] = metrics
        else:
            all_metrics[vol_name] = {}
    if cfg.evaluation.enabled and any(all_metrics.values()):
        from ..evaluation.report import aggregate_metrics_summary

        aggregate_metrics_summary(out_dir)  # cross-volume epoch-end report
    return all_metrics
