"""InferenceManager: wires config -> sliding window + TTA (+ chunked).

Reference: ``connectomics/inference/manager.py:24-119``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import numpy as np

from ..config.schema import Config
from .tta import TTAPredictor
from .window import SlidingWindowEngine, make_engine


class InferenceManager:
    def __init__(self, cfg: Config, model, mesh=None, output_head: Optional[str] = None):
        self.cfg = cfg
        inf = cfg.inference
        head = output_head or inf.model.output_head

        def apply_fn(params, windows):
            out = model.apply({"params": params}, windows, train=False)
            if isinstance(out, dict):
                out = out[head] if head else out.get("out", next(iter(out.values())))
            return out

        self.apply_fn = apply_fn
        self.engine = make_engine(apply_fn, inf.window, cfg.model.input_size)
        acts = inf.model.act
        if acts is None:
            extra = getattr(inf.model, "extra", None) or {}
            acts = extra.get("channel_activations")
        self.predictor = TTAPredictor(
            self.engine,
            inf.test_time_augmentation,
            activations=acts,
            select_channel=inf.model.select_channel,
            mesh=mesh,
        )
        self.mesh = mesh

    def predict(self, params, volume: np.ndarray) -> np.ndarray:
        """Full-volume prediction with TTA -> (Z,Y,X,C) float32."""
        return self.predictor.predict(params, volume)
