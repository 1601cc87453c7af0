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
                if head:
                    out = out[head]
                elif "out" in out:
                    out = out["out"]
                else:
                    # multi-head merge: concatenate head channels in sorted
                    # name order (reference multi-head merge inference,
                    # ``test_pipeline.py:915-954``)
                    import jax.numpy as jnp

                    names = sorted(k for k in out if not k.startswith("ds_"))
                    out = jnp.concatenate([out[k] for k in names], axis=-1)
            return out

        self.apply_fn = apply_fn
        self.engine = make_engine(apply_fn, inf.window, cfg.model.input_size)
        acts = inf.model.act
        if acts is None:
            extra = getattr(inf.model, "extra", None) or {}
            acts = extra.get("channel_activations")
        # affinity channel ranges from the label transform: flip TTA on
        # affinity outputs needs per-offset realignment (tta.py docstring)
        from ..data.targets.build import affinity_target_groups

        aff_groups = affinity_target_groups(
            getattr(cfg.data, "label_transform", None)
        )
        self.predictor = TTAPredictor(
            self.engine,
            inf.test_time_augmentation,
            activations=acts,
            select_channel=inf.model.select_channel,
            mesh=mesh,
            affinity_groups=aff_groups,
        )
        self.mesh = mesh
        # channel spans per head in the merged prediction (sorted-name order,
        # matching apply_fn's concat) — lets the test pipeline split and save
        # per-head artifacts (inference.output.save_all_heads)
        self.head_spans: Optional[list] = None
        heads = getattr(getattr(cfg.model, "mednext", None), "heads", None)
        if not head and heads:
            spans, start = [], 0
            for h in sorted(heads, key=lambda h: h.name):
                spans.append((h.name, start, start + int(h.out_channels)))
                start += int(h.out_channels)
            self.head_spans = spans

    def predict(self, params, volume: np.ndarray) -> np.ndarray:
        """Full-volume prediction with TTA -> (Z,Y,X,C) float32."""
        if self.cfg.inference.direct_2d:
            return self.predict_direct_2d(params, volume)
        return self.predictor.predict(params, volume)

    def predict_direct_2d(self, params, volume: np.ndarray, batch_size: int = 8) -> np.ndarray:
        """2-D direct mode: each z-section forwarded whole as a 1-deep patch,
        no sliding window (reference 2D direct mode, ``manager.py:24-119``)."""
        import jax
        import jax.numpy as jnp

        from ..inference.tta import apply_channel_activations

        vol = np.asarray(volume, np.float32)
        if vol.ndim == 3:
            vol = vol[..., None]
        z = vol.shape[0]
        fwd = jax.jit(self.apply_fn)
        outs = []
        for start in range(0, z, batch_size):
            sec = vol[start : start + batch_size]  # (B, Y, X, C) -> treat as (B,1,Y,X,C)
            batch = jnp.asarray(sec[:, None])
            pad = batch_size - batch.shape[0]
            if pad:
                batch = jnp.concatenate([batch, jnp.repeat(batch[-1:], pad, 0)])
            pred = np.asarray(fwd(params, batch))[: sec.shape[0], 0]
            outs.append(pred)
        out = np.concatenate(outs, axis=0)
        acts = self.predictor.activations
        return apply_channel_activations(out, acts).astype(np.float32)
