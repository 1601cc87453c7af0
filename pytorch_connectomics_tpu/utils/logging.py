"""Scalar logging: stdout + JSONL (and optional TensorBoard if available).

Reference: TB scalar logging (``trainer.py:186-196``); we default to an
append-only ``metrics.jsonl`` which doubles as the experiment record.
"""

from __future__ import annotations

import json
import logging
import sys
import time
from pathlib import Path
from typing import Any, Dict, Optional

logger = logging.getLogger("connectomics_tpu")


def setup_logging(rank: int = 0, level=logging.INFO) -> None:
    """Rank-0-only stdout logging (reference ``dispatch.py:44-51``)."""
    handler = logging.StreamHandler(sys.stdout)
    handler.setFormatter(logging.Formatter("[%(asctime)s] %(levelname)s %(message)s", "%H:%M:%S"))
    root = logging.getLogger()
    root.handlers = [handler] if rank == 0 else [logging.NullHandler()]
    root.setLevel(level if rank == 0 else logging.ERROR)


class MetricsLogger:
    """Scalar/image logger with jsonl / tensorboard / wandb backends
    (reference ``schema/monitor.py:100-107`` W&B block; TB scalar logging
    ``trainer.py:186-196``). Unavailable backends degrade to jsonl with a
    warning — training never fails on a logging import."""

    def __init__(
        self,
        out_dir: Optional[str | Path] = None,
        backend: str = "jsonl",
        wandb_cfg: Optional[Dict[str, Any]] = None,
        config: Optional[Dict[str, Any]] = None,
    ):
        self.out_dir = Path(out_dir) if out_dir else None
        self._fh = None
        self._tb = None
        self._wandb = None
        if self.out_dir and backend != "none":
            self.out_dir.mkdir(parents=True, exist_ok=True)
            self._fh = open(self.out_dir / "metrics.jsonl", "a")
        if self.out_dir and backend == "tensorboard":
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=str(self.out_dir / "tb"))
            except Exception as e:  # pragma: no cover
                logger.warning("tensorboard unavailable (%s); using jsonl only", e)
        if backend == "wandb" or (wandb_cfg or {}).get("use_wandb"):
            try:
                import wandb

                wc = wandb_cfg or {}
                self._wandb = wandb.init(
                    project=wc.get("project", "connectomics"),
                    entity=wc.get("entity"),
                    name=wc.get("name"),
                    tags=list(wc.get("tags") or []),
                    dir=str(self.out_dir) if self.out_dir else None,
                    config=config,
                    mode=wc.get("mode", "offline"),
                )
            except Exception as e:  # pragma: no cover
                logger.warning("wandb unavailable (%s); using jsonl only", e)
        self._t0 = time.time()

    def log(self, step: int, scalars: Dict[str, Any], prefix: str = "") -> None:
        rec = {"step": int(step), "time": round(time.time() - self._t0, 3)}
        for k, v in scalars.items():
            try:
                rec[prefix + k] = float(v)
            except (TypeError, ValueError):
                rec[prefix + k] = str(v)
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self._tb:
            for k, v in rec.items():
                if k not in ("step", "time") and isinstance(v, float):
                    self._tb.add_scalar(k, v, int(step))
        if self._wandb is not None:
            self._wandb.log(
                {k: v for k, v in rec.items() if k != "step"}, step=int(step)
            )

    def log_image(self, step: int, tag: str, image) -> None:
        """HWC or HW uint8 image to TB/W&B (when enabled)."""
        if self._tb is not None:
            import numpy as _np

            img = _np.asarray(image)
            if img.ndim == 2:
                img = img[None]
            elif img.ndim == 3:
                img = _np.moveaxis(img, -1, 0)
            self._tb.add_image(tag, img, int(step))
        if self._wandb is not None:
            import wandb

            self._wandb.log({tag: wandb.Image(image)}, step=int(step))

    def close(self):
        if self._fh:
            self._fh.close()
        if self._tb:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
