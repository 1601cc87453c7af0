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
    def __init__(self, out_dir: Optional[str | Path] = None, backend: str = "jsonl"):
        self.out_dir = Path(out_dir) if out_dir else None
        self._fh = None
        self._tb = None
        if self.out_dir and backend != "none":
            self.out_dir.mkdir(parents=True, exist_ok=True)
            self._fh = open(self.out_dir / "metrics.jsonl", "a")
        if self.out_dir and backend == "tensorboard":
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=str(self.out_dir / "tb"))
            except Exception as e:  # pragma: no cover
                logger.warning("tensorboard unavailable (%s); using jsonl only", e)
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

    def log_image(self, step: int, tag: str, image) -> None:
        """HWC or HW uint8 image to TB (when enabled)."""
        if self._tb is not None:
            import numpy as _np

            img = _np.asarray(image)
            if img.ndim == 2:
                img = img[None]
            elif img.ndim == 3:
                img = _np.moveaxis(img, -1, 0)
            self._tb.add_image(tag, img, int(step))

    def close(self):
        if self._fh:
            self._fh.close()
        if self._tb:
            self._tb.close()
