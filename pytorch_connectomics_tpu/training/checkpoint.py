"""Checkpointing on Orbax: top-k by monitored metric + last, metadata with
config hash, and selective state resets on resume.

Reference behavior: ModelCheckpoint top-k/last (``trainer.py:72-103``),
filename embedding epoch+metric (``trainer.py:108-119``),
``modify_checkpoint_state`` resets (``training/lightning/runtime.py:156``),
config-hash embedding + mismatch warning (``model.py:244-297``).
"""

from __future__ import annotations

import json
import logging
import shutil
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)


class CheckpointManager:
    def __init__(
        self,
        directory: str | Path,
        save_top_k: int = 1,
        monitor: str = "train_loss_total_epoch",
        mode: str = "min",
        save_last: bool = True,
        filename_prefix: Optional[str] = None,
    ):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.save_top_k = save_top_k
        self.monitor = monitor
        self.mode = mode
        self.save_last = save_last
        # custom stem for top-k checkpoint dirs (reference checkpoint_filename)
        self.filename_prefix = f"{filename_prefix}-" if filename_prefix else ""
        self._ckptr = ocp.StandardCheckpointer()
        self._index_path = self.dir / "index.json"
        self._index: List[Dict[str, Any]] = []
        if self._index_path.exists():
            self._index = json.loads(self._index_path.read_text())

    # -- save --------------------------------------------------------------

    def _save_tree(self, path: Path, state: Any, metadata: Dict[str, Any]):
        if path.exists():
            shutil.rmtree(path)
        self._ckptr.save(path.resolve() / "state", state)
        self._ckptr.wait_until_finished()
        (path / "metadata.json").write_text(json.dumps(metadata, default=str))

    def save(
        self,
        state: Any,
        epoch: int,
        metrics: Dict[str, float],
        metadata: Optional[Dict[str, Any]] = None,
    ) -> Optional[Path]:
        meta = dict(metadata or {})
        meta.update({"epoch": epoch, "metrics": metrics})
        score = metrics.get(self.monitor)
        saved = None
        if score is not None and self.save_top_k != 0:
            name = f"{self.filename_prefix}epoch={epoch:03d}-{self.monitor}={score:.4f}"
            path = self.dir / name
            better = self._is_topk(score)
            if better:
                self._save_tree(path, state, meta)
                self._index.append({"path": name, "score": float(score), "epoch": epoch})
                self._prune()
                saved = path
        if self.save_last:
            self._save_tree(self.dir / "last", state, meta)
        self._index_path.write_text(json.dumps(self._index))
        return saved

    def _is_topk(self, score: float) -> bool:
        if self.save_top_k < 0 or len(self._index) < self.save_top_k:
            return True
        scores = [e["score"] for e in self._index]
        worst = max(scores) if self.mode == "min" else min(scores)
        return score < worst if self.mode == "min" else score > worst

    def _prune(self):
        reverse = self.mode == "max"
        self._index.sort(key=lambda e: e["score"], reverse=reverse)
        if self.save_top_k >= 0:
            for entry in self._index[self.save_top_k :]:
                p = self.dir / entry["path"]
                if p.exists():
                    shutil.rmtree(p)
            self._index = self._index[: self.save_top_k]

    # -- restore -----------------------------------------------------------

    def best_path(self) -> Optional[Path]:
        if not self._index:
            return None
        return self.dir / self._index[0]["path"]

    def last_path(self) -> Optional[Path]:
        p = self.dir / "last"
        return p if p.exists() else None

    def restore(self, path: str | Path, target: Any) -> Any:
        """Restore a state pytree shaped like ``target``."""
        path = Path(path)
        if (path / "state").exists():
            path = path / "state"
        return self._ckptr.restore(
            path.resolve(), target=jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        )

    def restore_params_only(self, path: str | Path, target_state: Any) -> Dict[str, Any]:
        """Restore only the optimizer-independent leaves (params, step, and
        ema_params when both sides have them).

        Inference must not depend on the train stage's optimizer chain: a
        config that sets e.g. ``gradient_clip_val`` only under ``train:``
        produces an opt_state whose *structure* differs from the test-stage
        template, and a full-state restore fails on the mismatch.
        """
        path = Path(path)
        if (path / "state").exists():
            path = path / "state"
        item = {"step": target_state.step, "params": target_state.params}
        if getattr(target_state, "ema_params", None) is not None:
            item["ema_params"] = target_state.ema_params
        tmpl = jax.tree.map(ocp.utils.to_shape_dtype_struct, item)
        ptck = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
        try:
            return ptck.restore(
                path.resolve(), args=ocp.args.PyTreeRestore(tmpl, partial_restore=True)
            )
        except ValueError:
            if "ema_params" not in tmpl:
                raise
            # checkpoint trained without EMA but test config enables it:
            # fall back to raw params (callers copy params into ema slots)
            tmpl.pop("ema_params")
            return ptck.restore(
                path.resolve(), args=ocp.args.PyTreeRestore(tmpl, partial_restore=True)
            )

    @staticmethod
    def read_metadata(path: str | Path) -> Dict[str, Any]:
        p = Path(path)
        if p.name == "state":
            p = p.parent
        mp = p / "metadata.json"
        return json.loads(mp.read_text()) if mp.exists() else {}


def apply_state_resets(
    state,
    fresh_state,
    reset_optimizer: bool = False,
    reset_epoch: bool = False,
) -> Any:
    """Selective resume resets (reference ``--reset-optimizer/--reset-epoch``,
    ``runtime.py:156``): swap in freshly-initialized leaves."""
    if reset_optimizer:
        state = state.replace(opt_state=fresh_state.opt_state)
    if reset_epoch:
        state = state.replace(step=fresh_state.step)
    return state


def check_config_hash(metadata: Dict[str, Any], expected_hash: str) -> None:
    got = metadata.get("config_hash")
    if got and got != expected_hash:
        logger.warning(
            "checkpoint config hash %s != current config hash %s "
            "(reference model.py:244-297 warns the same way)",
            got,
            expected_hash,
        )
