"""Trainer: the config-driven training engine.

Replaces PyTorch Lightning (reference ``training/lightning/model.py:74`` +
``trainer.py:38``) with a jitted train loop over a device mesh:
- one XLA program per step (forward+loss+backward+optim+EMA),
- batch sharded over the ``data`` mesh axis (DDP-equivalent, grads psum'd
  over ICI by XLA),
- host-side: threaded data pipeline, NaN detection, checkpoint top-k,
  early stopping, ReduceLROnPlateau scale, JSONL metrics.
"""

from __future__ import annotations

import logging
import math
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.loader import config_hash
from ..config.schema import Config
from ..data.pipeline import build_pipelines
from ..losses.orchestrator import LossOrchestrator
from ..models import build_model, init_model, param_count
from ..parallel.mesh import batch_sharding, make_mesh, replicated, shard_batch
from ..utils.logging import MetricsLogger
from .checkpoint import CheckpointManager, apply_state_resets, check_config_hash
from .optim import build_optimizer
from .state import TrainState, create_train_state, make_train_step, make_val_step

logger = logging.getLogger(__name__)


class NaNError(RuntimeError):
    pass


class Trainer:
    def __init__(self, cfg: Config, run_dir: str | Path = "outputs/run", mesh=None):
        self.cfg = cfg
        self.run_dir = Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self._data_check_logged = False
        if mesh is None:
            from ..parallel.mesh import fit_data_axis_to_batch

            axes = fit_data_axis_to_batch(
                cfg.system.mesh, cfg.data.dataloader.batch_size, jax.device_count()
            )
            mesh = make_mesh(axes)
        elif cfg.data.dataloader.batch_size % mesh.devices.size != 0:
            from ..parallel.mesh import fit_data_axis_to_batch

            axes = fit_data_axis_to_batch(
                cfg.system.mesh, cfg.data.dataloader.batch_size, mesh.devices.size
            )
            mesh = make_mesh(axes)
        self.mesh = mesh
        self.model = build_model(cfg.model)
        if "space" in mesh.axis_names and hasattr(self.model, "act_spec"):
            # anchor activations to (data, space) so GSPMD keeps them
            # distributed instead of replicating at block residuals
            self.model = self.model.clone(act_mesh=mesh, act_spec=("data", "space"))
        from ..data.targets.build import affinity_target_groups

        self.orchestrator = LossOrchestrator(
            cfg.model.loss,
            affinity_groups=affinity_target_groups(cfg.data.label_transform),
        )
        # steps/epoch: explicit n_steps_per_epoch > dataloader.num_samples
        # (reference sample-count math, data/datasets/sampling.py) > default
        n_samples = cfg.data.dataloader.num_samples
        from_samples = (
            max(1, int(n_samples) // max(1, cfg.data.dataloader.batch_size))
            if n_samples else None
        )
        self.steps_per_epoch = cfg.optimization.n_steps_per_epoch or from_samples or 100
        self.tx, self.schedule = build_optimizer(cfg.optimization, self.steps_per_epoch)
        self.cfg_hash = config_hash(cfg)

        rng = jax.random.PRNGKey(cfg.system.seed)
        variables = init_model(self.model, cfg.model, rng)
        params = variables["params"]
        logger.info(
            "model %s: %.2fM params", cfg.model.arch.type, param_count(params) / 1e6
        )
        balancing = cfg.model.loss.balancing.method
        self.state = create_train_state(
            params,
            self.tx,
            ema=cfg.monitor.ema.enabled,
            num_balancer_terms=(self.orchestrator.num_terms if balancing == "uncertainty" else 0),
            gradnorm_terms=(
                self.orchestrator.num_terms
                if balancing in ("gradnorm", "gradnorm_exact")
                else 0
            ),
        )
        # shardings: state replicated, batch split on data axis
        self._state_sharding = jax.tree.map(lambda _: replicated(self.mesh), self.state)
        augment_fn = None
        if cfg.data.augmentation.on_device:
            # geometric device augs run AFTER host target generation, which is
            # only sound for isotropic-per-channel targets (binary/EDT/SDT);
            # affinity/LSD/flow channels change meaning under flips.
            flip_safe = {"binary", "sdt", "instance_edt", "semantic_edt",
                         "skeleton_aware_edt", "instance_boundary", "small_object"}
            targets = {t.name for t in (cfg.data.label_transform.targets or [])}
            if targets and not targets <= flip_safe:
                logger.warning(
                    "on-device augmentation disabled: targets %s are not "
                    "flip-safe after generation", sorted(targets - flip_safe),
                )
            else:
                from ..ops.augment_jax import build_device_augment_fn

                augment_fn = build_device_augment_fn(cfg.data.augmentation)
        from .distill import build_distill_spec

        distill_spec = build_distill_spec(cfg.optimization.distill, cfg.model)
        if distill_spec is not None:
            logger.info(
                "distillation on: teacher=%s alpha=%.2f T=%.1f",
                cfg.optimization.distill.teacher_checkpoint,
                distill_spec.alpha, distill_spec.temperature,
            )
        self._train_step = jax.jit(
            make_train_step(
                self.model.apply,
                self.orchestrator,
                self.tx,
                ema_decay=cfg.monitor.ema.decay if cfg.monitor.ema.enabled else None,
                augment_fn=augment_fn,
                seed=cfg.system.seed,
                balancing=balancing,
                balancing_alpha=cfg.model.loss.balancing.alpha,
                balancing_lr=cfg.model.loss.balancing.lr,
                distill=distill_spec,
            ),
            donate_argnums=(0,),
        )
        self._val_step = jax.jit(
            make_val_step(self.model.apply, self.orchestrator, use_ema=cfg.monitor.ema.use_for_val)
        )
        self.ckpt = CheckpointManager(
            self.run_dir / "checkpoints",
            save_top_k=cfg.monitor.checkpoint.save_top_k,
            monitor=cfg.monitor.checkpoint.monitor,
            mode=cfg.monitor.checkpoint.mode,
            save_last=cfg.monitor.checkpoint.save_last,
            filename_prefix=cfg.monitor.checkpoint.checkpoint_filename,
        )
        if cfg.monitor.detect_anomaly:
            # reference Trainer(detect_anomaly=...): trap the first NaN at its
            # producing op instead of at the loss (slower; debug only)
            jax.config.update("jax_debug_nans", True)
        self.metrics_logger = MetricsLogger(
            self.run_dir,
            cfg.monitor.logging.backend,
            wandb_cfg=cfg.monitor.wandb,
            config={"config_hash": self.cfg_hash},
        )
        self._plateau = cfg.optimization.scheduler.name == "ReduceLROnPlateau"
        self._plateau_best = math.inf
        self._plateau_bad = 0
        self._es_best = math.inf if cfg.monitor.early_stopping.mode == "min" else -math.inf
        self._es_bad = 0

    # -- checkpoint resume -------------------------------------------------

    def restore(
        self,
        path: str | Path,
        reset_optimizer: bool = False,
        reset_epoch: bool = False,
        params_only: bool = False,
    ) -> None:
        fresh = self.state
        meta = CheckpointManager.read_metadata(path)
        check_config_hash(meta, self.cfg_hash)
        if params_only:
            # inference restore: skip opt_state entirely — its structure
            # depends on the train-stage optimizer config, which test/tune
            # stages don't (and shouldn't) reproduce
            got = self.ckpt.restore_params_only(path, fresh)
            self.state = fresh.replace(
                step=got["step"],
                params=got["params"],
                ema_params=got.get(
                    "ema_params",
                    got["params"]["model"] if fresh.ema_params is not None else None,
                ),
            )
        else:
            restored = self.ckpt.restore(path, fresh)
            self.state = apply_state_resets(restored, fresh, reset_optimizer, reset_epoch)
        logger.info("restored checkpoint from %s (step %s)", path, int(self.state.step))

    # -- training ----------------------------------------------------------

    def fit(self, max_epochs: Optional[int] = None) -> Dict[str, float]:
        cfg = self.cfg
        max_epochs = max_epochs or cfg.optimization.max_epochs
        max_steps = cfg.optimization.max_steps
        if max_steps:
            # step-based training (reference trainer.py:258-271): max_steps
            # bounds the run; epochs become bookkeeping units
            max_epochs = max(
                max_epochs, -(-int(max_steps) // self.steps_per_epoch)
            )
        train_pipe, val_pipe = build_pipelines(cfg)
        scalar_every = int((cfg.monitor.logging.scalar or {}).get("loss_every_n_steps", 50))
        b_shard = batch_sharding(self.mesh)
        start_step = int(self.state.step)
        start_epoch = start_step // self.steps_per_epoch
        epoch_metrics: Dict[str, float] = {}
        it = train_pipe.iterate(start_step)
        last_t = time.time()
        # jax.profiler capture window (reference profiling analog; TPU-native
        # trace viewable in TensorBoard/Perfetto)
        prof = cfg.monitor.profile_steps
        prof_active = False
        for epoch in range(start_epoch, max_epochs):
            losses = []
            for _ in range(self.steps_per_epoch):
                if max_steps and int(self.state.step) >= int(max_steps):
                    break
                batch = next(it)
                batch = shard_batch(batch, self.mesh)
                if prof and not prof_active and int(self.state.step) >= prof[0]:
                    jax.profiler.start_trace(str(self.run_dir / "profile"))
                    prof_active = True
                self.state, logs = self._train_step(self.state, batch)
                step = int(self.state.step)
                if prof_active and step >= prof[1]:
                    jax.block_until_ready(logs)
                    jax.profiler.stop_trace()
                    prof_active = False
                    prof = None
                    logger.info("profiler trace written to %s", self.run_dir / "profile")
                vci = cfg.optimization.val_check_interval
                if vci and val_pipe is not None:
                    # mid-epoch validation (reference val_check_interval):
                    # int = every N steps, float = fraction of an epoch
                    ivl = int(vci) if vci >= 1 else max(1, round(float(vci) * self.steps_per_epoch))
                    if step % ivl == 0:
                        mid_logs = self.validate(val_pipe)
                        self._plateau_update(mid_logs.get("val_loss", float("nan")))
                ckpt_every = self.cfg.monitor.checkpoint.every_n_steps
                if ckpt_every and step % int(ckpt_every) == 0:
                    # step-interval checkpoint (reference ModelCheckpoint
                    # every_n_train_steps, trainer.py:97): refreshes "last"
                    # mid-epoch so long epochs are resumable
                    self.ckpt.save(
                        self.state, epoch, {},
                        metadata={"config_hash": self.cfg_hash, "step": step},
                    )
                if step % scalar_every == 0 or step == 1:
                    host_logs = {k: float(v) for k, v in logs.items()}
                    self._check_finite(host_logs, step)
                    now = time.time()
                    host_logs["steps_per_sec"] = scalar_every / max(1e-6, now - last_t)
                    host_logs["lr"] = float(self.schedule(step)) * float(self.state.lr_scale)
                    last_t = now
                    self.metrics_logger.log(step, host_logs, prefix="train_")
                    logger.info(
                        "epoch %d step %d loss %.4f (%.2f it/s)",
                        epoch, step, host_logs.get("loss_total", float("nan")),
                        host_logs["steps_per_sec"],
                    )
                    losses.append(host_logs.get("loss_total", float("nan")))
                else:
                    losses.append(None)
            # epoch end: compute epoch loss from logged values
            logged = [l for l in losses if l is not None]
            epoch_loss = float(np.mean(logged)) if logged else float("nan")
            epoch_metrics = {"train_loss_total_epoch": epoch_loss, "epoch": epoch}

            if val_pipe is not None and (epoch + 1) % cfg.optimization.check_val_every_n_epoch == 0:
                val_logs = self.validate(val_pipe)
                epoch_metrics.update(val_logs)
                self._plateau_update(val_logs.get("val_loss", epoch_loss))
                if self._early_stop_update(val_logs):
                    logger.info("early stopping at epoch %d", epoch)
                    self._save_epoch(epoch, epoch_metrics)
                    break
            self.metrics_logger.log(int(self.state.step), epoch_metrics)
            self._save_epoch(epoch, epoch_metrics)
            self._maybe_visualize(epoch, val_pipe or train_pipe)
            if max_steps and int(self.state.step) >= int(max_steps):
                logger.info("max_steps %d reached", int(max_steps))
                break
        return epoch_metrics

    def _maybe_visualize(self, epoch: int, pipe) -> None:
        """Per-head slice-grid dumps every N epochs, with affinity-aware
        masking/cropping, channel selection, and a one-time first-batch data
        check (reference ``VisualizationCallback``, ``callbacks.py:167-520``;
        grids logged through MetricsLogger to TB/W&B when enabled)."""
        images_cfg = self.cfg.monitor.logging.images or {}
        every = int(images_cfg.get("log_every_n_epochs", 0))
        if not every or (epoch + 1) % every != 0 or pipe is None:
            return
        try:
            from .visualizer import data_check_grids, save_visualization

            batch = pipe.make_batch(20_000_000 + epoch)
            out = self.model.apply(
                {"params": self.state.params["model"]},
                jax.device_put(batch["image"]),
                train=False,
            )
            out = jax.device_get(out)
            # affinity channel groups from the label-transform config (spans
            # + parsed offsets + storage mode, defaults included): grids mask
            # exactly the affinity channels, like the training loss does
            from ..data.targets.build import affinity_target_groups

            aff_groups = affinity_target_groups(self.cfg.data.label_transform)
            if not self._data_check_logged:
                self._data_check_logged = True
                from PIL import Image

                dc_dir = Path(self.run_dir) / "visualizations"
                dc_dir.mkdir(parents=True, exist_ok=True)
                for tag, grid in data_check_grids(batch).items():
                    Image.fromarray(grid).save(
                        dc_dir / f"{tag.replace('/', '_')}.png"
                    )
                    self.metrics_logger.log_image(0, tag, grid)
            save_visualization(
                self.run_dir, int(self.state.step), batch, out,
                num_slices=int(images_cfg.get("num_slices", 2)),
                max_images=int(images_cfg.get("max_images", 4)),
                metrics_logger=self.metrics_logger,
                head=images_cfg.get("head", "all"),
                channel_mode=str(images_cfg.get("channel_mode", "all")),
                selected_channels=images_cfg.get("selected_channels"),
                max_channels=int(images_cfg.get("max_channels", 8)),
                slice_sampling=str(images_cfg.get("slice_sampling", "uniform")),
                affinity_offsets=aff_groups,
            )
        except Exception as e:  # visualization must never kill training
            logger.warning("visualization failed: %s", e)

    def _save_epoch(self, epoch: int, metrics: Dict[str, float]):
        self.ckpt.save(
            self.state,
            epoch,
            metrics,
            metadata={"config_hash": self.cfg_hash, "step": int(self.state.step)},
        )

    def validate(self, val_pipe, num_batches: Optional[int] = None) -> Dict[str, float]:
        cfg = self.cfg
        n = num_batches or int(cfg.optimization.limit_val_batches or 4)
        agg: Dict[str, list] = {}
        # deterministic per-epoch val sampling (reference ValidationReseeding)
        for i in range(n):
            batch = val_pipe.make_batch(10_000_000 + i)
            batch = shard_batch(batch, self.mesh)
            logs = self._val_step(self.state, batch)
            for k, v in logs.items():
                agg.setdefault(k, []).append(float(v))
        out = {k: float(np.mean(v)) for k, v in agg.items()}
        self.metrics_logger.log(int(self.state.step), out)
        logger.info("validation: %s", {k: round(v, 4) for k, v in out.items()})
        return out

    # -- host-side control logic -------------------------------------------

    def _check_finite(self, logs: Dict[str, float], step: int):
        """NaN/Inf guard (reference ``NaNDetectionCallback``,
        ``callbacks.py:522-712``)."""
        if not self.cfg.monitor.nan_detection:
            return
        bad = {k: v for k, v in logs.items() if not math.isfinite(v)}
        if bad:
            dump = self.run_dir / f"nan_diagnostics_step{step}.txt"
            lines = [f"step {step}: non-finite {bad}"]
            for path, leaf in jax.tree_util.tree_flatten_with_path(self.state.params)[0]:
                arr = np.asarray(leaf)
                if not np.isfinite(arr).all():
                    lines.append(f"param {jax.tree_util.keystr(path)}: non-finite")
            dump.write_text("\n".join(lines))
            raise NaNError(f"non-finite loss at step {step}: {bad} (diagnostics: {dump})")

    def _plateau_update(self, metric: float):
        if not self._plateau:
            return
        s = self.cfg.optimization.scheduler
        if metric < self._plateau_best - 1e-8:
            self._plateau_best = metric
            self._plateau_bad = 0
        else:
            self._plateau_bad += 1
            if self._plateau_bad > s.patience:
                self.state = self.state.replace(
                    lr_scale=self.state.lr_scale * s.factor
                )
                self._plateau_bad = 0
                logger.info("plateau: lr_scale -> %.2e", float(self.state.lr_scale))

    def _early_stop_update(self, val_logs: Dict[str, float]) -> bool:
        es = self.cfg.monitor.early_stopping
        if not es.enabled:
            return False
        metric = val_logs.get(es.monitor)
        if metric is None:
            return False
        if es.check_finite and not math.isfinite(metric):
            return True
        better = (
            metric < self._es_best - es.min_delta
            if es.mode == "min"
            else metric > self._es_best + es.min_delta
        )
        if better:
            self._es_best = metric
            self._es_bad = 0
            return False
        self._es_bad += 1
        return self._es_bad >= es.patience

    @property
    def inference_params(self):
        """EMA params when enabled, else raw model params."""
        if self.state.ema_params is not None and self.cfg.monitor.ema.use_for_val:
            return self.state.ema_params
        return self.state.params["model"]
