"""Host data pipeline: config -> batched train/val iterators.

Replaces the reference's torch DataLoader + worker processes
(``training/lightning/data_factory.py:351``) with a threaded prefetch
pipeline: numpy crop -> augment -> target-gen in a small thread pool, batches
assembled NDHWC and handed to the training loop for ``device_put`` with the
mesh sharding. Determinism: each step's sample draws from a
``np.random.Generator`` seeded by ``(seed, step, slot)``.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterator, List, Optional

import numpy as np

from ..config.schema import Config, DatasetSplitConfig
from .augment import build_augmentation_fn
from .datasets import (
    LazyVolumeDataset,
    RejectConfig,
    VolumeDataset,
)
from .split import split_volume
from .targets import build_target_fn
from .targets.build import build_target_mask_fn


def _reject_from_cfg(block) -> Optional[RejectConfig]:
    if not block:
        return None
    return RejectConfig(
        enabled=bool(block.get("enabled", True)),
        min_fg_ratio=float(block.get("min_fg_ratio", 0.0)),
        max_attempts=int(block.get("max_attempts", 20)),
        prob=float(block.get("prob", 0.95)),
    )


def _with_internal_path(paths, internal: Optional[str]):
    """Append an ``::dataset`` internal path (reference
    ``image_internal_path``/``label_internal_path``) to h5/zarr paths that
    don't already carry one."""
    if not paths or not internal:
        return paths
    def one(p: str) -> str:
        return p if "::" in p or "://" in p else f"{p}::{internal}"
    return one(paths) if isinstance(paths, str) else [one(p) for p in paths]


def build_dataset(cfg: Config, split_cfg: DatasetSplitConfig, train: bool = True):
    dl = cfg.data.dataloader
    images = _with_internal_path(split_cfg.image, split_cfg.image_internal_path)
    labels = _with_internal_path(split_cfg.label, split_cfg.label_internal_path)
    patch = tuple(dl.patch_size)
    if dl.target_context:
        # read patch + context so long-range affinity edges at patch borders
        # see real data; the pipeline crops back after target generation
        # (reference data_factory target_context, banis configs)
        patch = tuple(p + 2 * int(c) for p, c in zip(patch, dl.target_context))
    use_cache = dl.use_preloaded_cache_train if train else dl.use_preloaded_cache_val
    reject = _reject_from_cfg(dl.reject_sampling)
    # nnU-Net-style crop/resample/normalize at volume load (reference
    # data_factory.py / augmentation/build.py:161 transform wiring)
    from .nnunet_preprocess import preprocess_fn_from_config

    nn_pre = preprocess_fn_from_config(
        cfg.data.nnunet_preprocessing, split_resolution=split_cfg.resolution
    )
    if dl.use_lazy_zarr or not use_cache:
        if nn_pre is not None:
            raise ValueError(
                "data.nnunet_preprocessing requires the cached (in-RAM) dataset; "
                "disable use_lazy_zarr / enable the preloaded cache"
            )
        return LazyVolumeDataset(
            images, labels, patch,
            normalize=cfg.data.preprocessing.normalize, reject=reject,
        )
    if nn_pre is not None and (split_cfg.mask or split_cfg.label_aux):
        raise ValueError(
            "data.nnunet_preprocessing does not support mask/label_aux volumes "
            "(crop/resample would misalign them)"
        )
    return VolumeDataset(
        images,
        labels,
        split_cfg.mask,
        patch_size=patch,
        normalize=cfg.data.preprocessing.normalize,
        reject=reject,
        transpose=split_cfg.transpose,
        label_aux=split_cfg.label_aux,
        volume_preprocess=nn_pre,
        data_transform=cfg.data.data_transform,
        clip_percentiles=cfg.data.preprocessing.clip_percentiles,
        read_downscale=cfg.data.preprocessing.read_downscale,
    )


def make_train_val_datasets(cfg: Config):
    """Build train/val datasets, applying the axis-range split when val paths
    are absent (reference ``data/datasets/split.py`` behavior)."""
    train_ds = build_dataset(cfg, cfg.data.train, train=True)
    if cfg.data.val.image:
        val_ds = build_dataset(cfg, cfg.data.val, train=False)
    elif cfg.data.split.enabled and isinstance(train_ds, VolumeDataset):
        s = cfg.data.split
        imgs, lbls = [], []
        v_imgs, v_lbls = [], []
        for i in range(train_ds.num_volumes):
            t_im, v_im = split_volume(train_ds.images[i], s.axis, s.train_range, s.val_range)
            imgs.append(t_im)
            v_imgs.append(v_im)
            if train_ds.labels[i] is not None:
                t_lb, v_lb = split_volume(train_ds.labels[i], s.axis, s.train_range, s.val_range)
                lbls.append(t_lb)
                v_lbls.append(v_lb)
        train_ds.images, train_ds.labels = imgs, lbls or [None] * len(imgs)
        import copy

        val_ds = copy.copy(train_ds)
        val_ds.images, val_ds.labels = v_imgs, v_lbls or [None] * len(v_imgs)
    else:
        val_ds = None
    return train_ds, val_ds


class PatchPipeline:
    """Assembles batches: sample -> augment -> target-gen -> NDHWC stack."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        seed: int = 0,
        augment_cfg=None,
        target_cfg=None,
        num_threads: int = 4,
        prefetch: int = 2,
        train: bool = True,
        process_index: int = 0,
        process_count: int = 1,
        target_context=None,
        emit_target_mask: Optional[bool] = None,
    ):
        """``batch_size`` is the GLOBAL batch. In a multi-host run each
        process assembles only its slice of slots; sample RNG is keyed by the
        global slot index, so the union across processes is bit-identical to
        the single-process batch."""
        self.dataset = dataset
        self.batch_size = int(batch_size)
        if self.batch_size % max(1, process_count) != 0:
            raise ValueError(
                f"batch_size {batch_size} not divisible by process_count {process_count}"
            )
        self.process_index = int(process_index)
        self.process_count = max(1, int(process_count))
        self.local_batch_size = self.batch_size // self.process_count
        self.seed = seed
        self.train = train
        self.augment = build_augmentation_fn(
            augment_cfg if train else None,
            sample_other=lambda rng: self.dataset.sample(rng),
        )
        self.target_fn = build_target_fn(target_cfg)
        # -1-aware per-channel validity masks (reference transforms.py:736):
        # emitted only when the DATASET carries unlabeled voxels, so the
        # decision is batch-consistent (collate needs uniform keys) and
        # fully-labeled runs pay no extra mask traffic
        self.emit_target_mask = bool(
            emit_target_mask
            if emit_target_mask is not None
            else getattr(dataset, "has_unlabeled", False)
        )
        self.target_mask_fn = (
            build_target_mask_fn(target_cfg) if self.emit_target_mask else None
        )
        self.target_context = tuple(int(c) for c in (target_context or ()))
        self.num_threads = max(1, num_threads)
        self.prefetch = prefetch

    def _make_sample(self, step: int, slot: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, 0 if self.train else 1, step, slot])
        )
        s = self.dataset.sample(rng)
        if self.augment is not None:
            s = self.augment(s, rng)
        tm = None
        raw_seg = None
        if self.target_fn is not None and "label" in s:
            raw_seg = s["label"]
            s["label"] = self.target_fn(raw_seg)
            if self.target_mask_fn is not None:
                tm = self.target_mask_fn(raw_seg)
        # precomputed auxiliary targets (e.g. skeleton-aware SDT volumes,
        # reference data_factory.py:113-218) append as extra label channels
        if "label_aux" in s and "label" in s:
            aux = s.pop("label_aux")
            s["label"] = np.concatenate([s["label"], aux], axis=0)
            if tm is not None:
                # aux targets are label-derived, so unlabeled (-1) voxels are
                # invalid there too — extend the per-channel validity mask
                # over the aux span so its channel layout tracks the FINAL
                # label layout (loss terms may slice into the aux channels)
                seg = raw_seg[0] if raw_seg.ndim == 4 else raw_seg
                labeled = (seg != -1).astype(np.float32)
                tm = np.concatenate(
                    [tm, np.broadcast_to(labeled[None], (aux.shape[0],) + labeled.shape)],
                    axis=0,
                )
        if tm is not None:
            # file masks are (1,Z,Y,X); broadcast-multiply keeps both
            s["mask"] = s["mask"] * tm if "mask" in s else tm
        if any(self.target_context):
            # crop the context margin back off every array (targets computed
            # with valid long-range neighborhoods at the patch border)
            cz, cy, cx = self.target_context
            sl = (slice(None), slice(cz, -cz or None), slice(cy, -cy or None), slice(cx, -cx or None))
            s = {k: v[sl] for k, v in s.items()}
        return s

    def make_batch(self, step: int) -> Dict[str, np.ndarray]:
        """This process's slice of the global batch (all of it when
        single-process); slots are global indices."""
        lo = self.process_index * self.local_batch_size
        samples = [
            self._make_sample(step, lo + i) for i in range(self.local_batch_size)
        ]
        return self.collate(samples)

    @staticmethod
    def collate(samples: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
        """Stack and convert (C,Z,Y,X) -> (N,Z,Y,X,C)."""
        out: Dict[str, np.ndarray] = {}
        for k in samples[0]:
            arr = np.stack([s[k] for s in samples])  # (N,C,Z,Y,X)
            out[k] = np.ascontiguousarray(np.moveaxis(arr, 1, -1)).astype(np.float32)
        return out

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        return self.iterate()

    def iterate(self, start_step: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        """Threaded prefetch iterator: batches for steps start_step, ..."""
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            step = start_step
            while not stop.is_set():
                try:
                    batch = self.make_batch(step)
                except Exception as e:  # surfaces in consumer
                    q.put(e)
                    return
                q.put(batch)
                step += 1

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


def build_pipelines(cfg: Config, process_index: Optional[int] = None, process_count: Optional[int] = None):
    """Config -> (train PatchPipeline, val PatchPipeline | None).

    In a multi-host run each process builds its slice of the global batch
    (reference analog: DistributedSampler in ``data_factory.py``)."""
    if process_index is None or process_count is None:
        from ..parallel.distributed import process_info

        process_index, process_count = process_info()
    train_ds, val_ds = make_train_val_datasets(cfg)
    dl = cfg.data.dataloader
    # when augmentation runs on-device inside the train step, the host
    # pipeline skips it (ops/augment_jax.py)
    host_aug = None if cfg.data.augmentation.on_device else cfg.data.augmentation
    train_pipe = PatchPipeline(
        train_ds,
        dl.batch_size,
        seed=cfg.system.seed,
        augment_cfg=host_aug,
        target_cfg=cfg.data.label_transform,
        num_threads=cfg.system.num_workers,
        prefetch=dl.prefetch,
        train=True,
        process_index=process_index,
        process_count=process_count,
        target_context=dl.target_context,
    )
    val_pipe = None
    if val_ds is not None:
        val_pipe = PatchPipeline(
            val_ds,
            dl.val_batch_size or dl.batch_size,
            seed=cfg.system.seed,
            augment_cfg=None,
            target_cfg=cfg.data.label_transform,
            num_threads=1,
            prefetch=1,
            train=False,
            process_index=process_index,
            process_count=process_count,
            target_context=dl.target_context,
        )
    return train_pipe, val_pipe
