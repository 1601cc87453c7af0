"""Patch datasets over EM volumes.

Design: a dataset exposes ``sample(rng) -> dict[str, np.ndarray]`` for random
training patches and ``__getitem__`` for deterministic center/grid access.
There are no worker processes — sampling is cheap numpy slicing; heavy target
generation/augmentation runs either in the threaded host pipeline
(``pipeline.py``) or on-device.

Reference surface:
- ``CachedVolumeDataset`` (``data/datasets/dataset_volume_cached.py:75``)
  incl. foreground rejection sampling,
- lazy crop-on-read datasets (``dataset_volume_zarr_lazy.py:36``,
  ``dataset_volume_h5_lazy.py:93``),
- multi-dataset mixing (``dataset_multi.py:22,88,142``),
- crop-position samplers (``crop_sampling.py:35``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from .io import open_zarr, probe_volume, read_volume, split_internal_path
from .preprocess import (
    apply_data_transform,
    downscale_volume,
    normalize_volume,
    pad_to_min_shape,
)


def _as_list(x) -> List[str]:
    if x is None:
        return []
    return list(x) if isinstance(x, (list, tuple)) else [x]


# ---------------------------------------------------------------------------
# crop-position sampling
# ---------------------------------------------------------------------------


def random_crop_origin(
    rng: np.random.Generator, vol_shape: Sequence[int], patch: Sequence[int]
) -> Tuple[int, ...]:
    return tuple(
        int(rng.integers(0, max(1, s - p + 1))) for s, p in zip(vol_shape, patch)
    )


def center_crop_origin(vol_shape: Sequence[int], patch: Sequence[int]) -> Tuple[int, ...]:
    return tuple(max(0, (s - p) // 2) for s, p in zip(vol_shape, patch))


@dataclass
class RejectConfig:
    """Foreground-aware rejection sampling
    (reference ``dataset_volume_cached.py:75`` strategies)."""

    enabled: bool = False
    min_fg_ratio: float = 0.0
    max_attempts: int = 20
    prob: float = 0.95  # probability of rejecting an all-background patch


# ---------------------------------------------------------------------------
# single-volume datasets
# ---------------------------------------------------------------------------


class VolumeDataset:
    """In-RAM cached volume dataset with random/center crop.

    ``images``/``labels`` are lists of path strings (multi-volume supported);
    all volumes are loaded and normalized once.
    """

    def __init__(
        self,
        images: Union[str, List[str]],
        labels: Union[str, List[str], None] = None,
        masks: Union[str, List[str], None] = None,
        patch_size: Sequence[int] = (32, 64, 64),
        normalize: str = "smart",
        reject: Optional[RejectConfig] = None,
        pad_mode: str = "reflect",
        transpose: Optional[Sequence[int]] = None,
        label_dtype=np.float32,
        label_aux: Union[str, List[str], None] = None,
        volume_preprocess=None,
        data_transform=None,
        clip_percentiles=None,
        read_downscale=None,
    ):
        """``volume_preprocess``: optional ``(img, lbl) -> (img, lbl, rec)``
        hook applied after transpose, before normalization (nnU-Net-style
        crop/resample, reference ``data_factory.py`` transform wiring).
        ``data_transform``: optional ``DataTransformConfig`` — paired resize/
        binarize/pad applied to every volume right after transpose (reference
        ``data.data_transform``, ``augmentation/build.py:246-267``).
        ``clip_percentiles``: (low, high) intensity clip before normalization
        (reference ``ImageTransformConfig.clip_percentile_*``).
        ``read_downscale``: integer per-axis stride applied to every volume at
        load (reference ``read_downscale`` guard, ``data_factory.py:84``)."""
        self.patch_size = tuple(int(p) for p in patch_size)
        self.reject = reject or RejectConfig()
        self.label_dtype = label_dtype
        self.images: List[np.ndarray] = []
        self.labels: List[Optional[np.ndarray]] = []
        self.masks: List[Optional[np.ndarray]] = []
        img_paths = _as_list(images)
        lbl_paths = _as_list(labels)
        msk_paths = _as_list(masks)
        aux_paths = _as_list(label_aux)
        self.label_aux: List[Optional[np.ndarray]] = []
        for i, ip in enumerate(img_paths):
            img = read_volume(ip)
            if transpose:
                img = np.transpose(img, transpose)
            if read_downscale:
                img = downscale_volume(img, read_downscale)
            img = apply_data_transform(img, data_transform, is_label=False)
            lbl = None
            if i < len(lbl_paths):
                lbl = read_volume(lbl_paths[i])
                if transpose:
                    lbl = np.transpose(lbl, transpose)
                if read_downscale:
                    lbl = downscale_volume(lbl, read_downscale)
                lbl = apply_data_transform(lbl, data_transform, is_label=True)
            if volume_preprocess is not None:
                # hook owns normalization (nnU-Net zscore etc.)
                img, lbl, _ = volume_preprocess(img, lbl)
            else:
                img = normalize_volume(img, normalize, clip_percentiles=clip_percentiles)
            img, _ = pad_to_min_shape(img, self.patch_size, pad_mode)
            self.images.append(np.ascontiguousarray(img, dtype=np.float32))
            if lbl is not None:
                lbl, _ = pad_to_min_shape(lbl, self.patch_size, "constant")
                self.labels.append(np.ascontiguousarray(lbl))
            else:
                self.labels.append(None)
            if i < len(msk_paths):
                msk = read_volume(msk_paths[i])
                if transpose:
                    msk = np.transpose(msk, transpose)
                if read_downscale:
                    msk = downscale_volume(msk, read_downscale)
                msk = apply_data_transform(msk, data_transform, is_label=True)
                msk, _ = pad_to_min_shape(msk, self.patch_size, "constant")
                self.masks.append(np.ascontiguousarray(msk))
            else:
                self.masks.append(None)
            if i < len(aux_paths):
                aux = read_volume(aux_paths[i]).astype(np.float32)
                if transpose:
                    aux = np.transpose(aux, transpose if aux.ndim == 3 else [0] + [t + 1 for t in transpose])
                # continuous precomputed targets: nearest resize (stays aligned with
                # the label, reference build.py:262) but never binarized
                if read_downscale:
                    aux = downscale_volume(aux, read_downscale)
                aux = apply_data_transform(aux, data_transform, is_label=True, allow_binarize=False)
                aux, _ = pad_to_min_shape(aux, self.patch_size, "constant")
                self.label_aux.append(np.ascontiguousarray(aux))
            else:
                self.label_aux.append(None)
        if not self.images:
            raise ValueError("VolumeDataset requires at least one image volume")
        # volume picked proportionally to voxel count
        sizes = np.array([im.size for im in self.images], dtype=np.float64)
        self._vol_probs = sizes / sizes.sum()

    @property
    def num_volumes(self) -> int:
        return len(self.images)

    def _extract(self, vi: int, origin: Sequence[int]) -> Dict[str, np.ndarray]:
        sl = tuple(slice(o, o + p) for o, p in zip(origin, self.patch_size))
        out: Dict[str, np.ndarray] = {"image": self.images[vi][sl][None]}  # add C
        if self.labels[vi] is not None:
            lbl = self.labels[vi][sl]
            out["label"] = lbl[None] if lbl.ndim == 3 else lbl
        if self.masks[vi] is not None:
            out["mask"] = self.masks[vi][sl][None].astype(np.float32)
        if self.label_aux and self.label_aux[vi] is not None:
            aux = self.label_aux[vi]
            # aux may be (Z,Y,X) or (C,Z,Y,X) precompute volumes
            if aux.ndim == 3:
                out["label_aux"] = aux[sl][None]
            else:
                out["label_aux"] = aux[(slice(None),) + sl]
        return out

    def sample(self, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        vi = int(rng.choice(len(self.images), p=self._vol_probs))
        shape = self.images[vi].shape
        for _ in range(max(1, self.reject.max_attempts)):
            origin = random_crop_origin(rng, shape, self.patch_size)
            if not self.reject.enabled or self.labels[vi] is None:
                return self._extract(vi, origin)
            sl = tuple(slice(o, o + p) for o, p in zip(origin, self.patch_size))
            fg = float((self.labels[vi][sl] > 0).mean())
            if fg > self.reject.min_fg_ratio:
                return self._extract(vi, origin)
            if rng.random() > self.reject.prob:
                return self._extract(vi, origin)
        return self._extract(vi, origin)

    def center(self, vi: int = 0) -> Dict[str, np.ndarray]:
        return self._extract(vi, center_crop_origin(self.images[vi].shape, self.patch_size))

    def full_volume(self, vi: int = 0) -> np.ndarray:
        return self.images[vi]

    def full_label(self, vi: int = 0) -> Optional[np.ndarray]:
        return self.labels[vi]

    @property
    def has_unlabeled(self) -> bool:
        """True when any label volume carries ``-1`` unlabeled voxels —
        gates per-channel -1-aware target masks (pipeline; reference
        ``transforms.py:736``). Cached after the first scan."""
        if not hasattr(self, "_has_unlabeled"):
            self._has_unlabeled = any(
                l is not None and l.dtype.kind in "if" and l.min() < 0
                for l in self.labels
            )
        return self._has_unlabeled


class LazyVolumeDataset:
    """Crop-on-read dataset over HDF5/zarr — volumes never fully loaded
    (reference ``dataset_volume_zarr_lazy.py:36``, ``dataset_volume_h5_lazy.py:93``)."""

    def __init__(
        self,
        images: Union[str, List[str]],
        labels: Union[str, List[str], None] = None,
        patch_size: Sequence[int] = (32, 64, 64),
        normalize: str = "smart",
        reject: Optional[RejectConfig] = None,
    ):
        self.patch_size = tuple(int(p) for p in patch_size)
        self.normalize = normalize
        self.reject = reject or RejectConfig()
        self.image_paths = _as_list(images)
        self.label_paths = _as_list(labels)
        self.shapes = [probe_volume(p)[0] for p in self.image_paths]
        self._handles: Dict[str, Any] = {}

    @property
    def has_unlabeled(self) -> bool:
        """Lazy volumes are never fully read, so gate on the label dtype:
        a signed dtype CAN carry -1 unlabeled voxels, so masks are emitted
        (all-ones for crops without any — harmless, just extra bytes)."""
        if not hasattr(self, "_has_unlabeled"):
            self._has_unlabeled = any(
                probe_volume(p)[1].kind in "if" for p in self.label_paths
            )
        return self._has_unlabeled

    def _read(self, path: str, roi: Tuple[slice, ...]) -> np.ndarray:
        return read_volume(path, roi=roi)

    def sample(self, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        vi = int(rng.integers(0, len(self.image_paths)))
        shape = self.shapes[vi]
        origin = random_crop_origin(rng, shape, self.patch_size)
        sl = tuple(slice(o, o + p) for o, p in zip(origin, self.patch_size))
        img = normalize_volume(self._read(self.image_paths[vi], sl), self.normalize)
        out = {"image": img[None].astype(np.float32)}
        if vi < len(self.label_paths):
            out["label"] = self._read(self.label_paths[vi], sl)[None]
        return out


# ---------------------------------------------------------------------------
# multi-dataset mixing (reference data/datasets/dataset_multi.py)
# ---------------------------------------------------------------------------


class WeightedConcatDataset:
    """Sample from member datasets with explicit probabilities."""

    def __init__(self, datasets: List[Any], weights: Optional[List[float]] = None):
        self.datasets = datasets
        w = np.asarray(weights if weights else [1.0] * len(datasets), dtype=np.float64)
        self.probs = w / w.sum()

    def sample(self, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        di = int(rng.choice(len(self.datasets), p=self.probs))
        return self.datasets[di].sample(rng)

    @property
    def has_unlabeled(self) -> bool:
        return any(getattr(d, "has_unlabeled", False) for d in self.datasets)


class UniformConcatDataset(WeightedConcatDataset):
    def __init__(self, datasets: List[Any]):
        super().__init__(datasets, None)


class StratifiedConcatDataset:
    """Round-robin over member datasets (deterministic stratification)."""

    def __init__(self, datasets: List[Any]):
        self.datasets = datasets
        self._i = 0

    def sample(self, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        d = self.datasets[self._i % len(self.datasets)]
        self._i += 1
        return d.sample(rng)

    @property
    def has_unlabeled(self) -> bool:
        return any(getattr(d, "has_unlabeled", False) for d in self.datasets)


# ---------------------------------------------------------------------------
# 2-D file-list dataset (reference dataset_filename.py:22)
# ---------------------------------------------------------------------------


class FilenameDataset:
    """2-D image/label file pairs (png/jpg/tif), treated as 1-slice volumes."""

    def __init__(self, image_files: List[str], label_files: Optional[List[str]] = None,
                 patch_size: Sequence[int] = (1, 256, 256), normalize: str = "smart"):
        self.image_files = list(image_files)
        self.label_files = list(label_files) if label_files else []
        self.patch_size = tuple(patch_size)
        self.normalize = normalize

    def __len__(self):
        return len(self.image_files)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        img = read_volume(self.image_files[i])
        if img.ndim == 2:
            img = img[None]
        out = {"image": normalize_volume(img, self.normalize)[None]}
        if i < len(self.label_files):
            lbl = read_volume(self.label_files[i])
            if lbl.ndim == 2:
                lbl = lbl[None]
            out["label"] = lbl[None]
        return out

    def sample(self, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        item = self[int(rng.integers(0, len(self)))]
        # random-crop to patch size
        img = item["image"]
        spatial = img.shape[1:]
        origin = random_crop_origin(rng, spatial, self.patch_size)
        sl = (slice(None),) + tuple(slice(o, o + p) for o, p in zip(origin, self.patch_size))
        return {k: v[sl] for k, v in item.items()}
