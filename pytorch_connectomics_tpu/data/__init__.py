from .io import (  # noqa: F401
    open_zarr,
    probe_volume,
    read_volume,
    save_volume,
    synthetic_volume,
)
from .datasets import (  # noqa: F401
    FilenameDataset,
    LazyVolumeDataset,
    RejectConfig,
    StratifiedConcatDataset,
    UniformConcatDataset,
    VolumeDataset,
    WeightedConcatDataset,
)
from .preprocess import normalize_volume, pad_to_min_shape  # noqa: F401
from .split import split_volume  # noqa: F401
