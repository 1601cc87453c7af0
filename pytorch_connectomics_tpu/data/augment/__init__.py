from .build import build_augmentation_fn  # noqa: F401
