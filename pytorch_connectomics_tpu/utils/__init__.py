from .slicing import parse_slice, slice_channels, slice_length  # noqa: F401
