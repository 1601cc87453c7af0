from .native import (  # noqa: F401
    affinity_connected_components,
    agglomerate,
    binary_dilation,
    binary_erosion,
    connected_components,
    edt,
    mutex_watershed,
    remap,
    remove_small,
    renumber,
    watershed,
)
