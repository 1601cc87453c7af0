from .affinity import (  # noqa: F401
    affinity_channel_groups,
    affinity_unlabeled_mask,
    affinity_valid_mask,
    max_offset_pad,
    parse_offsets,
    seg_to_affinity,
)
from .distance import (  # noqa: F401
    erode_instances,
    instance_boundary_mask,
    instance_edt,
    semantic_edt,
    signed_distance,
    skeleton_aware_edt,
)
from .lsd import seg_to_lsd  # noqa: F401
from .misc import (  # noqa: F401
    binary_ratio_weight,
    normalize_labels,
    relabel_connected_components,
    seg_to_binary,
    seg_to_flow,
    seg_to_polarity,
    seg_to_small_object,
    unet3d_weight,
)
from .build import (  # noqa: F401
    available_targets,
    build_target_fn,
    build_target_mask_fn,
    register_target,
)
