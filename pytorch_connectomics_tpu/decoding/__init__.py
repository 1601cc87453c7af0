from .registry import get_decoder, list_decoders, register_decoder, run_graph, run_steps  # noqa: F401
from . import decoders  # noqa: F401
from .postprocess import (  # noqa: F401
    add_masks,
    apply_binary_postprocessing,
    apply_postprocessing,
    binarize_and_median,
    cast2dtype,
    cc_instance_filter,
    intersection_over_union,
    merge_masks,
    merge_small_objects,
    remove_large_instances,
    remove_masks,
    remove_small_instances,
    stitch_3d,
    watershed_split,
)
from .qc import QCReport, StreamingQCAccumulator, scan_affinity_quality  # noqa: F401
from .stage import run_decoding_stage  # noqa: F401
from .streamed import streamed_affinity_cc_decode, streamed_waterz_decode  # noqa: F401
from . import branch  # noqa: F401 - registers branch decoders
from .tuning import DecodingTuner, load_best_params, make_decode_objective  # noqa: F401
from ..runtime import abiss_bridge as _abiss_bridge  # noqa: F401 - registers 'abiss'
