from .cli import build_parser, parse_args, setup_config  # noqa: F401
from .dispatch import dispatch_runtime, setup_runtime_directories  # noqa: F401
from .output_naming import (  # noqa: F401
    cache_candidates,
    decoded_filename,
    prediction_filename,
    prediction_tag,
    volume_name_from_path,
)
from .sharding import (  # noqa: F401
    ShardPlan,
    assign_volumes_to_ranks,
    detect_rank_world,
    effective_devices_for_volumes,
    is_chunked_raw_inference,
    plan_test_sharding,
    shard_paths,
)
from .test_pipeline import run_test_pipeline  # noqa: F401
from .tune_runner import apply_best_params, run_tuning  # noqa: F401
