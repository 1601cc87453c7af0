from .stage import compute_test_metrics, run_evaluation_stage  # noqa: F401
from .report import write_metrics_report  # noqa: F401
