from tcsfm.eval.trajectory import (  # noqa: F401
    integrate_trajectory,
    compute_trajectory,
    mean_err,
    segment_errors,
    TrajectoryMetrics,
)
from tcsfm.eval.depth_metrics import compute_depth_errors  # noqa: F401
from tcsfm.eval.scale_recovery import scale_recovery  # noqa: F401
