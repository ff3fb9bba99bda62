from tcsfm.models.depth import DepthNet  # noqa: F401
from tcsfm.models.pose import PoseNet  # noqa: F401
