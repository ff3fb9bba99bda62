from tcsfm.geom.se3 import (  # noqa: F401
    euler2mat,
    quat2mat,
    pose_vec2mat,
    pose_vec2mat44,
    so3_exp,
    so3_log,
    se3_exp,
    se3_log,
    se3_inv,
    se3_from_matrix,
)
from tcsfm.geom.warp import inverse_warp, inverse_warp2, grid_sample  # noqa: F401
from tcsfm.geom.camera import backproject, project  # noqa: F401
