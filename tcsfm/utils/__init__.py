from tcsfm.utils.helpers import (  # noqa: F401
    disp_to_depth,
    depth_to_disp,
    post_process_disparity,
)
