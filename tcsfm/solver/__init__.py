from tcsfm.solver.coupled import (  # noqa: F401
    solve_disp,
    solve_pose,
    solve_pose_iteratively,
)
