from tcsfm.ops.warp_mxu import grid_sample_mxu  # noqa: F401
