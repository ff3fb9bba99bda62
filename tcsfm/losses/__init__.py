from tcsfm.losses.photometric import (  # noqa: F401
    ssim_loss,
    smooth_loss,
    pose_consistency_loss,
    compute_losses,
    pairwise_loss,
    mean_on_mask,
)
