from .losses import (  # noqa: F401
    depth_loss_dpt,
    depth_loss_l1,
    dist_losses,
    mean_on_mask,
    mse2psnr,
    rgb_full_loss,
    rgb_s_loss,
    total_loss,
)
