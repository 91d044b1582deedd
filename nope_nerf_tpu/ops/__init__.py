from .chamfer import chamfer_loss, nearest_idx  # noqa: F401
from .encoding import encode_position  # noqa: F401
from .interp import grid_sample, resize_bilinear, resize_nearest  # noqa: F401
from .rendering import composite, render_image, render_rays  # noqa: F401
from .ssim import ssim, ssim_loss_map  # noqa: F401
