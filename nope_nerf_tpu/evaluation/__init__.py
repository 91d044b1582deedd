from .eval_images import eval_image  # noqa: F401
from .metrics import (  # noqa: F401
    compute_depth_errors,
    median_scaled_depth_errors,
    mse2psnr,
)
from .pose_opt import init_eval_poses, optimize_eval_poses  # noqa: F401
from .trajectory_errors import (  # noqa: F401
    compute_relative_errors_binned,
    compute_statistics,
    write_stats,
)
