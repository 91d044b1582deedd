from .distortion import distortion_scale_shift, init_distortion_params  # noqa: F401
from .intrinsics import focal_fxfy, init_focal_params  # noqa: F401
from .nerf import apply_nerf, init_nerf_params, nerf_gradient  # noqa: F401
from .pose import all_poses, init_pose_params, pose_c2w  # noqa: F401
