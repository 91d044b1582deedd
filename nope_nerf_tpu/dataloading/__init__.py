from .llff import load_llff_data, recenter_poses, spherify_poses  # noqa: F401
from .scene import SceneData, get_scene  # noqa: F401
