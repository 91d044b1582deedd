from . import align, rays, so3, trajectory  # noqa: F401
