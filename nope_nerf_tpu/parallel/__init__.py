from .mesh import (  # noqa: F401
    RAY_AXIS,
    make_ray_mesh,
    ray_sharding,
    replicated,
    shard_rays,
    shard_train_step,
)
