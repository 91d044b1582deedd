"""Device-mesh parallelism: rays sharded over ICI, params replicated.

The reference has no multi-device story at all (SURVEY.md §2.5); the natural
parallel axis of this workload is *rays* — embarrassingly parallel through
ray-gen -> MLP -> compositing, with only scalar loss reductions crossing
devices.  The TPU design follows the standard JAX recipe:

1. a 1-D mesh over the chips of a slice (`('rays',)`),
2. ``with_sharding_constraint`` annotations on the per-ray and per-point
   tensors inside the fused train step (see trainer.compute_loss),
3. XLA GSPMD propagates the sharding through pos-enc/MLP/compositing and
   inserts the psum for the loss/grad reductions over ICI.

Params (~1.2 M floats) are replicated — data-parallel rays is the only
sensible sharding at this model size.  Cross-host DCN meshes are an
extension point: nothing below assumes single-host except `jax.devices()`.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"


def make_ray_mesh(n_devices: int | None = None,
                  axis_name: str = RAY_AXIS,
                  allow_virtual_cpu: bool = True) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (axis name from
    ``tpu.mesh_axis``, default 'rays').

    ``allow_virtual_cpu=False`` (production training) errors instead of
    silently substituting the virtual-CPU devices that test tooling creates
    via ``xla_force_host_platform_device_count`` — a leaked test flag must
    not make a real run execute ~100x slower on host CPUs.
    """
    try:
        devs = jax.devices()
    except Exception:
        # default backend unusable (e.g. broken TPU client): CPU fallback
        devs = jax.devices("cpu")
    if n_devices is not None:
        if len(devs) < n_devices:
            # fall back to the virtual CPU devices
            # (xla_force_host_platform_device_count) when the default
            # backend is a single real chip — test/dryrun tooling only
            try:
                cpu_devs = jax.devices("cpu")
            except RuntimeError:
                cpu_devs = []
            if allow_virtual_cpu and len(cpu_devs) >= n_devices:
                devs = cpu_devs
            else:
                raise ValueError(
                    f"need {n_devices} devices, have {len(devs)} "
                    f"({devs[0].platform}); for CPU-mesh testing set "
                    "XLA_FLAGS=--xla_force_host_platform_device_count=N "
                    "and allow_virtual_cpu=True"
                )
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray/point) axis."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_rays(x, mesh: Mesh | None):
    """Annotate the leading axis as ray-sharded (no-op without a mesh)."""
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(x, ray_sharding(mesh))


def shard_train_step(cfg, render_cfg, init_c2w, mesh: Mesh):
    """The full fused train step, ray-sharded over ``mesh``.

    Same signature as trainer.make_train_step's returned fn.  Parameters and
    optimiser state are replicated; the per-step ray batch and the pair-loss
    point clouds are sharded on their leading axis; gradients come out
    replicated (XLA inserts the ICI all-reduce).
    """
    from ..training.trainer import make_train_step

    return make_train_step(cfg, render_cfg, init_c2w, mesh=mesh)
