"""nope_nerf_tpu — TPU-native NoPe-NeRF framework (JAX/XLA/Pallas).

A from-scratch re-design of ActiveVisionLab/nope-nerf for TPU: joint
optimisation of a NeRF field, SE(3) camera poses, focal lengths and
monocular-depth distortion parameters from an unposed RGB sequence.
"""
import os as _os

__version__ = "0.1.0"


def _enable_compile_cache():
    """Persistent XLA compilation cache: warm restarts skip recompiles.

    Set NNT_COMPILE_CACHE=0 to disable, or NNT_COMPILE_CACHE=<dir> to move it.
    """
    flag = _os.environ.get("NNT_COMPILE_CACHE", "1")
    if flag == "0":
        return
    cache_dir = flag if flag not in ("1",) else _os.path.expanduser(
        "~/.cache/nope_nerf_tpu/xla_cache"
    )
    try:
        import jax

        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


_enable_compile_cache()

from .config import load_config  # noqa: E402,F401
