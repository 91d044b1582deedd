"""Two-level YAML config system.

Mirrors the reference's config surface (`dataloading/configloading.py:3-47`):
a scene YAML is recursively merged over ``configs/default.yaml`` so the
reference's per-scene config files work unmodified.
"""
from __future__ import annotations

import os

import yaml

_PKG_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_CONFIG = os.path.join(_PKG_DIR, "configs", "default.yaml")


def load_config(path: str, default_path: str | None = None) -> dict:
    """Load a scene config merged over the defaults.

    Args:
        path: scene config YAML.
        default_path: defaults YAML; falls back to the packaged
            ``configs/default.yaml`` when None.
    """
    with open(path, "r") as f:
        cfg_special = yaml.safe_load(f) or {}

    if default_path is None:
        default_path = DEFAULT_CONFIG
    if default_path and os.path.exists(default_path):
        with open(default_path, "r") as f:
            cfg = yaml.safe_load(f) or {}
    else:
        cfg = {}

    update_recursive(cfg, cfg_special)
    return cfg


def update_recursive(dict1: dict, dict2: dict) -> None:
    """Recursively merge ``dict2`` into ``dict1`` (in place).

    Same semantics as reference `dataloading/configloading.py:33-46`.
    """
    for k, v in dict2.items():
        if k not in dict1:
            dict1[k] = dict()
        if isinstance(v, dict):
            update_recursive(dict1[k], v)
        else:
            dict1[k] = v


# The individually-set flags that tpu.parity: True expands to — ONE knob
# producing the most reference-faithful trajectory for A/B debugging. The
# defaults quietly trade four small reproducibility deviations for speed
# (documented in PARITY.md): with-replacement ray sampling vs randperm
# (`model/training.py:257`), bf16/Pallas MLP numerics, the pipelined
# metrics sync seeing each epoch's PSNR one epoch late (`train.py:297-344`'s
# plateau detector is eager in the reference), and the banded chamfer NN
# (chamfer_mode auto resolves to band on the training clouds; <=1.2%
# one-sided argmin deviation, quality-gated — PARITY.md "Banded chamfer").
PARITY_PROFILE = {
    "fast_ray_sampling": False,   # exact randperm[:n] sampling semantics
    "chamfer_mode": "exact",      # reference dense-argmin nearest neighbours
    "eager_metrics": True,        # plateau detector sees epoch e at epoch e
    "mlp_bf16": False,            # f32 XLA MLP numerics
    "use_pallas_mlp": False,
}


# stock configs/default.yaml values for the profile keys: a cfg carrying one
# of these is indistinguishable from "user never touched it", so overriding
# it is silent; any OTHER conflicting value must have been set on purpose
_PARITY_STOCK = {"fast_ray_sampling": True, "chamfer_mode": "auto"}


def apply_parity_profile(cfg) -> dict:
    """Expand ``tpu.parity: True`` into :data:`PARITY_PROFILE` (in place).

    The profile OVERRIDES conflicting keys — the point of the knob is a
    single switch guaranteed to mean "reference semantics", not a suggestion
    other flags can silently defeat — warning when the overridden value was
    clearly set on purpose (differs from the stock default).
    """
    tpu = cfg.setdefault("tpu", {})
    if not tpu.get("parity", False):
        return cfg
    import warnings

    for k, v in PARITY_PROFILE.items():
        if k in tpu and tpu[k] != v and tpu[k] != _PARITY_STOCK.get(k, v):
            warnings.warn(
                f"tpu.parity overrides explicit tpu.{k}={tpu[k]!r} -> {v!r}",
                stacklevel=2,
            )
        tpu[k] = v
    return cfg


def check_supported(cfg) -> None:
    """Reject configurations the reference itself cannot run.

    The reference exits on ``model.network_type != 'official'``
    (`evaluation/eval.py:42-46`, `vis/render.py:34-38`), crashes with an
    UnboundLocalError on ``training.match_method != 'dense'``
    (`model/losses.py:116-121`) and crashes with an AttributeError on
    ``training.validate_every > 0`` (`train.py:243` calls a
    ``trainer.evaluate`` that does not exist). Raise clear errors / warn
    instead of silently ignoring the keys.
    """
    import warnings

    nt = (cfg.get("model", {}) or {}).get("network_type", "official")
    if nt != "official":
        raise ValueError(
            f"model.network_type={nt!r}: only 'official' exists (the "
            "reference exits on anything else)"
        )
    tr = cfg.get("training", {}) or {}
    mm = tr.get("match_method", "dense")
    if mm != "dense":
        raise ValueError(
            f"training.match_method={mm!r}: only 'dense' exists (the "
            "reference crashes on anything else)"
        )
    if (tr.get("validate_every") or 0) > 0:
        warnings.warn(
            "training.validate_every > 0 is ignored: the reference's "
            "validation branch is non-functional (train.py:243 calls a "
            "method that does not exist); use eval_img_every / "
            "eval_pose_every instead",
            stacklevel=2,
        )
    tpu = cfg.get("tpu", {}) or {}
    mp = tpu.get("matmul_precision", "default")
    if mp not in ("default", "high", "highest"):
        raise ValueError(
            f"tpu.matmul_precision={mp!r}: must be 'default', 'high' or "
            "'highest' (lowercase)"
        )
    if mp != "default":
        # make_render_cfg defaults mlp_bf16 / use_pallas_mlp to True on TPU
        # (trainer.py), where matmul_precision then has no effect. Decide the
        # warning from the config alone — querying jax.default_backend() here
        # would initialize the backend as a side effect of config VALIDATION,
        # which can hang the whole CLI on a broken TPU session (the
        # relay-outage mode documented in PARITY.md).
        if (tpu.get("mlp_bf16", None) is not False
                or tpu.get("use_pallas_mlp", None) is not False):
            warnings.warn(
                "tpu.matmul_precision only affects the f32 XLA MLP path; "
                "on TPU the MLP defaults to bf16 + Pallas where it has no "
                "effect — set tpu.mlp_bf16: False and tpu.use_pallas_mlp: "
                "False explicitly for it to take effect",
                stacklevel=2,
            )
    cm = tpu.get("chamfer_mode", "exact")
    if cm not in ("exact", "band", "grid", "auto"):
        raise ValueError(
            f"tpu.chamfer_mode={cm!r}: must be 'exact' (reference argmin "
            "semantics), 'band' (projection-guided banded NN — fastest on "
            "the training clouds, <=2% argmin deviation), 'grid' "
            "(approximate Morton-window NN) or 'auto' (band when hints "
            "exist, else cheaper of exact/grid by fitted cost models)"
        )
    # The reference CRASHES on depth_consistency_weight != 0: its
    # `model/losses.py:185-186` calls get_depth_consistency_loss(None, None)
    # because training.py never computes d1_proj. Per the check_supported
    # policy above, reference-crashing configs must error loudly here rather
    # than silently contribute a zero loss term.
    dcw = tr.get("depth_consistency_weight", 0.0) or 0.0
    dcw = dcw if isinstance(dcw, (list, tuple)) else [dcw]  # scheduled pair
    if any(float(v) != 0.0 for v in dcw):
        raise ValueError(
            "training.depth_consistency_weight != 0 is unsupported: the "
            "reference crashes on this path (model/losses.py:185-186 is "
            "called with d1_proj=None); set it to 0"
        )
