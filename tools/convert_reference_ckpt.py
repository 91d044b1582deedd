#!/usr/bin/env python
"""Convert reference nope-nerf PyTorch checkpoints to this framework's npz
streams.

The reference saves four independent torch module checkpoints
(`train.py:249-259`), each a pickled dict ``{'model': state_dict,
'optimizer': state_dict, **scalars}`` (`model/checkpoints.py:29-41`):

* ``model.pt``            — the ``nope_nerf`` wrapper: NeRF MLP weights under
                            ``renderer.model.*`` (`model/official_nerf.py:20-44`),
                            plus resume scalars (epoch_it, it, loss_val_best,
                            patient_count, scheduling_start).
* ``model_pose.pt``       — ``LearnPose``: ``r``/``t`` (N, 3) tables and the
                            optional frozen ``init_c2w`` (`model/poses.py:13-21`).
* ``model_focal.pt``      — ``LearnFocal``: ``fx`` (and ``fy`` unless fx_only)
                            (`model/intrinsics.py:5-58`).
* ``model_distortion.pt`` — ``Learn_Distortion``: ``global_scales``/
                            ``global_shifts`` (N, 1) (`model/distortions.py:4-18`).

This tool maps each onto the corresponding npz stream consumed by
``nope_nerf_tpu.training.checkpoints`` / ``training.loop.restore`` /
``evaluation/eval.py`` so the PUBLISHED pretrained models (reference
README.md:42) can drive this framework's eval stack directly.

Torch Adam moments are NOT converted: eval never reads them, and
``training.loop.restore`` starts fresh moments when a stream carries none
(the documented opt-state-mismatch fallback). Resume scalars ARE carried
over, so a converted checkpoint resumes at the right epoch/phase.

Usage:
  python tools/convert_reference_ckpt.py <ckpt_dir_or_model.pt> <out_dir>

Accepts a directory containing any subset of the four stream files (numbered
backups like ``model_50000.pt`` work too when named explicitly) or a single
``.pt`` file. Writes ``model.npz`` / ``model_pose.npz`` / ``model_focal.npz``
/ ``model_distortion.npz`` into <out_dir>.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nope_nerf_tpu.training.checkpoints import save_pytree  # noqa: E402

# reference module state_dict key -> our nerf param path, with the torch
# Linear (out, in) weight transposed to our (in, out) "w"
_NERF_LAYER_MAP = {
    "layers0.0": "trunk0_0",
    "layers0.2": "trunk0_1",
    "layers0.4": "trunk0_2",
    "layers0.6": "trunk0_3",
    "layers1.0": "trunk1_0",
    "layers1.2": "trunk1_1",
    "layers1.4": "trunk1_2",
    "layers1.6": "trunk1_3",
    "fc_density": "fc_density",
    "fc_feature": "fc_feature",
    "rgb_layers.0": "rgb_layer",
    "fc_rgb": "fc_rgb",
}

_STREAMS = ("model", "model_pose", "model_focal", "model_distortion")


def _to_np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                      dtype=np.float32)


def _load_torch(path):
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except TypeError:  # torch too old for the weights_only kwarg
        return torch.load(path, map_location="cpu")


def _split(ckpt):
    """-> (model state_dict, resume scalars). Optimizer state is dropped."""
    state = ckpt.get("model", {})
    scalars = {
        k: v for k, v in ckpt.items()
        if k not in ("model", "optimizer") and np.isscalar(v)
    }
    return state, scalars


STRICT = False


def _strip_prefix(state):
    """Normalise NeRF MLP key prefixes: the ``nope_nerf`` wrapper nests the
    field under ``renderer.model.`` (`model/network.py:11`,
    `model/rendering.py:19`); a bare ``OfficialStaticNerf`` state_dict has
    none. A frozen ``depth_estimator.*`` subtree (DPT attached at save time)
    is dropped — depth priors are a preprocessing artifact here."""
    anchor = "layers0.0.weight"
    prefix = None
    for k in state:
        if k.endswith(anchor):
            prefix = k[: -len(anchor)]
            break
    if prefix is None:
        raise ValueError(
            "no NeRF MLP found in checkpoint (missing *layers0.0.weight)"
        )
    out = {}
    dropped = []
    for k, v in state.items():
        if k.startswith(prefix):
            out[k[len(prefix):]] = v
        else:
            dropped.append(k)
    dpt = [k for k in dropped if "depth_estimator" in k]
    if dpt:
        print(f"  dropped {len(dpt)} frozen depth_estimator.* entries "
              "(preprocessing net; convert with tools/convert_dpt.py)")
    other = [k for k in dropped if "depth_estimator" not in k]
    if other:
        if STRICT:
            raise ValueError(
                f"--strict: unrecognised non-DPT keys in checkpoint: "
                f"{other[:8]}{'...' if len(other) > 8 else ''}"
            )
        print(f"  WARNING: unrecognised keys ignored: {other[:8]}")
    return out


def convert_nerf(ckpt):
    state, scalars = _split(ckpt)
    state = _strip_prefix(state)
    params = {}
    used = set()
    for ref_key, our_key in _NERF_LAYER_MAP.items():
        w = state.get(f"{ref_key}.weight")
        b = state.get(f"{ref_key}.bias")
        if w is None or b is None:
            raise ValueError(f"checkpoint missing {ref_key}.weight/.bias")
        params[our_key] = {"w": _to_np(w).T.copy(), "b": _to_np(b)}
        used.update((f"{ref_key}.weight", f"{ref_key}.bias"))
    extra = sorted(set(state) - used)
    if extra:
        if STRICT:
            raise ValueError(
                f"--strict: unrecognised NeRF keys in checkpoint: "
                f"{extra[:8]}{'...' if len(extra) > 8 else ''}"
            )
        print(f"  WARNING: unrecognised NeRF keys ignored: {extra[:8]}")
    return {"params": params}, scalars


def convert_pose(ckpt):
    state, scalars = _split(ckpt)
    params = {"r": _to_np(state["r"]), "t": _to_np(state["t"])}
    tree = {"params": params}
    if "init_c2w" in state:
        # frozen buffer in the reference (`model/poses.py:19`); our pipeline
        # rebuilds init_c2w from the dataset COLMAP poses, but carry it so a
        # converted checkpoint is self-describing
        tree["init_c2w"] = _to_np(state["init_c2w"])
    return tree, scalars


def _as_scalar(v, name):
    a = _to_np(v)
    if a.size != 1:
        raise ValueError(
            f"focal param {name!r} has {a.size} elements (shape "
            f"{a.shape}); LearnFocal stores scalars "
            "(`model/intrinsics.py:14-31`) — this is not a reference "
            "focal checkpoint"
        )
    return a.reshape(())


def convert_focal(ckpt):
    state, scalars = _split(ckpt)
    params = {"fx": _as_scalar(state["fx"], "fx")}
    if "fy" in state:
        params["fy"] = _as_scalar(state["fy"], "fy")
    return {"params": params}, scalars


def convert_distortion(ckpt):
    state, scalars = _split(ckpt)
    params = {
        "scales": _to_np(state["global_scales"]),
        "shifts": _to_np(state["global_shifts"]),
    }
    return {"params": params}, scalars


_CONVERTERS = {
    "model": convert_nerf,
    "model_pose": convert_pose,
    "model_focal": convert_focal,
    "model_distortion": convert_distortion,
}


def _stream_of(filename):
    """model_pose_50000.pt -> model_pose; model.pt -> model."""
    base = os.path.splitext(os.path.basename(filename))[0]
    for s in sorted(_STREAMS, key=len, reverse=True):
        if base == s or base.startswith(s + "_"):
            tail = base[len(s):].lstrip("_")
            if tail == "" or tail.isdigit():
                return s
    raise ValueError(
        f"cannot infer stream from {filename!r}; expected one of {_STREAMS}"
    )


def convert_file(pt_path, out_dir):
    stream = _stream_of(pt_path)
    ckpt = _load_torch(pt_path)
    tree, scalars = _CONVERTERS[stream](ckpt)
    out_path = os.path.join(out_dir, f"{stream}.npz")
    save_pytree(out_path, tree, **scalars)
    n = sum(np.asarray(x).size for x in _flat_leaves(tree))
    print(f"{os.path.basename(pt_path)} -> {out_path} "
          f"({n} values, scalars={scalars})")
    return out_path


def _flat_leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _flat_leaves(v)
    else:
        yield tree


def _scan_dir(src, step=None):
    """Pick one .pt per stream from a checkpoint directory.

    Mirrors the reference's save layout (`train.py:249-271`): live
    ``<stream>.pt`` files plus numbered backups ``<stream>_<it>.pt`` from
    ``backup_every``. Preference: the exact ``--step`` backup when given,
    else the live file, else the HIGHEST-numbered backup.
    """
    import re

    found = []
    for s in _STREAMS:
        if step is not None:
            p = os.path.join(src, f"{s}_{step}.pt")
            if os.path.exists(p):
                found.append(p)
            continue
        live = os.path.join(src, f"{s}.pt")
        if os.path.exists(live):
            found.append(live)
            continue
        pat = re.compile(re.escape(s) + r"_(\d+)\.pt$")
        backups = []
        for f in os.listdir(src):
            m = pat.match(f)
            if m:
                backups.append((int(m.group(1)), f))
        if backups:
            it, f = max(backups)
            print(f"using numbered backup {f} for stream {s}")
            found.append(os.path.join(src, f))
    return found


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("src", help=".pt file or directory holding the streams")
    ap.add_argument("out_dir", help="output directory for npz streams")
    ap.add_argument("--step", type=int, default=None,
                    help="pick the numbered backup model_<step>.pt instead "
                         "of the live files")
    ap.add_argument("--strict", action="store_true",
                    help="error on unrecognised non-DPT checkpoint keys "
                         "instead of warning")
    args = ap.parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)
    global STRICT
    STRICT = args.strict

    if os.path.isdir(args.src):
        found = _scan_dir(args.src, args.step)
        if not found:
            what = (f"step-{args.step} backups" if args.step is not None
                    else f"{'/'.join(_STREAMS)}.pt or numbered backups")
            raise SystemExit(f"no {what} found in {args.src}")
    else:
        found = [args.src]
    for f in found:
        convert_file(f, args.out_dir)


if __name__ == "__main__":
    main()
