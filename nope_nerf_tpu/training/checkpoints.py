"""Checkpoint IO: flattened-pytree npz with scalar sidecar.

Replaces ``CheckpointIO`` (`model/checkpoints.py:9-130`).  Same logical
layout: four independent streams (model / model_pose / model_focal /
model_distortion — `train.py:249-259`), arbitrary scalar kwargs bundled with
each save (epoch_it, it, loss_val_best, patient_count, scheduling_start),
best-model backup, and numbered periodic backups.

Format: a single ``.npz`` per stream holding '/'-joined pytree paths plus a
JSON '__scalars__' entry — dependency-free, memory-mappable, and trivially
shardable later (orbax can be slotted in behind the same interface).
"""
from __future__ import annotations

import json
import os
import shutil

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat):
    tree = {}
    for path, v in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return _listify(tree)


def _listify(node):
    """Dicts whose keys are exactly 0..n-1 were lists before flattening —
    restore them (e.g. the DPT resnet stage/block lists)."""
    if not isinstance(node, dict):
        return node
    out = {k: _listify(v) for k, v in node.items()}
    if out and all(k.isdigit() for k in out):
        idx = sorted(out, key=int)
        if [int(k) for k in idx] == list(range(len(idx))):
            return [out[k] for k in idx]
    return out


def save_leaves(path_prefix_dict, tree):
    """Flatten an arbitrary pytree (NamedTuples, optax states, ...) into
    numbered leaves for npz storage. Returns {'__leaf_<i>': array}."""
    leaves = jax.tree.leaves(tree)
    return {f"__leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}


def restore_leaves(flat, template):
    """Rebuild ``template``'s structure from numbered leaves saved by
    :func:`save_leaves` (shape-checked against the template)."""
    treedef = jax.tree.structure(template)
    n = treedef.num_leaves
    leaves = [flat[f"__leaf_{i}"] for i in range(n)]
    t_leaves = jax.tree.leaves(template)
    for a, b in zip(leaves, t_leaves):
        if np.shape(a) != np.shape(b):
            raise ValueError(
                f"optimizer-state shape mismatch {np.shape(a)} vs {np.shape(b)}"
            )
    return jax.tree.unflatten(treedef, leaves)


def save_pytree(path, tree, opt_state=None, **scalars):
    """Save a pytree + scalar kwargs (+ optional opaque optimizer state, the
    reference bundles each module with its optimizer —
    `model/checkpoints.py:29-41`). Atomic (tmp+rename)."""
    flat = _flatten(jax.device_get(tree))
    if opt_state is not None:
        flat.update(save_leaves(None, jax.device_get(opt_state)))
    flat["__scalars__"] = np.frombuffer(
        json.dumps(scalars).encode(), dtype=np.uint8
    )
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def load_pytree(path, opt_template=None):
    """-> (tree dict of np arrays, scalars dict[, opt_state]).

    With ``opt_template`` the saved optimizer leaves are rebuilt into the
    template's structure (None if the file has none)."""
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    data = np.load(path)
    scalars = {}
    flat = {}
    leaf_flat = {}
    for k in data.files:
        if k == "__scalars__":
            scalars = json.loads(bytes(data[k]).decode())
        elif k.startswith("__leaf_"):
            leaf_flat[k] = data[k]
        else:
            flat[k] = data[k]
    tree = _unflatten(flat)
    if opt_template is None:
        return tree, scalars
    opt_state = (
        restore_leaves(leaf_flat, opt_template) if leaf_flat else None
    )
    return tree, scalars, opt_state


class CheckpointIO:
    """Directory-scoped stream saver mirroring the reference surface."""

    def __init__(self, checkpoint_dir):
        self.checkpoint_dir = checkpoint_dir
        os.makedirs(checkpoint_dir, exist_ok=True)

    def save(self, filename, tree, opt_state=None, **scalars):
        save_pytree(os.path.join(self.checkpoint_dir, filename), tree,
                    opt_state=opt_state, **scalars)

    def load(self, filename, opt_template=None):
        """Load; FileNotFoundError lets callers start fresh (the reference
        catches FileExistsError the same way, `train.py:64-67`).  URLs are
        downloaded into the checkpoint dir first
        (`model/checkpoints.py:93-103`)."""
        if filename.startswith(("http://", "https://")):
            import urllib.request

            local = os.path.join(self.checkpoint_dir,
                                 os.path.basename(filename))
            if not os.path.exists(local):
                urllib.request.urlretrieve(filename, local)
            return load_pytree(local, opt_template)
        return load_pytree(os.path.join(self.checkpoint_dir, filename),
                           opt_template)

    def backup_model_best(self, filename="model_best.npz"):
        """`model/checkpoints.py:43-53`."""
        src = os.path.join(self.checkpoint_dir, filename)
        if os.path.exists(src):
            backup_dir = os.path.join(self.checkpoint_dir, "backup_model_best")
            os.makedirs(backup_dir, exist_ok=True)
            ts = len(os.listdir(backup_dir))
            shutil.copy(src, os.path.join(backup_dir, f"{ts}_{filename}"))
