#!/usr/bin/env python
"""DPT depth preprocessing CLI — equivalent of the reference's
`preprocess/dpt_depth.py`.

Runs the (frozen) DPT-hybrid depth network over every frame and saves
``dpt/depth_<name>.npz`` (+ preview png), the priors later consumed by
training (`dataloading/common.py:289-315`).

TPU design: frames are batched through one jitted `vmap`'d forward; with more
than one chip the frame batch is sharded over the mesh.

Weights: convert the published checkpoint first —
  python tools/convert_dpt.py dpt_hybrid-midas-501f0c75.pt dpt_hybrid.npz
and point depth.path at the npz.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from nope_nerf_tpu.config import (
    DEFAULT_CONFIG,
    apply_parity_profile,
    check_supported,
    load_config,
)
from nope_nerf_tpu.dataloading.scene import get_scene
from nope_nerf_tpu.models.dpt import (
    apply_dpt_batched,
    dpt_input_transform,
    load_dpt,
)


def main(cfg):
    apply_parity_profile(cfg)
    assert cfg["depth"]["type"] == "DPT", "set depth.type: DPT for preprocessing"
    weights_path = cfg["depth"]["path"]
    if not os.path.exists(weights_path):
        raise FileNotFoundError(
            f"DPT weights not found at {weights_path}; convert the published "
            "checkpoint with tools/convert_dpt.py first"
        )
    params = load_dpt(weights_path)

    scene = get_scene(cfg, mode=cfg["training"].get("mode", "all"))
    load_dir = os.path.join(
        cfg["dataloading"]["path"], cfg["dataloading"]["scene"][0]
    )
    crop_size = cfg["dataloading"]["crop_size"]
    depth_net = cfg["dataloading"]["depth_net"]
    if crop_size != 0:
        depth_net = f"{depth_net}_{crop_size}"
    out_dir = os.path.join(load_dir, depth_net)
    os.makedirs(out_dir, exist_ok=True)

    scale = cfg["depth"]["scale"]
    shift = cfg["depth"]["shift"]
    invert = cfg["depth"]["invert"]
    non_negative = cfg["depth"]["non_negative"]

    # multi-chip: tpu.n_devices > 1 shards the FRAME batch over a 1-D mesh
    # (SURVEY.md §2.5's batched-pose parallelism for DPT preprocessing) —
    # params replicated, each chip runs its frames independently
    n_dev = int((cfg.get("tpu", {}) or {}).get("n_devices", 1) or 1)
    mesh = None
    if n_dev > 1:
        from nope_nerf_tpu.parallel.mesh import make_ray_mesh, replicated

        mesh = make_ray_mesh(
            n_dev, cfg.get("tpu", {}).get("mesh_axis", "rays") or "rays",
            allow_virtual_cpu=False,
        )
        params = jax.device_put(params, replicated(mesh))

    # params as explicit jit args — closing over them would bake ~400 MB of
    # weight constants into the HLO (very slow to upload/compile)
    fwd_impl = jax.jit(
        lambda p, imgs: apply_dpt_batched(
            p, imgs, mesh=mesh, scale=scale, shift=shift, invert=invert,
            non_negative=non_negative,
        )
    )

    def fwd(imgs):
        return fwd_impl(params, imgs)

    import imageio

    # all frames share one resolution -> one compiled shape, batched; the
    # batch is a multiple of the mesh size so frames divide over the chips
    batch = []
    names = []
    bs = 4 * max(n_dev // 4, 1) if n_dev > 1 else 4
    bs = max(bs, n_dev)
    for i in range(scene.N_imgs):
        batch.append(dpt_input_transform(scene.imgs[i]))
        names.append(scene.img_list[i].split(".")[0])
        if len(batch) == bs or i == scene.N_imgs - 1:
            n_real = len(batch)
            if mesh is not None and n_real % n_dev:
                # pad the tail batch so it still divides over the mesh
                batch += [batch[-1]] * (n_dev - n_real % n_dev)
            depths = np.asarray(
                fwd(jnp.asarray(np.stack(batch))))[:n_real]
            for d, name in zip(depths, names[-n_real:]):
                # (1, H, W) 'pred' + the png normalisation exactly as the
                # reference CLI writes them (`preprocess/dpt_depth.py:42-47`:
                # scaled by max AFTER subtracting min, so the brightest
                # pixel is < 255 whenever min > 0) — executed-A/B'd in
                # tests/test_preprocess_reference_exec.py
                np.savez(os.path.join(out_dir, f"depth_{name}.npz"),
                         pred=d.astype(np.float32)[None])
                vis = np.clip(
                    255.0 / max(d.max(), 1e-8) * (d - d.min()), 0, 255
                ).astype(np.uint8)
                imageio.imwrite(
                    os.path.join(out_dir, f"{name}.png"), vis
                )
                print(f"depth_{name}.npz written")
            batch = []


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="DPT depth preprocessing.")
    parser.add_argument("config", type=str, help="Path to config file.")
    args = parser.parse_args()
    cfg = load_config(args.config, DEFAULT_CONFIG)
    check_supported(cfg)
    main(cfg)
