#!/usr/bin/env python
"""Convert torchvision VGG16 + lpips linear-head weights to the JAX npz.

Usage (on a machine with torchvision + lpips installed):
  python tools/convert_lpips.py [out.npz]

Or from explicit state-dict files:
  python tools/convert_lpips.py out.npz --vgg vgg16.pth --lin lpips_vgg.pth
"""
import argparse
import os
import sys

import numpy as np


# vgg16.features conv indices: 0,2, 5,7, 10,12,14, 17,19,21, 24,26,28
CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def convert(vgg_sd, lin_sd):
    """(vgg16.features state dict, lpips linear-head dict) -> JAX pytree.

    conv weights OIHW -> HWIO; lpips 1x1 heads (C_out=1, C, 1, 1) -> (C, 1).
    """
    convs = {}
    for i, ci in enumerate(CONV_IDX):
        w = np.asarray(vgg_sd[f"{ci}.weight"]).transpose(2, 3, 1, 0)
        b = np.asarray(vgg_sd[f"{ci}.bias"])
        convs[str(i)] = {"w": w, "b": b}
    lins = {}
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        w = np.asarray(lin_sd[key]).reshape(-1)[:, None]  # (1,C,1,1)->(C,1)
        lins[str(i)] = {"w": w}
    return {"convs": convs, "lins": lins}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default=os.path.join(
        os.path.expanduser("~"), ".cache", "nope_nerf_tpu", "lpips_vgg.npz"))
    ap.add_argument("--vgg", default=None, help="vgg16 state dict .pth")
    ap.add_argument("--lin", default=None, help="lpips vgg linear heads .pth")
    args = ap.parse_args()

    import torch

    if args.vgg:
        vgg_sd = torch.load(args.vgg, map_location="cpu")
    else:
        from torchvision.models import vgg16

        vgg_sd = vgg16(weights="IMAGENET1K_V1").features.state_dict()
    if args.lin:
        lin_sd = torch.load(args.lin, map_location="cpu")
    else:
        import lpips as lpips_lib

        m = lpips_lib.LPIPS(net="vgg")
        lin_sd = {
            f"lin{i}.model.1.weight": m.lins[i].model[1].weight.detach()
            for i in range(5)
        }

    params = convert(vgg_sd, lin_sd)

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), ".."))
    from nope_nerf_tpu.training.checkpoints import save_pytree

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    save_pytree(args.out, {"params": params})
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
