#!/usr/bin/env python
"""Convert the published DPT-hybrid torch checkpoint to the JAX pytree npz.

Usage:
  python tools/convert_dpt.py dpt_hybrid-midas-501f0c75.pt dpt_hybrid.npz

Maps the timm/DPT module names (see reference `DPT/dpt/vit.py:351-491`,
`models.py:93-180`) onto the pytree of nope_nerf_tpu.models.dpt:
conv weights OIHW -> HWIO, linear weights (out, in) -> (in, out).
Only needs torch-cpu to unpickle.
"""
import sys

import numpy as np


def conv_w(t):
    return np.asarray(t).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def lin_w(t):
    return np.asarray(t).transpose(1, 0)


def arr(t):
    return np.asarray(t)


def convert(state):
    g = lambda k: state[k]
    P = {}

    # --- ResNetV2 backbone -------------------------------------------------
    bb = "pretrained.model.patch_embed.backbone."
    rn = {
        "stem_conv": {"w": conv_w(g(bb + "stem.conv.weight"))},
        "stem_norm": {
            "scale": arr(g(bb + "stem.norm.weight")),
            "bias": arr(g(bb + "stem.norm.bias")),
        },
        "stages": [],
    }
    layers = (3, 4, 9)
    for si, n in enumerate(layers):
        blocks = []
        for bi in range(n):
            pre = f"{bb}stages.{si}.blocks.{bi}."
            b = {}
            for ci in (1, 2, 3):
                b[f"conv{ci}"] = {"w": conv_w(g(pre + f"conv{ci}.weight"))}
                b[f"norm{ci}"] = {
                    "scale": arr(g(pre + f"norm{ci}.weight")),
                    "bias": arr(g(pre + f"norm{ci}.bias")),
                }
            if pre + "downsample.conv.weight" in state:
                b["down_conv"] = {"w": conv_w(g(pre + "downsample.conv.weight"))}
                b["down_norm"] = {
                    "scale": arr(g(pre + "downsample.norm.weight")),
                    "bias": arr(g(pre + "downsample.norm.bias")),
                }
            blocks.append(b)
        rn["stages"].append(blocks)
    P["resnet"] = rn

    # --- ViT ----------------------------------------------------------------
    vm = "pretrained.model."
    P["patch_proj"] = {
        "w": conv_w(g(vm + "patch_embed.proj.weight")),
        "b": arr(g(vm + "patch_embed.proj.bias")),
    }
    P["cls_token"] = arr(g(vm + "cls_token"))
    P["pos_embed"] = arr(g(vm + "pos_embed"))
    blocks = []
    for i in range(12):
        pre = f"{vm}blocks.{i}."
        blocks.append(
            {
                "ln1": {"scale": arr(g(pre + "norm1.weight")),
                        "bias": arr(g(pre + "norm1.bias"))},
                "qkv": {"w": lin_w(g(pre + "attn.qkv.weight")),
                        "b": arr(g(pre + "attn.qkv.bias"))},
                "proj": {"w": lin_w(g(pre + "attn.proj.weight")),
                         "b": arr(g(pre + "attn.proj.bias"))},
                "ln2": {"scale": arr(g(pre + "norm2.weight")),
                        "bias": arr(g(pre + "norm2.bias"))},
                "mlp1": {"w": lin_w(g(pre + "mlp.fc1.weight")),
                         "b": arr(g(pre + "mlp.fc1.bias"))},
                "mlp2": {"w": lin_w(g(pre + "mlp.fc2.weight")),
                         "b": arr(g(pre + "mlp.fc2.bias"))},
            }
        )
    P["blocks"] = blocks
    P["final_ln"] = {"scale": arr(g(vm + "norm.weight")),
                     "bias": arr(g(vm + "norm.bias"))}

    # --- readout + reassemble ------------------------------------------------
    P["readout3"] = {
        "w": lin_w(g("pretrained.act_postprocess3.0.project.0.weight")),
        "b": arr(g("pretrained.act_postprocess3.0.project.0.bias")),
    }
    P["readout4"] = {
        "w": lin_w(g("pretrained.act_postprocess4.0.project.0.weight")),
        "b": arr(g("pretrained.act_postprocess4.0.project.0.bias")),
    }
    P["post3_conv"] = {
        "w": conv_w(g("pretrained.act_postprocess3.3.weight")),
        "b": arr(g("pretrained.act_postprocess3.3.bias")),
    }
    P["post4_conv1"] = {
        "w": conv_w(g("pretrained.act_postprocess4.3.weight")),
        "b": arr(g("pretrained.act_postprocess4.3.bias")),
    }
    P["post4_conv2"] = {
        "w": conv_w(g("pretrained.act_postprocess4.4.weight")),
        "b": arr(g("pretrained.act_postprocess4.4.bias")),
    }

    # --- scratch / refinenets / head ------------------------------------------
    P["scratch"] = {
        f"layer{i}_rn": {"w": conv_w(g(f"scratch.layer{i}_rn.weight"))}
        for i in (1, 2, 3, 4)
    }
    for r in (1, 2, 3, 4):
        pre = f"scratch.refinenet{r}."
        P[f"refinenet{r}"] = {
            "rcu1": {
                "conv1": {"w": conv_w(g(pre + "resConfUnit1.conv1.weight")),
                          "b": arr(g(pre + "resConfUnit1.conv1.bias"))},
                "conv2": {"w": conv_w(g(pre + "resConfUnit1.conv2.weight")),
                          "b": arr(g(pre + "resConfUnit1.conv2.bias"))},
            },
            "rcu2": {
                "conv1": {"w": conv_w(g(pre + "resConfUnit2.conv1.weight")),
                          "b": arr(g(pre + "resConfUnit2.conv1.bias"))},
                "conv2": {"w": conv_w(g(pre + "resConfUnit2.conv2.weight")),
                          "b": arr(g(pre + "resConfUnit2.conv2.bias"))},
            },
            "out_conv": {"w": conv_w(g(pre + "out_conv.weight")),
                         "b": arr(g(pre + "out_conv.bias"))},
        }
    P["head"] = {
        "conv1": {"w": conv_w(g("scratch.output_conv.0.weight")),
                  "b": arr(g("scratch.output_conv.0.bias"))},
        "conv2": {"w": conv_w(g("scratch.output_conv.2.weight")),
                  "b": arr(g("scratch.output_conv.2.bias"))},
        "conv3": {"w": conv_w(g("scratch.output_conv.4.weight")),
                  "b": arr(g("scratch.output_conv.4.bias"))},
    }
    return P


def main():
    import torch

    src, dst = sys.argv[1], sys.argv[2]
    state = torch.load(src, map_location="cpu")
    if "model" in state and isinstance(state["model"], dict):
        state = state["model"]
    state = {k: v for k, v in state.items()}
    params = convert(state)

    sys.path.insert(0, ".")
    from nope_nerf_tpu.training.checkpoints import save_pytree

    save_pytree(dst, {"params": params}, source=src)
    print(f"converted {len(state)} tensors -> {dst}")


if __name__ == "__main__":
    main()
