"""Executable from-scratch stand-in for the ``timm`` surface the reference
DPT package uses, so the reference's OWN ``DPT/dpt/{vit,blocks,models}.py``
can be imported and EXECUTED in this environment (timm is not installed).

This is not a copy of timm: it is a minimal torch implementation of exactly
the one model the reference instantiates —
``timm.create_model("vit_base_resnet50_384", pretrained=False)``
(`/root/reference/DPT/dpt/vit.py:501`) — with timm's documented module tree
and semantics, pinned previously by this repo's layer-parity tests
(`tests/test_dpt_convert.py`) and the published checkpoint's key layout
(``dpt_hybrid-midas-501f0c75.pt``):

* ResNetV2-(3,4,9) hybrid backbone under ``patch_embed.backbone``:
  weight-standardised SAME-padded convs (unbiased var, eps 1e-6),
  GroupNorm(32, eps 1e-5) + ReLU ("GroupNormAct"), non-preact bottlenecks
  with the stride on conv2 and a conv+norm downsample in block 0 of each
  stage, SAME max-pool stem;
* ViT-Base/16 trunk: pre-LN blocks (LN eps 1e-6, fused qkv with bias,
  per-head scale ``(D/H)**-0.5``, exact GELU MLP), ``cls_token`` +
  577-token ``pos_embed``, ``patch_embed.proj`` 1x1 conv, final ``norm``.

The reference's ``forward_flex``/``forward_vit`` drive these modules
directly (``patch_embed.backbone``, ``patch_embed.proj``, ``blocks``,
``pos_drop``, ``norm``, forward hooks on ``stages[0/1]`` and blocks 8/11),
so ``state_dict()`` of the resulting ``DPTDepthModel`` reproduces the
published checkpoint layout key for key — which is what lets
``tools/convert_dpt.py`` consume it unchanged in the executed A/B test
(`tests/test_dpt_reference_exec.py`).
"""
from __future__ import annotations

import sys
import types

import torch
import torch.nn as nn
import torch.nn.functional as F


def _pad_same(x, kh, kw, sh, sw, value=0.0):
    """TF 'SAME' dynamic padding (timm ``Conv2dSame``/``MaxPool2dSame``)."""
    ih, iw = x.shape[-2:]
    oh, ow = -(-ih // sh), -(-iw // sw)
    ph = max((oh - 1) * sh + kh - ih, 0)
    pw = max((ow - 1) * sw + kw - iw, 0)
    if ph == 0 and pw == 0:
        return x
    return F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2),
                 value=value)


class StdConv2dSame(nn.Conv2d):
    """Weight-standardised conv with SAME padding (timm ``StdConv2dSame``:
    per-filter mean/var over (in, kh, kw), unbiased=False, eps 1e-6)."""

    def forward(self, x):
        w = self.weight
        mean = w.mean(dim=(1, 2, 3), keepdim=True)
        var = w.var(dim=(1, 2, 3), unbiased=False, keepdim=True)
        w = (w - mean) / torch.sqrt(var + 1e-6)
        x = _pad_same(x, w.shape[2], w.shape[3],
                      self.stride[0], self.stride[1])
        return F.conv2d(x, w, self.bias, stride=self.stride)


class GroupNormAct(nn.GroupNorm):
    """timm ``GroupNormAct``: GroupNorm(32, eps 1e-5) with a fused ReLU
    (identity when ``apply_act=False`` — the pre-residual norm3/downsample
    norms)."""

    def __init__(self, num_channels, apply_act=True):
        super().__init__(32, num_channels, eps=1e-5)
        self.apply_act = apply_act

    def forward(self, x):
        x = super().forward(x)
        return F.relu(x) if self.apply_act else x


class _MaxPoolSame(nn.Module):
    def forward(self, x):
        # -inf padding (true timm semantics); inputs are post-ReLU so this
        # equals the 0-padding used by the layer-parity transcription.
        x = _pad_same(x, 3, 3, 2, 2, value=float("-inf"))
        return F.max_pool2d(x, 3, stride=2)


class _Stem(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv = StdConv2dSame(3, 64, 7, stride=2, bias=False)
        self.norm = GroupNormAct(64)
        self.pool = _MaxPoolSame()

    def forward(self, x):
        return self.pool(self.norm(self.conv(x)))


class _Bottleneck(nn.Module):
    """Non-preact ResNetV2 bottleneck (stride on conv2, ReLU after add)."""

    def __init__(self, cin, cout, stride):
        super().__init__()
        cmid = cout // 4
        if cin != cout or stride != 1:
            self.downsample = nn.Module()
            self.downsample.conv = StdConv2dSame(
                cin, cout, 1, stride=stride, bias=False)
            self.downsample.norm = GroupNormAct(cout, apply_act=False)
        else:
            self.downsample = None
        self.conv1 = StdConv2dSame(cin, cmid, 1, bias=False)
        self.norm1 = GroupNormAct(cmid)
        self.conv2 = StdConv2dSame(cmid, cmid, 3, stride=stride, bias=False)
        self.norm2 = GroupNormAct(cmid)
        self.conv3 = StdConv2dSame(cmid, cout, 1, bias=False)
        self.norm3 = GroupNormAct(cout, apply_act=False)

    def forward(self, x):
        if self.downsample is not None:
            shortcut = self.downsample.norm(self.downsample.conv(x))
        else:
            shortcut = x
        h = self.norm1(self.conv1(x))
        h = self.norm2(self.conv2(h))
        h = self.norm3(self.conv3(h))
        return F.relu(h + shortcut)


class _Stage(nn.Module):
    def __init__(self, cin, cout, n, stride):
        super().__init__()
        self.blocks = nn.Sequential(*[
            _Bottleneck(cin if i == 0 else cout, cout,
                        stride if i == 0 else 1)
            for i in range(n)
        ])

    def forward(self, x):
        return self.blocks(x)


class _ResNetV2(nn.Module):
    """BiT-style ResNetV2-(3,4,9), output stride 16, final width 1024."""

    def __init__(self):
        super().__init__()
        self.stem = _Stem()
        self.stages = nn.Sequential(
            _Stage(64, 256, 3, stride=1),
            _Stage(256, 512, 4, stride=2),
            _Stage(512, 1024, 9, stride=2),
        )

    def forward(self, x):
        return self.stages(self.stem(x))


class _HybridEmbed(nn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = _ResNetV2()
        self.proj = nn.Conv2d(1024, 768, kernel_size=1, stride=1)

    def forward(self, x):
        return self.proj(self.backbone(x)).flatten(2).transpose(1, 2)


class _Attention(nn.Module):
    def __init__(self, dim=768, num_heads=12):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, 3 * dim, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        qkv = (self.qkv(x)
               .reshape(B, N, 3, self.num_heads, C // self.num_heads)
               .permute(2, 0, 3, 1, 4))
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = torch.softmax(q @ k.transpose(-2, -1) * self.scale, dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(out)


class _Mlp(nn.Module):
    def __init__(self, dim=768, hidden=3072):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class _Block(nn.Module):
    def __init__(self, dim=768, num_heads=12):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = _Attention(dim, num_heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = _Mlp(dim)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.mlp(self.norm2(x))
        return x


class _VisionTransformerHybrid(nn.Module):
    """Module tree of timm's ``vit_base_resnet50_384`` (the only attributes
    the reference's ``forward_flex``/``_make_vit_b_rn50_backbone`` touch)."""

    def __init__(self, depth=12, dim=768, num_heads=12, grid=24):
        super().__init__()
        self.patch_embed = _HybridEmbed()
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, 1 + grid * grid, dim))
        self.pos_drop = nn.Dropout(0.0)
        self.blocks = nn.Sequential(*[
            _Block(dim, num_heads) for _ in range(depth)
        ])
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):  # pragma: no cover - forward_flex is used instead
        x = self.patch_embed(x)
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos_embed
        x = self.pos_drop(x)
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)


def create_model(name, pretrained=False, **kwargs):
    if name != "vit_base_resnet50_384":
        raise NotImplementedError(
            f"timm stub only implements the reference's backbone "
            f"'vit_base_resnet50_384' (DPT/dpt/vit.py:501), got {name!r}")
    if pretrained:
        raise NotImplementedError(
            "timm stub has no pretrained weights; load a checkpoint via "
            "DPTDepthModel(path=...) / BaseModel.load instead")
    return _VisionTransformerHybrid()


def install():
    """Register this module as ``timm`` in sys.modules (idempotent)."""
    if "timm" not in sys.modules:
        mod = types.ModuleType("timm")
        mod.create_model = create_model
        sys.modules["timm"] = mod
    return sys.modules["timm"]
