"""DPT-hybrid monocular depth network in pure JAX.

Re-implements the frozen DPT depth estimator the reference vendors under
`DPT/dpt/` (ActiveVisionLab/nope-nerf): a ResNetV2-50 + ViT-B/16 hybrid
backbone with forward hooks at [stage0, stage1, block8, block11]
(`DPT/dpt/vit.py:351-491`), projected readout tokens (`vit.py:79-90`),
reassemble convolutions, a RefineNet-style fusion decoder
(`DPT/dpt/models.py:93-160`, `blocks.py:318-383`) and the monodepth head
(`models.py:172-180`), with inverse-depth -> depth conversion
``1/(scale·inv + shift)`` (`models.py:203-212`).

TPU design notes:
* no module objects, no hooks — the backbone returns its four tap points
  directly from one traced function;
* NHWC layout throughout (TPU-native convolution layout);
* weight-standardised convs fold the standardisation into the conv weights
  at trace time (XLA hoists it as a constant once params are frozen);
* batched over frames: apply is written for one image, `jax.vmap` maps it
  over the frame axis and the frame batch can be sharded over chips.

Weights: convert the published ``dpt_hybrid-midas-501f0c75.pt`` with
`tools/convert_dpt.py` (torch-cpu only) into the npz pytree this module
loads.  Random init is only for shape tests.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# ---------------------------------------------------------------------------
# primitive layers
# ---------------------------------------------------------------------------


def _conv(x, w, b=None, stride=1, padding="SAME", std=False):
    """NHWC conv with HWIO weights; optional weight standardisation
    (timm StdConv2dSame, eps 1e-6)."""
    if std:
        mean = jnp.mean(w, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(w, axis=(0, 1, 2), keepdims=True)
        w = (w - mean) / jnp.sqrt(var + 1e-6)
    # HIGHEST precision: monocular depth priors are computed ONCE offline
    # (preprocess/dpt_depth.py) and supervise the whole training; the
    # reference's priors come from f32 torch convs — bf16 drift here would
    # silently change the supervision signal
    out = lax.conv_general_dilated(
        x[None] if x.ndim == 3 else x,
        w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
    )
    if x.ndim == 3:
        out = out[0]
    if b is not None:
        out = out + b
    return out


def _group_norm(x, scale, bias, groups=32, eps=1e-5):
    """GroupNorm over the channel axis of (..., H, W, C)."""
    C = x.shape[-1]
    groups = min(groups, C)  # every production DPT norm has C >= 32
    orig = x.shape
    x = x.reshape(orig[:-1] + (groups, C // groups))
    mean = jnp.mean(x, axis=(-4, -3, -1), keepdims=True)
    var = jnp.var(x, axis=(-4, -3, -1), keepdims=True)
    x = (x - mean) / jnp.sqrt(var + eps)
    x = x.reshape(orig)
    return x * scale + bias


def _layer_norm(x, scale, bias, eps=1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps) * scale + bias


def _max_pool_same(x, window=3, stride=2):
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        (window, window, 1), (stride, stride, 1), "SAME",
    )


def _resize_bilinear_ac(x, out_hw):
    """Bilinear resize with align_corners=True (torch semantics), (H, W, C)."""
    H, W = x.shape[:2]
    h, w = out_hw
    fy = jnp.arange(h) * ((H - 1) / max(h - 1, 1))
    fx = jnp.arange(w) * ((W - 1) / max(w - 1, 1))
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, H - 1)
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    wy = (fy - y0)[:, None, None]
    wx = (fx - x0)[None, :, None]
    v00 = x[y0[:, None], x0[None, :]]
    v01 = x[y0[:, None], x1[None, :]]
    v10 = x[y1[:, None], x0[None, :]]
    v11 = x[y1[:, None], x1[None, :]]
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


def _resize_bilinear(x, out_hw):
    """align_corners=False (for the pos-embed resize, `vit.py:157`)."""
    from ..ops.interp import resize_bilinear

    return resize_bilinear(x, out_hw)


# ---------------------------------------------------------------------------
# init helpers
# ---------------------------------------------------------------------------


def _init_conv(key, kh, kw, cin, cout, bias=True):
    k1, k2 = jax.random.split(key)
    fan_in = kh * kw * cin
    bound = 1.0 / np.sqrt(fan_in)
    p = {"w": jax.random.uniform(k1, (kh, kw, cin, cout), jnp.float32,
                                 -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(k2, (cout,), jnp.float32, -bound, bound)
    return p


def _init_norm(c):
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32)}


def _init_linear(key, cin, cout):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / np.sqrt(cin)
    return {
        "w": jax.random.uniform(k1, (cin, cout), jnp.float32, -bound, bound),
        "b": jax.random.uniform(k2, (cout,), jnp.float32, -bound, bound),
    }


# ---------------------------------------------------------------------------
# ResNetV2 stem + stages (timm vit_base_r50_s16_384 backbone: layers (3,4,9),
# preact=False, StdConv + GroupNorm32, 'SAME' padding)
# ---------------------------------------------------------------------------

RESNET_LAYERS = (3, 4, 9)
RESNET_CHANNELS = (256, 512, 1024)


def _init_bottleneck(key, cin, cmid, cout, downsample):
    keys = jax.random.split(key, 4)
    p = {
        "conv1": _init_conv(keys[0], 1, 1, cin, cmid, bias=False),
        "norm1": _init_norm(cmid),
        "conv2": _init_conv(keys[1], 3, 3, cmid, cmid, bias=False),
        "norm2": _init_norm(cmid),
        "conv3": _init_conv(keys[2], 1, 1, cmid, cout, bias=False),
        "norm3": _init_norm(cout),
    }
    if downsample:
        p["down_conv"] = _init_conv(keys[3], 1, 1, cin, cout, bias=False)
        p["down_norm"] = _init_norm(cout)
    return p


def _apply_bottleneck(p, x, stride):
    """Non-preact ResNetV2 bottleneck (timm): conv-GN-relu x2, conv-GN,
    residual add, relu."""
    if "down_conv" in p:
        sc = _conv(x, p["down_conv"]["w"], stride=stride, std=True)
        sc = _group_norm(sc, p["down_norm"]["scale"], p["down_norm"]["bias"])
    else:
        sc = x
    h = _conv(x, p["conv1"]["w"], std=True)
    h = jax.nn.relu(_group_norm(h, p["norm1"]["scale"], p["norm1"]["bias"]))
    h = _conv(h, p["conv2"]["w"], stride=stride, std=True)
    h = jax.nn.relu(_group_norm(h, p["norm2"]["scale"], p["norm2"]["bias"]))
    h = _conv(h, p["conv3"]["w"], std=True)
    h = _group_norm(h, p["norm3"]["scale"], p["norm3"]["bias"])
    return jax.nn.relu(h + sc)


def _init_resnet(key):
    keys = jax.random.split(key, 1 + len(RESNET_LAYERS))
    p = {
        "stem_conv": _init_conv(keys[0], 7, 7, 3, 64, bias=False),
        "stem_norm": _init_norm(64),
        "stages": [],
    }
    cin = 64
    for si, (n_blocks, cout) in enumerate(zip(RESNET_LAYERS, RESNET_CHANNELS)):
        cmid = cout // 4
        bkeys = jax.random.split(keys[1 + si], n_blocks)
        blocks = []
        for bi in range(n_blocks):
            down = bi == 0
            blocks.append(
                _init_bottleneck(bkeys[bi], cin if bi == 0 else cout, cmid,
                                 cout, down)
            )
        p["stages"].append(blocks)
        cin = cout
    return p


def _apply_resnet(p, x):
    """-> (stage0 out (H/4), stage1 out (H/8), final (H/16))."""
    h = _conv(x, p["stem_conv"]["w"], stride=2, std=True)
    h = jax.nn.relu(_group_norm(h, p["stem_norm"]["scale"],
                                p["stem_norm"]["bias"]))
    h = _max_pool_same(h, 3, 2)
    taps = []
    for si, blocks in enumerate(p["stages"]):
        stride = 1 if si == 0 else 2
        for bi, bp in enumerate(blocks):
            h = _apply_bottleneck(bp, h, stride if bi == 0 else 1)
        taps.append(h)
    return taps[0], taps[1], taps[2]


# ---------------------------------------------------------------------------
# ViT-B encoder
# ---------------------------------------------------------------------------

VIT_DIM = 768
VIT_HEADS = 12
VIT_BLOCKS = 12
VIT_GRID = 24  # 384 / 16


def _init_vit_block(key):
    keys = jax.random.split(key, 4)
    return {
        "ln1": _init_norm(VIT_DIM),
        "qkv": _init_linear(keys[0], VIT_DIM, 3 * VIT_DIM),
        "proj": _init_linear(keys[1], VIT_DIM, VIT_DIM),
        "ln2": _init_norm(VIT_DIM),
        "mlp1": _init_linear(keys[2], VIT_DIM, 4 * VIT_DIM),
        "mlp2": _init_linear(keys[3], 4 * VIT_DIM, VIT_DIM),
    }


def _apply_vit_block(p, x):
    """Pre-LN transformer block; (T, D)."""
    h = _layer_norm(x, p["ln1"]["scale"], p["ln1"]["bias"])
    T, D = h.shape
    qkv = h @ p["qkv"]["w"] + p["qkv"]["b"]
    qkv = qkv.reshape(T, 3, VIT_HEADS, D // VIT_HEADS).transpose(1, 2, 0, 3)
    q, k, v = qkv[0], qkv[1], qkv[2]  # (H, T, hd)
    scale = (D // VIT_HEADS) ** -0.5
    attn = jax.nn.softmax(
        jnp.einsum("htd,hsd->hts", q, k,
                   preferred_element_type=jnp.float32) * scale,
        axis=-1,
    )
    out = jnp.einsum("hts,hsd->htd", attn, v,
                     preferred_element_type=jnp.float32)
    out = out.transpose(1, 0, 2).reshape(T, D)
    x = x + (out @ p["proj"]["w"] + p["proj"]["b"])
    h = _layer_norm(x, p["ln2"]["scale"], p["ln2"]["bias"])
    h = jax.nn.gelu(h @ p["mlp1"]["w"] + p["mlp1"]["b"], approximate=False)
    x = x + (h @ p["mlp2"]["w"] + p["mlp2"]["b"])
    return x


def _resize_pos_embed(pos_embed, gs_h, gs_w):
    """`DPT/dpt/vit.py:148-162`: bilinear-resize the grid part."""
    tok = pos_embed[:, :1]
    grid = pos_embed[0, 1:]
    gs_old = int(np.sqrt(grid.shape[0]))
    grid = grid.reshape(gs_old, gs_old, -1)
    grid = _resize_bilinear(grid, (gs_h, gs_w))
    grid = grid.reshape(1, gs_h * gs_w, -1)
    return jnp.concatenate([tok, grid], axis=1)


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

FEATURES = 256  # scratch width
REASSEMBLE = (256, 512, 768, 768)


def _init_rcu(key):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": _init_conv(k1, 3, 3, FEATURES, FEATURES),
        "conv2": _init_conv(k2, 3, 3, FEATURES, FEATURES),
    }


def _init_fusion(key):
    keys = jax.random.split(key, 3)
    return {
        "rcu1": _init_rcu(keys[0]),
        "rcu2": _init_rcu(keys[1]),
        "out_conv": _init_conv(keys[2], 1, 1, FEATURES, FEATURES),
    }


def init_dpt_params(key) -> dict:
    keys = jax.random.split(key, 31)
    params = {
        "resnet": _init_resnet(keys[0]),
        "patch_proj": _init_conv(keys[1], 1, 1, 1024, VIT_DIM),
        "cls_token": jnp.zeros((1, 1, VIT_DIM), jnp.float32),
        "pos_embed": jnp.zeros((1, 1 + VIT_GRID * VIT_GRID, VIT_DIM),
                               jnp.float32),
        "blocks": [_init_vit_block(keys[2 + i]) for i in range(VIT_BLOCKS)],
        "final_ln": _init_norm(VIT_DIM),
        "readout3": _init_linear(keys[14], 2 * VIT_DIM, VIT_DIM),
        "readout4": _init_linear(keys[15], 2 * VIT_DIM, VIT_DIM),
        "post3_conv": _init_conv(keys[16], 1, 1, VIT_DIM, REASSEMBLE[2]),
        "post4_conv1": _init_conv(keys[17], 1, 1, VIT_DIM, REASSEMBLE[3]),
        "post4_conv2": _init_conv(keys[18], 3, 3, REASSEMBLE[3], REASSEMBLE[3]),
        "scratch": {
            f"layer{i+1}_rn": _init_conv(keys[19 + i], 3, 3, REASSEMBLE[i],
                                         FEATURES, bias=False)
            for i in range(4)
        },
        "refinenet1": _init_fusion(keys[23]),
        "refinenet2": _init_fusion(keys[24]),
        "refinenet3": _init_fusion(keys[25]),
        "refinenet4": _init_fusion(keys[26]),
        "head": {
            "conv1": _init_conv(keys[27], 3, 3, FEATURES, FEATURES // 2),
            "conv2": _init_conv(keys[28], 3, 3, FEATURES // 2, 32),
            "conv3": _init_conv(keys[29], 1, 1, 32, 1),
        },
    }
    return params


def _apply_rcu(p, x):
    """ResidualConvUnit_custom (`DPT/dpt/blocks.py:289-314`, bn=False)."""
    h = jax.nn.relu(x)
    h = _conv(h, p["conv1"]["w"], p["conv1"]["b"])
    h = jax.nn.relu(h)
    h = _conv(h, p["conv2"]["w"], p["conv2"]["b"])
    return h + x


def _apply_fusion(p, x, res=None):
    """FeatureFusionBlock_custom (`DPT/dpt/blocks.py:318-383`)."""
    if res is not None:
        x = x + _apply_rcu(p["rcu1"], res)
    x = _apply_rcu(p["rcu2"], x)
    h, w = x.shape[0] * 2, x.shape[1] * 2
    x = _resize_bilinear_ac(x, (h, w))
    return _conv(x, p["out_conv"]["w"], p["out_conv"]["b"])


def apply_dpt(params, img, scale=0.000305, shift=0.1378, invert=True,
              non_negative=True):
    """One image (H, W, 3), H and W multiples of 32, DPT-normalised
    ((x-0.5)/0.5) -> depth (H, W).

    Mirrors `DPT/dpt/models.py:139-160, 203-212` end to end.
    """
    # Full f32 matmul precision for the WHOLE forward — not just the convs:
    # the 12 ViT blocks' qkv/attention/proj/mlp matmuls dominate the network
    # and would otherwise truncate activations to bf16 on TPU
    # (preferred_element_type only fixes accumulators, not inputs). The
    # reference computes these in f32 torch; the priors supervise all of
    # training, and this runs once, offline.
    with jax.default_matmul_precision("highest"):
        return _apply_dpt_f32(params, img, scale, shift, invert,
                              non_negative)


def _apply_dpt_f32(params, img, scale, shift, invert, non_negative):
    H, W = img.shape[:2]
    gh, gw = H // 16, W // 16

    # hybrid backbone
    tap1, tap2, feat = _apply_resnet(params["resnet"], img)
    tokens = _conv(feat, params["patch_proj"]["w"], params["patch_proj"]["b"])
    tokens = tokens.reshape(gh * gw, VIT_DIM)
    cls = params["cls_token"][0]
    x = jnp.concatenate([cls, tokens], axis=0)  # (1+T, D)
    pos = _resize_pos_embed(params["pos_embed"], gh, gw)[0]
    x = x + pos

    hook3 = hook4 = None
    for i, bp in enumerate(params["blocks"]):
        x = _apply_vit_block(bp, x)
        if i == 8:
            hook3 = x
        if i == 11:
            hook4 = x

    def _readout(tokens_full, rp):
        """ProjectReadout (`DPT/dpt/vit.py:79-90`): concat cls to every
        patch token, linear + GELU."""
        readout = jnp.broadcast_to(tokens_full[:1], tokens_full[1:].shape)
        feats = jnp.concatenate([tokens_full[1:], readout], axis=-1)
        out = feats @ rp["w"] + rp["b"]
        return jax.nn.gelu(out, approximate=False)

    l3 = _readout(hook3, params["readout3"]).reshape(gh, gw, VIT_DIM)
    l4 = _readout(hook4, params["readout4"]).reshape(gh, gw, VIT_DIM)
    l3 = _conv(l3, params["post3_conv"]["w"], params["post3_conv"]["b"])
    l4 = _conv(l4, params["post4_conv1"]["w"], params["post4_conv1"]["b"])
    # plain nn.Conv2d(3x3, stride=2, padding=1) (`DPT/dpt/vit.py:469-476`):
    # SYMMETRIC padding. TF-"SAME" at stride 2 on an even input pads (0, 1)
    # and shifts every window by one pixel — only the timm StdConv2dSame
    # convs in the ResNet stem/stages use SAME semantics.
    l4 = _conv(l4, params["post4_conv2"]["w"], params["post4_conv2"]["b"],
               stride=2, padding=((1, 1), (1, 1)))

    sc = params["scratch"]
    r1 = _conv(tap1, sc["layer1_rn"]["w"])
    r2 = _conv(tap2, sc["layer2_rn"]["w"])
    r3 = _conv(l3, sc["layer3_rn"]["w"])
    r4 = _conv(l4, sc["layer4_rn"]["w"])

    p4 = _apply_fusion(params["refinenet4"], r4)
    p3 = _apply_fusion(params["refinenet3"], p4, r3)
    p2 = _apply_fusion(params["refinenet2"], p3, r2)
    p1 = _apply_fusion(params["refinenet1"], p2, r1)

    h = _conv(p1, params["head"]["conv1"]["w"], params["head"]["conv1"]["b"])
    h = _resize_bilinear_ac(h, (h.shape[0] * 2, h.shape[1] * 2))
    h = jax.nn.relu(
        _conv(h, params["head"]["conv2"]["w"], params["head"]["conv2"]["b"])
    )
    h = _conv(h, params["head"]["conv3"]["w"], params["head"]["conv3"]["b"])
    inv_depth = jax.nn.relu(h[..., 0]) if non_negative else h[..., 0]

    if invert:
        depth = scale * inv_depth + shift
        depth = jnp.maximum(depth, 1e-8)
        return 1.0 / depth
    return inv_depth


def apply_dpt_batched(params, imgs, mesh=None, **kw):
    """(B, H, W, 3) -> (B, H, W); vmapped over frames.

    With ``mesh`` the frame axis is sharded over the chips (SURVEY.md §2.5's
    batched-frame parallelism for DPT preprocessing) — params replicated,
    each chip runs its frames independently.
    """
    if mesh is not None:
        from ..parallel.mesh import shard_rays

        imgs = shard_rays(imgs, mesh)
    return jax.vmap(lambda im: apply_dpt(params, im, **kw))(imgs)


def dpt_input_transform(img, target=384, multiple_of=32):
    """The reference's ``ResizeImage_mvs``: keep-aspect 'minimal' resize
    toward a 384x384 target rounded to multiples of 32 (INTER_CUBIC), then
    (x - 0.5)/0.5 normalisation (`dataloading/dataloading.py:80-100`,
    `DPT/dpt/transforms.py:103-158,195-216`).

    'minimal' means "scale as little as possible": of the two per-axis
    scales it keeps the one CLOSEST TO 1 (`transforms.py:125-132`) — the
    smaller (min) one when upscaling, but the LARGER one when the image is
    bigger than 384 (e.g. 540x960 -> fit height -> 384x672, not 224x384).
    Pinned against the executed reference in
    `tests/test_preprocess_reference_exec.py`.

    img: (H, W, 3) float numpy in [0, 1]. Returns (h', w', 3) numpy.
    """
    import cv2

    H, W = img.shape[:2]
    scale_h, scale_w = target / H, target / W
    scale = scale_w if abs(1 - scale_w) < abs(1 - scale_h) else scale_h
    # np.round (banker's) to match constrain_to_multiple_of exactly
    new_h = int(np.round(scale * H / multiple_of) * multiple_of)
    new_w = int(np.round(scale * W / multiple_of) * multiple_of)
    out = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_CUBIC)
    return ((out - 0.5) / 0.5).astype(np.float32)


def load_dpt(path):
    """Load a converted checkpoint (npz pytree from tools/convert_dpt.py)."""
    from ..training.checkpoints import load_pytree

    tree, _ = load_pytree(path)
    return jax.tree.map(jnp.asarray, tree["params"])
