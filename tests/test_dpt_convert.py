"""DPT weight-converter and layer-parity fixture tests (VERDICT r1 item 3).

torch-cpu is installed (no timm/torchvision), so:

* ``test_converter_roundtrip`` synthesizes a state_dict with the exact
  timm/DPT key layout and shapes of ``dpt_hybrid-midas-501f0c75.pt``
  (`DPT/dpt/vit.py:351-491`, `models.py:93-180` reference naming), runs
  `tools/convert_dpt.py`'s ``convert``, and asserts every key is consumed
  exactly once and the resulting pytree matches ``init_dpt_params`` leaf
  for leaf (structure + shapes), then round-trips through save/load_dpt
  and drives ``apply_dpt`` end to end with the converted weights.
* the ``TestLayerParity`` cases hand-roll the reference's torch building
  blocks (StdConv2dSame + GroupNorm bottleneck, pre-LN ViT block,
  ProjectReadout, FeatureFusionBlock_custom, monodepth head) in pure torch
  and assert the JAX primitives reproduce them to ~1e-5.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import sys, os  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_dpt import convert  # noqa: E402

from nope_nerf_tpu.models import dpt as jdpt  # noqa: E402


# ---------------------------------------------------------------------------
# checkpoint-layout synthesis
# ---------------------------------------------------------------------------

def synth_state_dict(rng):
    """Every key of dpt_hybrid-midas-501f0c75.pt with its exact shape
    (torch OIHW conv / (out, in) linear layouts)."""
    s = {}

    def add(k, *shape):
        s[k] = rng.normal(size=shape).astype(np.float32) * 0.05

    bb = "pretrained.model.patch_embed.backbone."
    add(bb + "stem.conv.weight", 64, 3, 7, 7)
    add(bb + "stem.norm.weight", 64)
    add(bb + "stem.norm.bias", 64)
    layers = (3, 4, 9)
    couts = (256, 512, 1024)
    cin = 64
    for si, (n, cout) in enumerate(zip(layers, couts)):
        cmid = cout // 4
        for bi in range(n):
            pre = f"{bb}stages.{si}.blocks.{bi}."
            c_in = cin if bi == 0 else cout
            add(pre + "conv1.weight", cmid, c_in, 1, 1)
            add(pre + "norm1.weight", cmid)
            add(pre + "norm1.bias", cmid)
            add(pre + "conv2.weight", cmid, cmid, 3, 3)
            add(pre + "norm2.weight", cmid)
            add(pre + "norm2.bias", cmid)
            add(pre + "conv3.weight", cout, cmid, 1, 1)
            add(pre + "norm3.weight", cout)
            add(pre + "norm3.bias", cout)
            if bi == 0:
                add(pre + "downsample.conv.weight", cout, c_in, 1, 1)
                add(pre + "downsample.norm.weight", cout)
                add(pre + "downsample.norm.bias", cout)
        cin = cout

    vm = "pretrained.model."
    add(vm + "patch_embed.proj.weight", 768, 1024, 1, 1)
    add(vm + "patch_embed.proj.bias", 768)
    add(vm + "cls_token", 1, 1, 768)
    add(vm + "pos_embed", 1, 577, 768)
    for i in range(12):
        pre = f"{vm}blocks.{i}."
        add(pre + "norm1.weight", 768)
        add(pre + "norm1.bias", 768)
        add(pre + "attn.qkv.weight", 2304, 768)
        add(pre + "attn.qkv.bias", 2304)
        add(pre + "attn.proj.weight", 768, 768)
        add(pre + "attn.proj.bias", 768)
        add(pre + "norm2.weight", 768)
        add(pre + "norm2.bias", 768)
        add(pre + "mlp.fc1.weight", 3072, 768)
        add(pre + "mlp.fc1.bias", 3072)
        add(pre + "mlp.fc2.weight", 768, 3072)
        add(pre + "mlp.fc2.bias", 768)
    add(vm + "norm.weight", 768)
    add(vm + "norm.bias", 768)

    for h in (3, 4):
        add(f"pretrained.act_postprocess{h}.0.project.0.weight", 768, 1536)
        add(f"pretrained.act_postprocess{h}.0.project.0.bias", 768)
    add("pretrained.act_postprocess3.3.weight", 768, 768, 1, 1)
    add("pretrained.act_postprocess3.3.bias", 768)
    add("pretrained.act_postprocess4.3.weight", 768, 768, 1, 1)
    add("pretrained.act_postprocess4.3.bias", 768)
    add("pretrained.act_postprocess4.4.weight", 768, 768, 3, 3)
    add("pretrained.act_postprocess4.4.bias", 768)

    reassemble = (256, 512, 768, 768)
    for i in (1, 2, 3, 4):
        add(f"scratch.layer{i}_rn.weight", 256, reassemble[i - 1], 3, 3)
    for r in (1, 2, 3, 4):
        pre = f"scratch.refinenet{r}."
        for u in (1, 2):
            for c in (1, 2):
                add(pre + f"resConfUnit{u}.conv{c}.weight", 256, 256, 3, 3)
                add(pre + f"resConfUnit{u}.conv{c}.bias", 256)
        add(pre + "out_conv.weight", 256, 256, 1, 1)
        add(pre + "out_conv.bias", 256)
    add("scratch.output_conv.0.weight", 128, 256, 3, 3)
    add("scratch.output_conv.0.bias", 128)
    add("scratch.output_conv.2.weight", 32, 128, 3, 3)
    add("scratch.output_conv.2.bias", 32)
    add("scratch.output_conv.4.weight", 1, 32, 1, 1)
    add("scratch.output_conv.4.bias", 1)
    return s


class _Tracking(dict):
    def __init__(self, base):
        super().__init__(base)
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return super().__getitem__(k)


def test_converter_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    state = _Tracking(synth_state_dict(rng))
    params = convert(state)

    # 1) every checkpoint tensor consumed
    unread = set(state.keys()) - state.read
    assert not unread, f"converter ignored checkpoint keys: {sorted(unread)[:8]}"

    # 2) structure + shapes identical to the model's own init, leaf for leaf
    ref = jdpt.init_dpt_params(jax.random.PRNGKey(0))
    ref_leaves, ref_tree = jax.tree.flatten(ref)
    got_leaves, got_tree = jax.tree.flatten(
        jax.tree.map(jnp.asarray, params)
    )
    assert ref_tree == got_tree, "converted pytree structure mismatch"
    for a, b in zip(got_leaves, ref_leaves):
        assert a.shape == b.shape, f"shape mismatch {a.shape} vs {b.shape}"

    # 3) save -> load_dpt round trip preserves values
    from nope_nerf_tpu.training.checkpoints import save_pytree

    path = str(tmp_path / "dpt.npz")
    save_pytree(path, {"params": params})
    loaded = jdpt.load_dpt(path)
    for a, b in zip(jax.tree.leaves(loaded), got_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # 4) the converted weights drive the real forward end to end
    img = jnp.asarray(rng.uniform(-1, 1, size=(96, 128, 3)), jnp.float32)
    depth = jdpt.apply_dpt(loaded, img)
    assert depth.shape == (96, 128)
    assert bool(jnp.all(jnp.isfinite(depth)))


# ---------------------------------------------------------------------------
# torch layer parity
# ---------------------------------------------------------------------------

def _t(x):
    return torch.from_numpy(np.asarray(x))


def _same_pad(x, kh, kw, stride):
    """TF 'SAME' padding (timm Conv2dSame semantics)."""
    ih, iw = x.shape[-2:]
    oh, ow = -(-ih // stride), -(-iw // stride)
    ph = max((oh - 1) * stride + kh - ih, 0)
    pw = max((ow - 1) * stride + kw - iw, 0)
    return F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))


def _torch_std_conv(x, w, stride=1):
    """timm StdConv2dSame: weight standardisation (unbiased=False, eps 1e-6)
    + SAME padding."""
    mean = w.mean(dim=(1, 2, 3), keepdim=True)
    var = w.var(dim=(1, 2, 3), unbiased=False, keepdim=True)
    w = (w - mean) / torch.sqrt(var + 1e-6)
    x = _same_pad(x, w.shape[2], w.shape[3], stride)
    return F.conv2d(x, w, stride=stride)


class TestFullComposition:
    """Tiny-config FULL-model parity vs a hand-rolled torch transcription of
    the reference composition (VERDICT r2 item 3): ViT dim 64 / 4 heads but
    the REAL 12 blocks (so the hybrid hook taps [8, 11] are exercised at
    their true indices — `DPT/dpt/vit.py:376-377`), 1-block ResNet stages,
    forward_flex pos-embed resize to a non-square grid, ProjectReadout,
    reassemble, the 4 fusion stages and the monodepth head with
    scale/shift/invert (`DPT/dpt/models.py:143-160, 203-212`).

    A transposed fusion stage, a wrong hook index, a shifted stride-2
    padding or a mis-ordered readout would all pass the per-layer tests yet
    fail here.
    """

    VD, HEADS = 64, 4
    RC = (128, 128, 128)   # all norm widths >= 32 -> GroupNorm(32, C) valid
    FEAT = 32
    REASSEMBLE = (128, 128, 64, 64)

    def _tiny_params(self, rng):
        A = lambda *s: (rng.normal(size=s).astype(np.float32) * 0.05)  # noqa: E731
        conv = lambda kh, kw, ci, co, bias=True: (  # noqa: E731
            {"w": A(kh, kw, ci, co), **({"b": A(co)} if bias else {})})
        norm = lambda c: {"scale": (1.0 + A(c)), "bias": A(c)}  # noqa: E731
        lin = lambda ci, co: {"w": A(ci, co), "b": A(co)}  # noqa: E731

        def bottleneck(ci, cmid, co):
            return {
                "conv1": conv(1, 1, ci, cmid, bias=False),
                "norm1": norm(cmid),
                "conv2": conv(3, 3, cmid, cmid, bias=False),
                "norm2": norm(cmid),
                "conv3": conv(1, 1, cmid, co, bias=False),
                "norm3": norm(co),
                "down_conv": conv(1, 1, ci, co, bias=False),
                "down_norm": norm(co),
            }

        VD, RC, FEAT, RA = self.VD, self.RC, self.FEAT, self.REASSEMBLE
        blocks = [
            {
                "ln1": norm(VD), "qkv": lin(VD, 3 * VD),
                "proj": lin(VD, VD), "ln2": norm(VD),
                "mlp1": lin(VD, 4 * VD), "mlp2": lin(4 * VD, VD),
            }
            for _ in range(12)
        ]
        return {
            "resnet": {
                "stem_conv": conv(7, 7, 3, 64, bias=False),
                "stem_norm": norm(64),
                "stages": [
                    [bottleneck(64, RC[0] // 4, RC[0])],
                    [bottleneck(RC[0], RC[1] // 4, RC[1])],
                    [bottleneck(RC[1], RC[2] // 4, RC[2])],
                ],
            },
            "patch_proj": conv(1, 1, RC[2], VD),
            "cls_token": A(1, 1, VD),
            "pos_embed": A(1, 1 + 24 * 24, VD),
            "blocks": blocks,
            "readout3": lin(2 * VD, VD),
            "readout4": lin(2 * VD, VD),
            "post3_conv": conv(1, 1, VD, RA[2]),
            "post4_conv1": conv(1, 1, VD, RA[3]),
            "post4_conv2": conv(3, 3, RA[3], RA[3]),
            "scratch": {
                f"layer{i+1}_rn": conv(3, 3, RA[i], FEAT, bias=False)
                for i in range(4)
            },
            **{
                f"refinenet{r}": {
                    "rcu1": {"conv1": conv(3, 3, FEAT, FEAT),
                             "conv2": conv(3, 3, FEAT, FEAT)},
                    "rcu2": {"conv1": conv(3, 3, FEAT, FEAT),
                             "conv2": conv(3, 3, FEAT, FEAT)},
                    "out_conv": conv(1, 1, FEAT, FEAT),
                }
                for r in (1, 2, 3, 4)
            },
            "head": {
                "conv1": conv(3, 3, FEAT, FEAT // 2),
                "conv2": conv(3, 3, FEAT // 2, 32),
                "conv3": conv(1, 1, 32, 1),
            },
        }

    # -- torch transcription of the reference composition ------------------

    @staticmethod
    def _tc(p, x, stride=1, std=False, padding=1):
        """JAX-layout conv params -> torch conv. ``std`` = StdConv2dSame
        (timm, TF SAME padding); else plain nn.Conv2d semantics with
        symmetric ``padding``."""
        w = _t(np.asarray(p["w"]).transpose(3, 2, 0, 1))
        b = _t(np.asarray(p["b"])) if "b" in p else None
        if std:
            mean = w.mean(dim=(1, 2, 3), keepdim=True)
            var = w.var(dim=(1, 2, 3), unbiased=False, keepdim=True)
            w = (w - mean) / torch.sqrt(var + 1e-6)
            x = _same_pad(x, w.shape[2], w.shape[3], stride)
            return F.conv2d(x, w, b, stride=stride)
        return F.conv2d(x, w, b, stride=stride,
                        padding=0 if w.shape[2] == 1 else padding)

    def _torch_forward(self, P, img_hwc, scale, shift):
        tc = self._tc

        def gn(x, p):
            return F.group_norm(x, 32, _t(np.asarray(p["scale"])),
                                _t(np.asarray(p["bias"])), eps=1e-5)

        def ln(x, p):
            return F.layer_norm(x, (x.shape[-1],),
                                _t(np.asarray(p["scale"])),
                                _t(np.asarray(p["bias"])), eps=1e-6)

        x = _t(img_hwc.transpose(2, 0, 1))[None]  # NCHW
        R = P["resnet"]
        h = F.relu(gn(tc(R["stem_conv"], x, stride=2, std=True),
                      R["stem_norm"]))
        h = F.max_pool2d(_same_pad(h.clone(), 3, 3, 2), 3, stride=2)
        taps = []
        for si, blocks in enumerate(R["stages"]):
            stride = 1 if si == 0 else 2
            for bi, bp in enumerate(blocks):
                s = stride if bi == 0 else 1
                sc = gn(tc(bp["down_conv"], h, stride=s, std=True),
                        bp["down_norm"])
                q = F.relu(gn(tc(bp["conv1"], h, std=True), bp["norm1"]))
                q = F.relu(gn(tc(bp["conv2"], q, stride=s, std=True),
                              bp["norm2"]))
                q = gn(tc(bp["conv3"], q, std=True), bp["norm3"])
                h = F.relu(q + sc)
            taps.append(h)
        tap1, tap2, feat = taps

        # forward_flex (`DPT/dpt/vit.py:164-201`)
        gh, gw = feat.shape[2], feat.shape[3]
        tok = tc(P["patch_proj"], feat).flatten(2).transpose(1, 2)  # (1,T,D)
        cls = _t(np.asarray(P["cls_token"]))
        xt = torch.cat([cls, tok], dim=1)
        pe = _t(np.asarray(P["pos_embed"]))
        pe_tok, pe_grid = pe[:, :1], pe[0, 1:]
        gs = int(np.sqrt(pe_grid.shape[0]))
        pe_grid = pe_grid.reshape(1, gs, gs, -1).permute(0, 3, 1, 2)
        pe_grid = F.interpolate(pe_grid, size=(gh, gw), mode="bilinear")
        pe_grid = pe_grid.permute(0, 2, 3, 1).reshape(1, gh * gw, -1)
        xt = xt + torch.cat([pe_tok, pe_grid], dim=1)

        hooks = {}
        D, H = self.VD, self.HEADS
        for i, bp in enumerate(P["blocks"]):
            q = ln(xt, bp["ln1"])
            T = q.shape[1]
            qkv = q @ _t(np.asarray(bp["qkv"]["w"])) + _t(
                np.asarray(bp["qkv"]["b"]))
            qkv = qkv.reshape(1, T, 3, H, D // H).permute(2, 0, 3, 1, 4)
            qq, kk, vv = qkv[0], qkv[1], qkv[2]
            attn = torch.softmax(
                qq @ kk.transpose(-1, -2) * (D // H) ** -0.5, -1)
            out = (attn @ vv).permute(0, 2, 1, 3).reshape(1, T, D)
            xt = xt + out @ _t(np.asarray(bp["proj"]["w"])) + _t(
                np.asarray(bp["proj"]["b"]))
            q = ln(xt, bp["ln2"])
            q = F.gelu(q @ _t(np.asarray(bp["mlp1"]["w"])) + _t(
                np.asarray(bp["mlp1"]["b"])))
            xt = xt + q @ _t(np.asarray(bp["mlp2"]["w"])) + _t(
                np.asarray(bp["mlp2"]["b"]))
            if i in (8, 11):
                hooks[i] = xt  # block OUTPUT, pre-final-norm

        def postprocess(tokens, rp):
            # ProjectReadout -> Transpose -> Unflatten (`vit.py:104-145`)
            t = tokens[0]
            readout = t[:1].expand(t.shape[0] - 1, -1)
            feats = torch.cat([t[1:], readout], dim=-1)
            proj = F.gelu(feats @ _t(np.asarray(rp["w"])) + _t(
                np.asarray(rp["b"])))
            return proj.transpose(0, 1).reshape(1, D, gh, gw)

        l3 = tc(P["post3_conv"], postprocess(hooks[8], P["readout3"]))
        l4 = tc(P["post4_conv1"], postprocess(hooks[11], P["readout4"]))
        # plain nn.Conv2d stride 2 padding 1 (`vit.py:469-476`) — symmetric,
        # NOT TF-SAME
        l4 = tc(P["post4_conv2"], l4, stride=2, padding=1)

        S = P["scratch"]
        r1 = tc(S["layer1_rn"], tap1)
        r2 = tc(S["layer2_rn"], tap2)
        r3 = tc(S["layer3_rn"], l3)
        r4 = tc(S["layer4_rn"], l4)

        def rcu(q, rp):
            h = tc(rp["conv1"], F.relu(q))
            h = tc(rp["conv2"], F.relu(h))
            return h + q

        def fusion(fp, x, res=None):
            if res is not None:
                x = x + rcu(res, fp["rcu1"])
            x = rcu(x, fp["rcu2"])
            x = F.interpolate(x, scale_factor=2, mode="bilinear",
                              align_corners=True)
            return tc(fp["out_conv"], x)

        p4 = fusion(P["refinenet4"], r4)
        p3 = fusion(P["refinenet3"], p4, r3)
        p2 = fusion(P["refinenet2"], p3, r2)
        p1 = fusion(P["refinenet1"], p2, r1)

        h = tc(P["head"]["conv1"], p1)
        h = F.interpolate(h, scale_factor=2, mode="bilinear",
                          align_corners=True)
        h = F.relu(tc(P["head"]["conv2"], h))
        h = tc(P["head"]["conv3"], h)
        inv = F.relu(h).squeeze(1).squeeze(0)
        depth = scale * inv + shift
        depth = torch.clamp(depth, min=1e-8)
        return (1.0 / depth).numpy()

    def test_full_model_parity(self, rng, monkeypatch):
        monkeypatch.setattr(jdpt, "VIT_DIM", self.VD)
        monkeypatch.setattr(jdpt, "VIT_HEADS", self.HEADS)
        P = self._tiny_params(rng)
        img = rng.uniform(-1, 1, size=(64, 96, 3)).astype(np.float32)
        scale, shift = 0.5, 0.1

        with torch.no_grad():
            want = self._torch_forward(P, img, scale, shift)
        got = np.asarray(
            jdpt.apply_dpt(jax.tree.map(jnp.asarray, P), jnp.asarray(img),
                           scale=scale, shift=shift)
        )
        assert got.shape == want.shape == (64, 96)
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


class TestLayerParity:
    def test_std_conv_group_norm_bottleneck(self, rng):
        """ResNetV2 bottleneck (timm, non-preact) torch vs JAX, stride 2 +
        downsample — exercises StdConv SAME padding and GroupNorm32."""
        cin, cmid, cout, hw = 32, 16, 64, 20
        x = rng.normal(size=(1, cin, hw, hw)).astype(np.float32)
        ws = {
            "conv1": rng.normal(size=(cmid, cin, 1, 1)).astype(np.float32),
            "conv2": rng.normal(size=(cmid, cmid, 3, 3)).astype(np.float32),
            "conv3": rng.normal(size=(cout, cmid, 1, 1)).astype(np.float32),
            "down": rng.normal(size=(cout, cin, 1, 1)).astype(np.float32),
        }
        norms = {
            k: (rng.normal(size=(c,)).astype(np.float32),
                rng.normal(size=(c,)).astype(np.float32))
            for k, c in (("n1", cmid), ("n2", cmid), ("n3", cout),
                         ("nd", cout))
        }

        def gn(x, sb, groups=32):
            return F.group_norm(x, min(groups, x.shape[1]), _t(sb[0]),
                                _t(sb[1]), eps=1e-5)

        stride = 2
        xt = _t(x)
        sc = gn(_torch_std_conv(xt, _t(ws["down"]), stride), norms["nd"])
        h = F.relu(gn(_torch_std_conv(xt, _t(ws["conv1"])), norms["n1"]))
        h = F.relu(gn(_torch_std_conv(h, _t(ws["conv2"]), stride), norms["n2"]))
        h = gn(_torch_std_conv(h, _t(ws["conv3"])), norms["n3"])
        want = F.relu(h + sc).numpy()[0].transpose(1, 2, 0)

        p = {
            "conv1": {"w": jnp.asarray(ws["conv1"].transpose(2, 3, 1, 0))},
            "norm1": {"scale": jnp.asarray(norms["n1"][0]),
                      "bias": jnp.asarray(norms["n1"][1])},
            "conv2": {"w": jnp.asarray(ws["conv2"].transpose(2, 3, 1, 0))},
            "norm2": {"scale": jnp.asarray(norms["n2"][0]),
                      "bias": jnp.asarray(norms["n2"][1])},
            "conv3": {"w": jnp.asarray(ws["conv3"].transpose(2, 3, 1, 0))},
            "norm3": {"scale": jnp.asarray(norms["n3"][0]),
                      "bias": jnp.asarray(norms["n3"][1])},
            "down_conv": {"w": jnp.asarray(ws["down"].transpose(2, 3, 1, 0))},
            "down_norm": {"scale": jnp.asarray(norms["nd"][0]),
                          "bias": jnp.asarray(norms["nd"][1])},
        }
        got = np.asarray(
            jdpt._apply_bottleneck(p, jnp.asarray(x[0].transpose(1, 2, 0)),
                                   stride)
        )
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_vit_block(self, rng):
        """Pre-LN ViT block (LN eps 1e-6, exact GELU, 12-head MHA)."""
        T, D, H = 26, 768, 12
        x = rng.normal(size=(T, D)).astype(np.float32) * 0.3
        p = jdpt._init_vit_block(jax.random.PRNGKey(1))
        got = np.asarray(jdpt._apply_vit_block(p, jnp.asarray(x)))

        xt = _t(x)
        ln1 = F.layer_norm(xt, (D,), _t(p["ln1"]["scale"]),
                           _t(p["ln1"]["bias"]), eps=1e-6)
        qkv = ln1 @ _t(np.asarray(p["qkv"]["w"])) + _t(p["qkv"]["b"])
        qkv = qkv.reshape(T, 3, H, D // H).permute(1, 2, 0, 3)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = torch.softmax(q @ k.transpose(-1, -2) * (D // H) ** -0.5, -1)
        out = (attn @ v).permute(1, 0, 2).reshape(T, D)
        xt = xt + out @ _t(np.asarray(p["proj"]["w"])) + _t(p["proj"]["b"])
        ln2 = F.layer_norm(xt, (D,), _t(p["ln2"]["scale"]),
                           _t(p["ln2"]["bias"]), eps=1e-6)
        h = F.gelu(ln2 @ _t(np.asarray(p["mlp1"]["w"])) + _t(p["mlp1"]["b"]))
        want = (xt + h @ _t(np.asarray(p["mlp2"]["w"])) + _t(p["mlp2"]["b"])).numpy()
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_project_readout(self, rng):
        """ProjectReadout (`DPT/dpt/vit.py:79-90`): cls concat + linear
        + exact GELU."""
        T, D = 10, 16
        toks = rng.normal(size=(T + 1, D)).astype(np.float32)
        w = rng.normal(size=(2 * D, D)).astype(np.float32)
        b = rng.normal(size=(D,)).astype(np.float32)

        readout = np.broadcast_to(toks[:1], (T, D))
        feats = _t(np.concatenate([toks[1:], readout], -1))
        want = F.gelu(feats @ _t(w) + _t(b)).numpy()

        full = jnp.asarray(toks)
        rd = jnp.broadcast_to(full[:1], full[1:].shape)
        f = jnp.concatenate([full[1:], rd], axis=-1)
        got = np.asarray(jax.nn.gelu(f @ jnp.asarray(w) + jnp.asarray(b),
                                     approximate=False))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_fusion_block(self, rng):
        """FeatureFusionBlock_custom (`DPT/dpt/blocks.py:318-383`): RCUs,
        x2 align_corners=True upsample, out conv."""
        C, hw = 256, 7
        x = rng.normal(size=(1, C, hw, hw)).astype(np.float32)
        res = rng.normal(size=(1, C, hw, hw)).astype(np.float32)
        p = jdpt._init_fusion(jax.random.PRNGKey(2))

        def t_rcu(q, rp):
            h = F.relu(q)
            w1 = _t(np.asarray(rp["conv1"]["w"]).transpose(3, 2, 0, 1))
            h = F.conv2d(h, w1, _t(rp["conv1"]["b"]), padding=1)
            h = F.relu(h)
            w2 = _t(np.asarray(rp["conv2"]["w"]).transpose(3, 2, 0, 1))
            h = F.conv2d(h, w2, _t(rp["conv2"]["b"]), padding=1)
            return h + q

        xt = _t(x) + t_rcu(_t(res), p["rcu1"])
        xt = t_rcu(xt, p["rcu2"])
        xt = F.interpolate(xt, scale_factor=2, mode="bilinear",
                           align_corners=True)
        wo = _t(np.asarray(p["out_conv"]["w"]).transpose(3, 2, 0, 1))
        want = F.conv2d(xt, wo, _t(p["out_conv"]["b"])).numpy()[0].transpose(1, 2, 0)

        got = np.asarray(
            jdpt._apply_fusion(p, jnp.asarray(x[0].transpose(1, 2, 0)),
                               jnp.asarray(res[0].transpose(1, 2, 0)))
        )
        np.testing.assert_allclose(got, want, atol=2e-4)
