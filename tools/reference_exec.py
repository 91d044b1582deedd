"""Execute the ACTUAL reference implementation on CPU for A/B parity.

Every parity claim in this repo used to rest on *transcription* — reading
`/root/reference/model/*.py` and re-deriving the math. This module turns that
into *executed evidence*: it imports the reference's own ``Trainer`` /
``Renderer`` / ``Loss`` stack (`model/training.py:14-378`,
`model/rendering.py:36-167`, `model/losses.py:16-218`) under torch-CPU,
shims the ~10 hard-coded ``.cuda()`` sites (`model/losses.py:84,162-194,254`,
`model/rendering.py:216,248,451-452`), and runs its real ``compute_loss`` /
``train_step`` on in-memory synthetic scenes so tests can assert per-term
loss and multi-step optimization-trajectory parity against this framework.

Stochasticity control (both sides must see identical draws):

* ray sampling — the reference draws ``torch.randperm(h*w)[:n]``
  (`model/training.py:257`); :func:`run_reference_steps` monkeypatches
  ``torch.randperm`` to replay caller-supplied index arrays, and the JAX side
  injects the same arrays via the trainer's ``batch['ray_idx']`` override;
* stratified z jitter — ``torch.rand`` inside ``sample_uniform``
  (`model/rendering.py:186-190`); disabled on both sides
  (``Renderer.forward`` wrapped with add_noise=False here,
  ``tpu.render_add_noise: False`` there). The density-head ``noise`` kwarg is
  accepted but unused by the reference (`model/official_nerf.py:69-76`), so
  nothing else is stochastic in the loss path.

The DPT package is stubbed (timm is absent and the frozen depth net is not
part of the loss path — training configs set ``depth.type: None`` and read
precomputed npz priors, `configs/Tanks/Ignatius.yaml:1-2`).
"""
from __future__ import annotations

import os
import sys
import types

import numpy as np

REFERENCE_DIR = os.environ.get("NOPE_NERF_REFERENCE", "/root/reference")

_ns = None


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_DIR, "model"))


def _is_cuda(dev) -> bool:
    return dev is not None and "cuda" in str(dev)


def load_reference():
    """Import the reference modules with CPU shims; returns a namespace.

    Idempotent (module-level cache) — the torch monkeypatches are
    process-global but harmless on a CPU-only torch build: ``.cuda()``
    becomes identity and ``Module.to('cuda')`` is rewritten to cpu.
    """
    global _ns
    if _ns is not None:
        return _ns
    if not reference_available():
        raise RuntimeError(f"reference not found at {REFERENCE_DIR}")
    import torch

    # ---- CPU shims for the reference's hard-coded CUDA usage ----------
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    _orig_to = torch.nn.Module.to

    def _to(self, *args, **kwargs):
        args = tuple("cpu" if _is_cuda(a) else a for a in args)
        if _is_cuda(kwargs.get("device")):
            kwargs["device"] = "cpu"
        return _orig_to(self, *args, **kwargs)

    torch.nn.Module.to = _to

    # ---- stub the DPT package (model/config.py imports it at top level) --
    if "DPT" not in sys.modules:
        dpt_pkg = types.ModuleType("DPT")
        dpt_sub = types.ModuleType("DPT.dpt")
        dpt_models = types.ModuleType("DPT.dpt.models")

        class DPTDepthModel:  # noqa: D401 - stub
            def __init__(self, *a, **k):
                raise RuntimeError(
                    "DPT stubbed for parity execution (timm not installed); "
                    "use nope_nerf_tpu.models.dpt instead"
                )

        dpt_models.DPTDepthModel = DPTDepthModel
        dpt_pkg.dpt = dpt_sub
        dpt_sub.models = dpt_models
        sys.modules["DPT"] = dpt_pkg
        sys.modules["DPT.dpt"] = dpt_sub
        sys.modules["DPT.dpt.models"] = dpt_models

    # APPEND (not prepend): the repo root also has top-level `evaluation/`
    # `vis/` `preprocess/` packages; only `model` / `dataloading` etc. —
    # names unique to the reference — should resolve from REFERENCE_DIR.
    if REFERENCE_DIR not in sys.path:
        sys.path.append(REFERENCE_DIR)

    import model.common as common

    # `transform_to_world` defaults device=torch.device("cuda")
    # (`model/common.py:113`); the default identity world/scale mats are
    # constructed ON that device when the trainer's point-cloud branch calls
    # it 3-arg (`model/training.py:322-323`). Rewrite the default in place —
    # the function object is shared with `model.training`'s from-import.
    common.transform_to_world.__defaults__ = tuple(
        torch.device("cpu") if _is_cuda(d) else d
        for d in common.transform_to_world.__defaults__
    )

    import model.distortions as distortions
    import model.intrinsics as intrinsics
    import model.losses as losses
    import model.network as network
    import model.official_nerf as official_nerf
    import model.poses as poses
    import model.rendering as rendering
    import model.training as training

    _ns = types.SimpleNamespace(
        torch=torch,
        common=common,
        losses=losses,
        network=network,
        official_nerf=official_nerf,
        poses=poses,
        intrinsics=intrinsics,
        distortions=distortions,
        rendering=rendering,
        training=training,
    )
    return _ns


def load_reference_dataset_module():
    """Load the reference's ``dataloading/dataset.py`` (DataField) without
    importing its package ``__init__`` (which drags torchvision, absent in
    this image). ``common.py`` is loaded by file path first, with the
    legacy-imageio ``ignoregamma`` kwarg shimmed away (the reference pins
    imageio < 2.16, `environment.yaml:20`; modern imageio removed the kwarg
    and never applies gAMA correction, so dropping it preserves behavior).

    Returns (common_module, dataset_module)."""
    import importlib.util

    load_reference()
    cpath = os.path.join(REFERENCE_DIR, "dataloading", "common.py")
    cspec = importlib.util.spec_from_file_location("ref_dl_common", cpath)
    common = importlib.util.module_from_spec(cspec)
    cspec.loader.exec_module(common)
    real_imread = common.imageio.imread

    def _imread(f, **kw):
        kw.pop("ignoregamma", None)
        return real_imread(f, **kw)

    common.imageio = types.SimpleNamespace(imread=_imread)

    # satisfy dataset.py's `from dataloading.common import ...` without
    # executing the real package __init__
    pkg = types.ModuleType("dataloading")
    pkg.common = common
    saved = {k: sys.modules.get(k)
             for k in ("dataloading", "dataloading.common")}
    sys.modules["dataloading"] = pkg
    sys.modules["dataloading.common"] = common
    try:
        dpath = os.path.join(REFERENCE_DIR, "dataloading", "dataset.py")
        dspec = importlib.util.spec_from_file_location("ref_dl_dataset",
                                                       dpath)
        dataset = importlib.util.module_from_spec(dspec)
        dspec.loader.exec_module(dataset)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return common, dataset


def build_reference_stack(cfg, scene, *, seed=42, perturb=0.0,
                          deterministic_z=True):
    """Construct the reference's full training stack on CPU.

    Mirrors `train.py:48-160`: OfficialStaticNerf + Renderer + nope_nerf
    wrapper, LearnPose/LearnFocal/Learn_Distortion (gt-focal init
    ``[K00, -K11]``, `train.py:136`), four Adams, Trainer.

    Args:
        cfg: THIS framework's full config dict (schema-compatible with the
            reference's by design — §5.6).
        scene: a SyntheticScene / SceneData duck-type.
        perturb: std of a gaussian perturbation applied to the pose/
            distortion/focal parameters (zero-init poses make the dist
            losses non-differentiable in torch — `model/losses.py:103-112`
            norm at 0 — and leave swap/clamp branches unexercised).
        deterministic_z: wrap ``Renderer.forward`` to force add_noise=False
            (see module docstring).
    """
    ref = load_reference()
    torch = ref.torch
    torch.manual_seed(seed)
    device = torch.device("cpu")

    field = ref.official_nerf.OfficialStaticNerf(cfg)
    renderer = ref.rendering.Renderer(field, cfg["rendering"], device=device)
    if deterministic_z:
        inner = renderer.forward

        def _det_forward(pixels, depth, camera_mat, world_mat, scale_mat,
                         technique, add_noise=True, eval_=False, it=1000000):
            return inner(pixels, depth, camera_mat, world_mat, scale_mat,
                         technique, add_noise=False, eval_=eval_, it=it)

        renderer.forward = _det_forward
    net = ref.network.nope_nerf(cfg, renderer, None, device)

    n_views = scene.N_imgs
    pcfg = cfg["pose"]
    init_pose = None
    if pcfg["learn_pose"] and pcfg["init_pose"]:
        src = (scene.c2ws if pcfg["init_pose_type"] == "gt"
               else scene.c2ws_colmap)
        init_pose = torch.tensor(np.asarray(src), dtype=torch.float32)
    pose_net = ref.poses.LearnPose(
        n_views, pcfg["learn_R"], pcfg["learn_t"], cfg, init_c2w=init_pose
    )
    # honor learn_focal: with it off the reference's Trainer takes
    # optimizer_focal=None and falls back to camera_mat_gt
    # (`model/training.py:250-253`) — constructing a (perturbed) focal net
    # unconditionally would silently diverge from a gt-K run on our side
    if pcfg["learn_focal"]:
        if pcfg["init_focal_type"] == "gt":
            init_focal = [float(scene.K[0, 0]), float(-scene.K[1, 1])]
        else:
            init_focal = None
        focal_net = ref.intrinsics.LearnFocal(
            pcfg["update_focal"], pcfg["fx_only"], order=pcfg["focal_order"],
            init_focal=init_focal,
        )
    else:
        focal_net = None
    dist_net = ref.distortions.Learn_Distortion(
        n_views, cfg["distortion"]["learn_scale"],
        cfg["distortion"]["learn_shift"], cfg,
    )

    if perturb:
        g = torch.Generator().manual_seed(seed + 1)
        with torch.no_grad():
            pose_net.r.add_(perturb * torch.randn(pose_net.r.shape,
                                                  generator=g))
            pose_net.t.add_(perturb * torch.randn(pose_net.t.shape,
                                                  generator=g))
            dist_net.global_scales.add_(
                perturb * torch.randn(dist_net.global_scales.shape,
                                      generator=g))
            dist_net.global_shifts.add_(
                perturb * torch.randn(dist_net.global_shifts.shape,
                                      generator=g))
            if focal_net is not None:
                focal_net.fx.add_(perturb * torch.randn((), generator=g))
                if hasattr(focal_net, "fy"):
                    focal_net.fy.add_(
                        perturb * torch.randn((), generator=g))

    tcfg = cfg["training"]
    import torch.optim as optim

    optimizer = optim.Adam(net.parameters(), lr=tcfg["learning_rate"],
                           weight_decay=tcfg["weight_decay"])
    optimizer_pose = optim.Adam(pose_net.parameters(), lr=tcfg["pose_lr"])
    optimizer_focal = (
        optim.Adam(focal_net.parameters(), lr=tcfg["focal_lr"])
        if focal_net is not None else None
    )
    optimizer_distortion = optim.Adam(dist_net.parameters(),
                                      lr=tcfg["distortion_lr"])
    trainer = ref.training.Trainer(
        net, optimizer, tcfg, device=device,
        optimizer_pose=optimizer_pose, pose_param_net=pose_net,
        optimizer_focal=optimizer_focal, focal_net=focal_net,
        optimizer_distortion=optimizer_distortion, distortion_net=dist_net,
    )
    return types.SimpleNamespace(
        trainer=trainer, net=net, field=field, pose_net=pose_net,
        focal_net=focal_net, dist_net=dist_net, renderer=renderer,
        optimizers=(optimizer, optimizer_pose, optimizer_focal,
                    optimizer_distortion),
    )


def stack_params_to_jax(stack, cfg, scene=None):
    """Reference module state -> this framework's 4-group param pytree.

    Uses the same layer mapping as tools/convert_reference_ckpt.py (torch
    Linear (out, in) weights transposed to (in, out)).  When the stack has
    no focal net (learn_focal False), ``scene`` supplies the gt intrinsics
    for the focal group our ``build_params`` always carries."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from convert_reference_ckpt import _NERF_LAYER_MAP

    sd = stack.field.state_dict()
    nerf = {
        ours: {
            "w": np.asarray(sd[f"{ref}.weight"].detach()).T.copy(),
            "b": np.asarray(sd[f"{ref}.bias"].detach()).copy(),
        }
        for ref, ours in _NERF_LAYER_MAP.items()
    }
    params = {
        "nerf": nerf,
        "pose": {
            "r": np.asarray(stack.pose_net.r.detach()).copy(),
            "t": np.asarray(stack.pose_net.t.detach()).copy(),
        },
        "distortion": {
            "scales": np.asarray(
                stack.dist_net.global_scales.detach()).copy(),
            "shifts": np.asarray(
                stack.dist_net.global_shifts.detach()).copy(),
        },
    }
    if stack.focal_net is not None:
        params["focal"] = {
            "fx": np.asarray(stack.focal_net.fx.detach()).copy()}
        if hasattr(stack.focal_net, "fy"):
            params["focal"]["fy"] = np.asarray(
                stack.focal_net.fy.detach()).copy()
    else:
        from nope_nerf_tpu.models.intrinsics import init_focal_params

        init_focal = None
        if cfg["pose"]["init_focal_type"] == "gt" and scene is not None:
            init_focal = [scene.K[0, 0], -scene.K[1, 1]]
        params["focal"] = init_focal_params(
            cfg["pose"]["fx_only"], cfg["pose"]["focal_order"], init_focal)
    return params


def make_torch_batch(scene, idx, ref_idx):
    """A DataField-shaped batch dict (`dataloading/dataset.py:204-226`)."""
    ref = load_reference()
    torch = ref.torch
    img = torch.tensor(scene.imgs[idx]).permute(2, 0, 1).unsqueeze(0)
    dpt = torch.tensor(scene.dpt_depth[idx]).unsqueeze(0)
    ref_img = torch.tensor(scene.imgs[ref_idx]).permute(2, 0, 1).unsqueeze(0)
    ref_dpt = torch.tensor(scene.dpt_depth[ref_idx]).unsqueeze(0)
    return {
        "img": img,
        "img.idx": torch.tensor(idx),
        "img.dpt": dpt,
        "img.camera_mat": torch.tensor(scene.K).unsqueeze(0),
        "img.scale_mat": torch.tensor(scene.scale_mat).unsqueeze(0),
        "img.ref_imgs": ref_img,
        "img.ref_dpts": ref_dpt,
        "img.ref_idxs": torch.tensor(ref_idx),
    }


class replay_randperm:
    """Context manager: ``torch.randperm`` replays the given index arrays.

    The reference samples rays as ``randperm(h*w)[:n]``
    (`model/training.py:257`); replaying full permutations whose first n
    entries are the target indices makes its ray draw exactly controllable.
    """

    def __init__(self, perms):
        self.perms = [np.asarray(p) for p in perms]
        self.calls = 0

    def __enter__(self):
        ref = load_reference()
        torch = ref.torch
        self._orig = torch.randperm
        outer = self

        def fake_randperm(n, *a, **k):
            p = outer.perms[outer.calls % len(outer.perms)]
            outer.calls += 1
            full = np.concatenate(
                [p, np.setdiff1d(np.arange(n), p, assume_unique=False)]
            )
            assert full.shape[0] == n, (full.shape, n)
            return torch.tensor(full, dtype=torch.long)

        torch.randperm = fake_randperm
        return self

    def __exit__(self, *exc):
        load_reference().torch.randperm = self._orig
        return False


def reference_loss_dict(stack, batch, *, it, epoch, scheduling_start,
                        ray_idx=None):
    """One ``Trainer.compute_loss`` forward; returns {term: float}."""
    ref = load_reference()
    torch = ref.torch

    def _run():
        with torch.no_grad():
            ld = stack.trainer.compute_loss(
                batch, it=it, epoch=epoch, scheduling_start=scheduling_start
            )
        return {k: float(v) for k, v in ld.items()
                if hasattr(v, "numel") and v.numel() == 1}

    if ray_idx is not None:
        with replay_randperm([ray_idx]):
            return _run()
    return _run()


def run_reference_steps(stack, scene, *, frame_seq, ref_seq, ray_perms,
                        epoch_seq, scheduling_start, it0=1):
    """N real ``Trainer.train_step`` calls; returns per-step loss dicts."""
    out = []
    with replay_randperm(ray_perms) as rp:
        for i, (idx, ref_idx) in enumerate(zip(frame_seq, ref_seq)):
            batch = make_torch_batch(scene, int(idx), int(ref_idx))
            ld = stack.trainer.train_step(
                batch, it0 + i, int(epoch_seq[i]), scheduling_start, None
            )
            out.append({k: float(v) for k, v in ld.items()
                        if hasattr(v, "numel") and v.numel() == 1})
    assert rp.calls == len(frame_seq)
    return out

# ---------------------------------------------------------------------------
# Whole-CLI execution: the reference's train.py run end-to-end (L7/L6 A/B)
# ---------------------------------------------------------------------------

def _install_torchvision_stub():
    """torchvision is absent in this image; the reference only touches
    ``transforms.Compose`` (`dataloading/dataloading.py:8,84`,
    `DPT/dpt/models.py:9`) — a minimal callable-chain class."""
    if "torchvision" in sys.modules:
        return

    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")

    class Compose:
        def __init__(self, fns):
            self.fns = list(fns)

        def __call__(self, x):
            for f in self.fns:
                x = f(x)
            return x

    tvt.Compose = Compose
    tv.transforms = tvt
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tvt


_dpt_ns = None


def load_reference_dpt():
    """Import the reference's REAL DPT package so its ViT-hybrid depth net
    (`DPT/dpt/models.py:93-212`, `vit.py:103-377`, `blocks.py`) can be
    EXECUTED on CPU — the one reference surface every prior round could only
    transcribe (timm is not installed).

    ``tools/timm_stub.py`` supplies an executable from-scratch
    ``timm.create_model('vit_base_resnet50_384')`` with timm's module tree
    and semantics; the real ``DPT/dpt`` package is then loaded by file path
    (the reference has no ``DPT/__init__.py``) and REPLACES the inert raiser
    stub :func:`load_reference` grafts for the non-DPT parity tests.

    Returns the executed ``DPT.dpt.models`` module (``DPTDepthModel`` etc.).
    """
    global _dpt_ns
    if _dpt_ns is not None:
        return _dpt_ns
    import importlib.util

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    try:
        import timm_stub
    finally:
        sys.path.pop(0)
    timm_stub.install()

    load_reference()  # CPU shims (+ the raiser stub, replaced below)
    _install_torchvision_stub()

    sub_dir = os.path.join(REFERENCE_DIR, "DPT", "dpt")
    pkg = types.ModuleType("DPT")
    pkg.__path__ = [os.path.join(REFERENCE_DIR, "DPT")]
    spec = importlib.util.spec_from_file_location(
        "DPT.dpt", os.path.join(sub_dir, "__init__.py"),
        submodule_search_locations=[sub_dir])
    sub = importlib.util.module_from_spec(spec)
    # graft BEFORE exec so the submodules' relative imports resolve
    for k in ("DPT", "DPT.dpt", "DPT.dpt.models", "DPT.dpt.vit",
              "DPT.dpt.blocks", "DPT.dpt.base_model", "DPT.dpt.transforms"):
        sys.modules.pop(k, None)
    sys.modules["DPT"] = pkg
    sys.modules["DPT.dpt"] = sub
    pkg.dpt = sub
    spec.loader.exec_module(sub)

    import DPT.dpt.models as dpt_models

    # `model/config.py:2` binds DPTDepthModel at ITS import time; if the
    # reference `model` package was imported before this loader ran (it is —
    # load_reference() above), rebind the raiser class to the real one so
    # `get_model` builds an executable depth_estimator.
    mc = sys.modules.get("model.config")
    if mc is not None:
        mc.DPTDepthModel = dpt_models.DPTDepthModel

    _dpt_ns = dpt_models
    return _dpt_ns


_train_ns = None


def load_reference_train():
    """Import the reference's REAL ``dataloading`` package and its
    ``train.py`` (by file path) so the whole training CLI — dataloader
    factory, stack construction, epoch loop, auto-scheduler / MultiStepLR
    scheduling, checkpoint cadence (`train.py:18-352`) — can be executed
    as-is on CPU.

    Stubs grafted first (all inert for ``depth.type: None`` configs):

    * ``torchvision`` is absent in this image; the package only touches
      ``transforms.Compose`` (`dataloading/dataloading.py:8,84`), stubbed
      with a minimal callable-chain class;
    * the REAL ``DPT/dpt/transforms.py`` (numpy/cv2-only) is loaded by file
      path into the stub DPT package — ``ResizeImage_mvs`` CONSTRUCTS
      Resize/NormalizeImage/PrepareForNet unconditionally
      (`dataloading/dataloading.py:59,80-100`) but never calls them when
      ``use_DPT`` is False;
    * ``dataloading.common.imageio.imread`` gets the same
      legacy-``ignoregamma`` shim as :func:`load_reference_dataset_module`
      (the reference pins imageio<2.16, `environment.yaml:20`).

    Returns (train_module, dataloading_module).
    """
    global _train_ns
    if _train_ns is not None:
        return _train_ns
    import importlib.util

    load_reference()
    _install_torchvision_stub()

    dpt_sub = sys.modules["DPT.dpt"]
    if not hasattr(dpt_sub, "transforms"):
        tpath = os.path.join(REFERENCE_DIR, "DPT", "dpt", "transforms.py")
        tspec = importlib.util.spec_from_file_location(
            "DPT.dpt.transforms", tpath)
        tmod = importlib.util.module_from_spec(tspec)
        tspec.loader.exec_module(tmod)
        dpt_sub.transforms = tmod
        sys.modules["DPT.dpt.transforms"] = tmod

    import dataloading as dl
    import dataloading.common as dcommon

    if not getattr(dcommon, "_ignoregamma_shimmed", False):
        real_imread = dcommon.imageio.imread

        def _imread(f, **kw):
            kw.pop("ignoregamma", None)
            return real_imread(f, **kw)

        dcommon.imageio = types.SimpleNamespace(imread=_imread)
        dcommon._ignoregamma_shimmed = True

    tpath = os.path.join(REFERENCE_DIR, "train.py")
    tspec = importlib.util.spec_from_file_location("ref_train_cli", tpath)
    train_mod = importlib.util.module_from_spec(tspec)
    tspec.loader.exec_module(train_mod)

    _train_ns = (train_mod, dl)
    return _train_ns


_lpips_dicts = {}


def set_lpips_synth(vgg_sd, lin_sd):
    """Register state dicts (torchvision ``vgg16.features`` layout + lpips
    ``lin{i}.model.1.weight`` heads) for the ``lpips`` stub below.  The pip
    package is absent in this image, so executed-A/B tests synthesize the
    weights (tests/test_lpips_convert.py layout) and register them here;
    the SAME dicts flow through tools/convert_lpips.py to our JAX port."""
    _lpips_dicts["vgg"] = vgg_sd
    _lpips_dicts["lin"] = lin_sd


def _install_lpips_stub():
    """Graft a ``lpips`` module exposing the one surface the reference
    uses: ``lpips.LPIPS(net='vgg')`` called as ``fn(img0_nchw, img1_nchw,
    normalize=True)`` (`evaluation/eval.py:17,157`,
    `model/eval_images.py:95-97`).  Forward mirrors the pip package's
    net='vgg' semantics — ScalingLayer shift/scale, unit-normalised conv
    taps, squared diffs, non-negative 1x1 heads, spatial average, tap sum
    — with the eps-inside-sqrt normalisation convention shared by our JAX
    port (`nope_nerf_tpu/models/lpips.py:82-83`) and the independent torch
    mirror in tests/test_lpips_convert.py."""
    if "lpips" in sys.modules:
        return
    ref = load_reference()
    torch = ref.torch
    import torch.nn.functional as F

    class LPIPS(torch.nn.Module):
        def __init__(self, net="vgg", **kw):
            super().__init__()
            assert net == "vgg", "stub implements the reference's net='vgg'"
            if "vgg" not in _lpips_dicts:
                raise RuntimeError(
                    "lpips is stubbed for reference execution; call "
                    "reference_exec.set_lpips_synth(vgg_sd, lin_sd) first")
            vgg_sd, lin_sd = _lpips_dicts["vgg"], _lpips_dicts["lin"]
            idx = sorted(int(k.split(".")[0]) for k in vgg_sd
                         if k.endswith(".weight"))
            self._convs = [
                (torch.from_numpy(np.asarray(vgg_sd[f"{i}.weight"])),
                 torch.from_numpy(np.asarray(vgg_sd[f"{i}.bias"])))
                for i in idx
            ]
            self._lins = [
                torch.from_numpy(
                    np.maximum(np.asarray(lin_sd[f"lin{i}.model.1.weight"]),
                               0.0))
                for i in range(5)
            ]
            self._shift = torch.tensor([-0.030, -0.088, -0.188]).view(
                1, 3, 1, 1)
            self._scale = torch.tensor([0.458, 0.448, 0.450]).view(
                1, 3, 1, 1)

        def _feats(self, x):
            x = (x - self._shift) / self._scale
            taps, ci = [], 0
            for bi, n in enumerate((2, 2, 3, 3, 3)):
                for _ in range(n):
                    w, b = self._convs[ci]
                    x = F.relu(F.conv2d(x, w, b, padding=1))
                    ci += 1
                taps.append(x)
                if bi < 4:
                    x = F.max_pool2d(x, 2)
            return taps

        def forward(self, in0, in1, normalize=False):
            if normalize:  # [0,1] -> [-1,1], the lpips package's knob
                in0 = 2.0 * in0 - 1.0
                in1 = 2.0 * in1 - 1.0
            total = 0.0
            for i, (a, b) in enumerate(zip(self._feats(in0),
                                           self._feats(in1))):
                n0 = a / torch.sqrt((a**2).sum(1, keepdim=True) + 1e-10)
                n1 = b / torch.sqrt((b**2).sum(1, keepdim=True) + 1e-10)
                total = total + F.conv2d((n0 - n1) ** 2,
                                         self._lins[i]).mean(
                    dim=(1, 2, 3), keepdim=True)
            return total  # (N,1,1,1), .item()-able at N=1 like the package

    mod = types.ModuleType("lpips")
    mod.LPIPS = LPIPS
    sys.modules["lpips"] = mod


_eval_mod = None


def load_reference_eval():
    """Load the reference's ``evaluation/eval.py`` by file path (the name
    ``evaluation`` belongs to OUR CLI package at the repo root) with the
    train-CLI graft set (real ``dataloading`` package, torchvision/DPT/
    imageio shims) plus the ``lpips`` stub, so the whole image-evaluation
    CLI (`evaluation/eval.py:23-209`) can be executed as-is on CPU."""
    global _eval_mod
    if _eval_mod is not None:
        return _eval_mod
    import importlib.util

    load_reference_train()
    _install_lpips_stub()
    # skimage is absent in this environment and UNUSED inside
    # `model/eval_images.py` (imported at line 11, never referenced)
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        sk.metrics = types.ModuleType("skimage.metrics")
        sys.modules["skimage"] = sk
        sys.modules["skimage.metrics"] = sk.metrics
    epath = os.path.join(REFERENCE_DIR, "evaluation", "eval.py")
    espec = importlib.util.spec_from_file_location("ref_eval_cli", epath)
    emod = importlib.util.module_from_spec(espec)
    espec.loader.exec_module(emod)
    _eval_mod = emod
    return emod


def run_reference_eval_cli(cfg):
    """Execute the reference's ``eval(cfg)`` end-to-end and return its
    observable behavior:

    * ``images`` — the full-precision per-image dict from every REAL
      ``Eval_Images.eval_images`` call (mse/psnr/ssim/lpips, the uint8
      artifacts, the masked depth arrays);
    * ``scalars`` — tensorboard scalars (``opt/psnr`` per pose-opt epoch);
    * ``videos`` — ``(path, frames, kwargs)`` captured from its
      ``imageio.mimwrite`` call (imageio-ffmpeg is absent in this image;
      this one write is shimmed — everything upstream runs for real);
    * ``stdout`` — the printed means, LaTeX rows and depth table.
    """
    emod = load_reference_eval()
    import io as _io
    from contextlib import redirect_stdout

    import model.eval_images as ref_ei

    images = []
    orig_eval_images = ref_ei.Eval_Images.eval_images

    def spy_eval_images(self, *a, **k):
        out = orig_eval_images(self, *a, **k)
        images.append(out)
        return out

    videos = []
    rec = ScalarRecorder()
    orig_writer = emod.SummaryWriter
    orig_imageio = emod.imageio
    ref_ei.Eval_Images.eval_images = spy_eval_images
    emod.SummaryWriter = lambda *a, **k: rec
    emod.imageio = types.SimpleNamespace(
        mimwrite=lambda path, frames, **k: videos.append(
            (path, np.asarray(frames), k)))
    buf = _io.StringIO()
    try:
        with redirect_stdout(buf):
            emod.eval(cfg)
    finally:
        ref_ei.Eval_Images.eval_images = orig_eval_images
        emod.SummaryWriter = orig_writer
        emod.imageio = orig_imageio
    return types.SimpleNamespace(images=images, scalars=rec.tags,
                                 videos=videos, stdout=buf.getvalue())


def run_reference_render_cli(cfg_path):
    """Execute the reference's ``vis/render.py`` — a module-level script
    (`vis/render.py:16-118`) — end-to-end and return
    ``namespace(videos, stdout)`` where ``videos`` collects every
    ``imageio.mimwrite`` call as ``(path, frames, kwargs)`` (ffmpeg is
    absent; the two video writes are the only shim — the checkpoint
    restore, render-mode dataloader, trajectory dispatch and per-frame
    ``Extract_Images.generate_images`` artifact writes all run for
    real)."""
    import importlib.util
    import io as _io
    from contextlib import redirect_stdout

    import imageio

    load_reference_train()
    videos = []
    old_argv, old_cwd = sys.argv, os.getcwd()
    orig_mimwrite = imageio.mimwrite
    sys.argv = ["render.py", cfg_path]
    os.chdir(REFERENCE_DIR)
    imageio.mimwrite = lambda path, frames, **k: videos.append(
        (path, np.asarray(frames), k))
    buf = _io.StringIO()
    try:
        rpath = os.path.join(REFERENCE_DIR, "vis", "render.py")
        rspec = importlib.util.spec_from_file_location(
            "ref_render_cli", rpath)
        rmod = importlib.util.module_from_spec(rspec)
        with redirect_stdout(buf):
            rspec.loader.exec_module(rmod)
    finally:
        sys.argv = old_argv
        os.chdir(old_cwd)
        imageio.mimwrite = orig_mimwrite
    return types.SimpleNamespace(videos=videos, stdout=buf.getvalue())


def run_reference_preprocess_cli(cfg, depth_save_dir):
    """Execute the reference's ``preprocess/dpt_depth.py`` CLI body — the
    real ``dpt_depth(cfg, depth_save_dir)`` (`preprocess/dpt_depth.py:13-47`):
    it builds the full reference stack (OfficialStaticNerf + Renderer +
    ``get_model`` with the EXECUTED DPTDepthModel via
    :func:`load_reference_dpt`), iterates ``get_dataloader(mode='all')``
    with ``use_DPT`` transforms, and writes ``depth_<name>.npz`` +
    ``<name>.png`` artifacts. Returns the list of files written."""
    import importlib.util

    load_reference_train()
    load_reference_dpt()

    old_cwd = os.getcwd()
    os.chdir(REFERENCE_DIR)
    try:
        ppath = os.path.join(REFERENCE_DIR, "preprocess", "dpt_depth.py")
        spec = importlib.util.spec_from_file_location(
            "ref_preprocess_cli", ppath)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)  # defs only; __main__ guard inert
        mod.dpt_depth(cfg, depth_save_dir)
    finally:
        os.chdir(old_cwd)
    return sorted(os.listdir(depth_save_dir))


def run_reference_eval_poses_cli(cfg_path):
    """Execute the reference's ``evaluation/eval_poses.py`` — a
    module-LEVEL script, not a function (`evaluation/eval_poses.py:16-79`)
    — without ``--vis`` and return its stdout (the
    ``rpe_t*100 &rpe_r_deg & ate`` LaTeX row).

    The script parses ``sys.argv`` and resolves ``configs/default.yaml``
    relative to the cwd at import time, so both are swapped for the exec;
    its open3d import is already guarded upstream
    (`utils_poses/vis_cam_traj.py:5-8`)."""
    import importlib.util
    import io as _io
    from contextlib import redirect_stdout

    load_reference_train()
    old_argv, old_cwd = sys.argv, os.getcwd()
    sys.argv = ["eval_poses.py", cfg_path]
    os.chdir(REFERENCE_DIR)
    buf = _io.StringIO()
    try:
        ppath = os.path.join(REFERENCE_DIR, "evaluation", "eval_poses.py")
        pspec = importlib.util.spec_from_file_location(
            "ref_eval_poses_cli", ppath)
        pmod = importlib.util.module_from_spec(pspec)
        with redirect_stdout(buf):
            pspec.loader.exec_module(pmod)
    finally:
        sys.argv = old_argv
        os.chdir(old_cwd)
    return buf.getvalue()


class ScalarRecorder:
    """``SummaryWriter`` stand-in: records every ``add_scalar`` call as
    ``tags[tag] = [(step, value), ...]`` (train.py only calls add_scalar)."""

    def __init__(self, *a, **k):
        self.tags = {}

    def add_scalar(self, tag, value, step):
        self.tags.setdefault(tag, []).append((int(step), float(value)))

    def close(self):
        pass


def run_reference_train_cli(cfg):
    """Execute the reference's ``train(cfg)`` (`train.py:18-352`) to
    completion and return its observable behavior:

    * ``scalars`` — every tensorboard scalar it would have logged
      (train/psnr, train/lr*, eval/ate_trans, ...), via a SummaryWriter
      stand-in;
    * ``steps`` — one record per REAL ``Trainer.train_step`` call with the
      epoch, iteration, the ``scheduling_start`` the loop passed in, and the
      four optimizers' APPLIED learning rates at that step (read from the
      live ``param_groups`` — immune to torch's get_lr()-inside-step quirks).

    The caller's cfg must route ``training.out_dir`` somewhere writable and
    keep ``visualize_every``/``validate_every`` negative (render_visdata /
    evaluate need plotting deps this harness does not shim).
    """
    train_mod, _ = load_reference_train()
    ref = load_reference()

    rec = ScalarRecorder()
    steps = []
    orig_step = ref.training.Trainer.train_step

    def _lr(opt):
        return float(opt.param_groups[0]["lr"]) if opt is not None else None

    def spy_step(self, data, it=None, epoch=None, scheduling_start=None,
                 render_path=None):
        steps.append({
            "it": int(it),
            "epoch": int(epoch),
            "scheduling_start": int(scheduling_start),
            "lr_nerf": _lr(self.optimizer),
            "lr_pose": _lr(self.optimizer_pose),
            "lr_focal": _lr(self.optimizer_focal),
            "lr_distortion": _lr(self.optimizer_distortion),
        })
        return orig_step(self, data, it=it, epoch=epoch,
                         scheduling_start=scheduling_start,
                         render_path=render_path)

    orig_writer = train_mod.SummaryWriter
    ref.training.Trainer.train_step = spy_step
    train_mod.SummaryWriter = lambda *a, **k: rec
    try:
        train_mod.train(cfg)
    finally:
        ref.training.Trainer.train_step = orig_step
        train_mod.SummaryWriter = orig_writer
    return types.SimpleNamespace(scalars=rec.tags, steps=steps)
