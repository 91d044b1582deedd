"""Executed A/B of the reference's WHOLE ``evaluation/eval.py`` CLI.

The eval building blocks are already executed-A/B'd module-level
(Eval_Images / eval-mode render: test_evalrender_reference_exec, test-time
pose opt: test_poseopt_reference_exec, checkpoints:
test_ckptio_reference_exec); this runs the reference's ``eval(cfg)``
itself (`evaluation/eval.py:23-209`) end-to-end on a synthesized on-disk
scene and pins the CLI orchestration those tests cannot see:

* the three-stream checkpoint restore wiring (its own ``CheckpointIO``
  loads model/model_pose/model_focal.pt, `eval.py:52,76-92`) — our side
  consumes the SAME .pt files through ``tools/convert_reference_ckpt.py``,
  i.e. the full reference→ours migration story executed once more at the
  CLI level;
* the init-'pre' eval-pose construction: learned train poses sliced
  ``[sample_rate/2-1 :: sample_rate-1]`` (`eval.py:106-108`);
* the pose-opt epoch loop + its MultiStepLR (milestones
  ``range(0, E, E/5)``, gamma 0.5, incl. torch's epoch-0 application);
* per-image metrics INCLUDING LPIPS: the reference runs a stubbed
  pip-``lpips`` built from synthetic VGG weights
  (tools/reference_exec.py), our CLI runs the JAX VGG port on the same
  weights through ``tools/convert_lpips.py`` — the first executed A/B of
  the whole LPIPS chain inside a CLI;
* the cross-image median-ratio depth protocol — where executing the
  reference surfaced an upstream BUG: its ``eval_depth: True`` branch
  CRASHES (`eval.py:189` ``pred_depth *= ratio`` multiplies the masked
  uint8 visualisation `eval_images` returns as ``depth_pred``,
  `model/eval_images.py:115,122,131`, in-place by a float64 — a
  ``UFuncTypeError`` in every numpy >= 1.10, and the reference's
  environment.yaml leaves numpy unpinned).  The crash is pinned as
  executed evidence, and our ``depth_evaluation.txt`` is A/B'd against
  the reference's INTENDED protocol: its own ``compute_errors`` executed
  on the captured arrays with the one minimal float cast a user must
  apply to run it;
* the artifact trees (img_out / depth_out / img_gt_out pngs) and the
  video frame stack (its ``imageio.mimwrite`` call is spied — ffmpeg is
  absent — vs our MJPEG-mp4 decoded back with our own parser).
"""
import importlib.util
import os
import sys

import numpy as np
import pytest
import yaml

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import reference_exec as rx  # noqa: E402

from convert_lpips import CONV_IDX, convert as lpips_convert  # noqa: E402
from convert_reference_ckpt import main as convert_main  # noqa: E402

from nope_nerf_tpu.training.checkpoints import save_pytree  # noqa: E402

pytestmark = pytest.mark.skipif(
    not rx.reference_available(), reason="/root/reference not present"
)

FRAMES, H, W = 10, 24, 32  # sample_rate 4 -> i_test [2, 6]: 2 eval frames
OPT_EPOCHS = 5  # MultiStepLR milestones range(0,5,1) — decay EVERY epoch

_VGG_CONVS = [
    (64, 3), (64, 64),
    (128, 64), (128, 128),
    (256, 128), (256, 256), (256, 256),
    (512, 256), (512, 512), (512, 512),
    (512, 512), (512, 512), (512, 512),
]
_TAP_CH = [64, 128, 256, 512, 512]


@pytest.fixture(scope="module")
def disk_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("evalcli_ab")
    out = str(root / "scene")
    sys.argv = ["x", out, "--frames", str(FRAMES), "--height", str(H),
                "--width", str(W), "--gt-depth"]
    from tools.make_synthetic_dataset import main as gen

    gen()
    return os.path.dirname(out)


@pytest.fixture(scope="module")
def lpips_npz(tmp_path_factory):
    """Synth lpips weights, registered with the reference stub AND
    converted for our JAX port — the identical values flow both sides."""
    rng = np.random.default_rng(7)
    vgg_sd = {}
    for idx, (cout, cin) in zip(CONV_IDX, _VGG_CONVS):
        vgg_sd[f"{idx}.weight"] = rng.normal(
            size=(cout, cin, 3, 3)).astype(np.float32) * 0.08
        vgg_sd[f"{idx}.bias"] = rng.normal(
            size=(cout,)).astype(np.float32) * 0.1
    lin_sd = {
        f"lin{i}.model.1.weight": np.abs(
            rng.normal(size=(1, c, 1, 1))).astype(np.float32)
        for i, c in enumerate(_TAP_CH)
    }
    rx.set_lpips_synth(vgg_sd, lin_sd)
    path = str(tmp_path_factory.mktemp("lpips") / "lpips_vgg.npz")
    save_pytree(path, {"params": lpips_convert(vgg_sd, lin_sd)})
    return path


def _overrides(disk_scene, out_dir, lpips_npz, eval_depth=False):
    return {
        "dataloading": {
            "path": disk_scene,
            "scene": ["scene"],
            "n_workers": 0,
            "sample_rate": 4,
            "with_depth": True,
        },
        "model": {"hidden_dim": 32},
        "rendering": {"num_points": 16},
        "pose": {"learn_focal": True, "init_pose": True},
        "training": {"out_dir": out_dir},
        "eval_pose": {
            "opt_pose_epoch": OPT_EPOCHS,
            # n_points = h*w: both sides draw a permutation of ALL rays,
            # so the MSE gradient is permutation-invariant and the
            # reference's randperm needs no replay
            "n_points": H * W,
        },
        "extract_images": {
            "resolution": [H, W],
            # the reference CLI CRASHES with eval_depth True (see module
            # docstring) — the ref fixture runs False, ours runs True
            "eval_depth": eval_depth,
            "lpips_weights": lpips_npz,
            # consumed by the render CLI A/B (ignored by eval.py)
            "traj_option": "interp",
            "N_novel_imgs": 6,
        },
    }


def _write_yaml(overrides, out_dir):
    os.makedirs(out_dir, exist_ok=True)
    p = os.path.join(out_dir, "run.yaml")
    with open(p, "w") as f:
        yaml.safe_dump(overrides, f)
    return p


@pytest.fixture(scope="module")
def ref_run(disk_scene, lpips_npz, tmp_path_factory):
    """Save a (seeded, perturbed) reference stack in ITS checkpoint layout,
    then execute the reference eval CLI over it."""
    out_ref = str(tmp_path_factory.mktemp("ref_out"))
    _, dl = rx.load_reference_train()
    cfg = dl.load_config(
        _write_yaml(_overrides(disk_scene, out_ref, lpips_npz), out_ref),
        os.path.join(rx.REFERENCE_DIR, "configs", "default.yaml"),
    )

    import types as _t

    _, train_ds = dl.get_dataloader(cfg, mode="train", shuffle=False)
    fld = train_ds["img"]
    duck = _t.SimpleNamespace(N_imgs=fld.N_imgs,
                              c2ws=np.asarray(fld.c2ws),
                              K=np.asarray(fld.K))
    stack = rx.build_reference_stack(cfg, duck, seed=11, perturb=0.02)

    import model.checkpoints as ref_ckpt

    opt, opt_pose, opt_focal, opt_dist = stack.optimizers
    ref_ckpt.CheckpointIO(out_ref, model=stack.net, optimizer=opt).save(
        "model.pt", epoch_it=1, it=10)
    ref_ckpt.CheckpointIO(out_ref, model=stack.pose_net,
                          optimizer=opt_pose).save("model_pose.pt",
                                                   epoch_it=1, it=10)
    ref_ckpt.CheckpointIO(out_ref, model=stack.focal_net,
                          optimizer=opt_focal).save("model_focal.pt",
                                                    epoch_it=1, it=10)
    ref_ckpt.CheckpointIO(out_ref, model=stack.dist_net,
                          optimizer=opt_dist).save("model_distortion.pt",
                                                   epoch_it=1, it=10)
    res = rx.run_reference_eval_cli(cfg)
    return cfg, res, out_ref


@pytest.fixture(scope="module")
def my_run(disk_scene, lpips_npz, ref_run, tmp_path_factory):
    """Convert the reference-run .pt streams and run OUR eval CLI."""
    _, _, out_ref = ref_run
    out_my = str(tmp_path_factory.mktemp("my_out"))
    convert_main([out_ref, out_my])

    from nope_nerf_tpu.config import DEFAULT_CONFIG, load_config

    cfg = load_config(
        _write_yaml(
            _overrides(disk_scene, out_my, lpips_npz, eval_depth=True),
            out_my),
        DEFAULT_CONFIG,
    )

    epath = os.path.join(os.path.dirname(__file__), "..", "evaluation",
                         "eval.py")
    spec = importlib.util.spec_from_file_location("my_eval_cli", epath)
    emod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(emod)

    outs = []
    orig = emod.eval_image

    def spy(*a, **k):
        out = orig(*a, **k)
        outs.append(out)
        return out

    emod.eval_image = spy
    try:
        means = emod.main(cfg, eval_depth=True)
    finally:
        emod.eval_image = orig
    return cfg, means, outs, out_my


def test_per_image_metrics_match(ref_run, my_run):
    _, res, _ = ref_run
    _, _, outs, _ = my_run
    assert len(res.images) == len(outs) == 2  # i_test = [2, 6]
    for i, (r, m) in enumerate(zip(res.images, outs)):
        assert m["psnr"] == pytest.approx(r["psnr"], abs=2e-2), i
        assert m["ssim"] == pytest.approx(r["ssim"], abs=2e-3), i
        assert m["lpips"] == pytest.approx(r["lpips"], abs=2e-3), i
        assert m["mse"] == pytest.approx(r["mse"], rel=5e-3), i


def test_means_and_stdout(ref_run, my_run):
    _, res, _ = ref_run
    _, means, _, _ = my_run
    ref_psnr = np.mean([r["psnr"] for r in res.images])
    ref_ssim = np.mean([r["ssim"] for r in res.images])
    ref_lpips = np.mean([r["lpips"] for r in res.images])
    assert means["psnr"] == pytest.approx(ref_psnr, abs=2e-2)
    assert means["ssim"] == pytest.approx(ref_ssim, abs=2e-3)
    assert means["lpips"] == pytest.approx(ref_lpips, abs=2e-3)
    # the reference printed the same aggregation (LaTeX row present)
    assert f"{ref_psnr:.2f} &" in res.stdout.replace("'", "")


def test_pose_opt_trajectory_endpoint(ref_run, my_run):
    """The CLI-level pose-opt wiring: the reference logs opt/psnr per
    epoch; ours logs the last epoch of each fused block — endpoints must
    agree (per-STEP parity is test_poseopt_reference_exec's job)."""
    import json

    _, res, _ = ref_run
    _, _, _, out_my = my_run
    ref_traj = res.scalars["opt/psnr"]
    assert len(ref_traj) == OPT_EPOCHS
    mine = []
    with open(os.path.join(out_my, "logs", "events.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec["tag"] == "opt/psnr":
                mine.append((rec["step"], rec["value"]))
    assert mine, "our CLI logged no opt/psnr"
    assert mine[-1][0] == ref_traj[-1][0] == OPT_EPOCHS - 1
    # 10 Adam steps of trajectory drift (the poseopt module A/B bounds
    # per-step losses at 5e-3): ~0.03 dB on the epoch-mean PSNR here
    assert mine[-1][1] == pytest.approx(ref_traj[-1][1], abs=6e-2)


def test_reference_eval_depth_branch_crashes(disk_scene, lpips_npz, ref_run,
                                             tmp_path_factory):
    """Executed evidence for the upstream bug: the reference's
    ``eval_depth: True`` branch dies at `evaluation/eval.py:189` —
    ``pred_depth *= ratio`` multiplies the masked uint8 array
    `model/eval_images.py:131` hands back as ``depth_pred`` in-place by a
    float64 median ratio (``UFuncTypeError`` under numpy >= 1.10; the
    reference's environment.yaml leaves numpy unpinned).  Our CLI runs
    the intended protocol instead (gated below)."""
    out = str(tmp_path_factory.mktemp("ref_depth_crash"))
    _, dl = rx.load_reference_train()
    cfg = dl.load_config(
        _write_yaml(
            _overrides(disk_scene, out, lpips_npz, eval_depth=True), out),
        os.path.join(rx.REFERENCE_DIR, "configs", "default.yaml"),
    )
    # reuse the checkpoints the ref_run fixture wrote
    _, _, out_ref = ref_run
    for s in ("model.pt", "model_pose.pt", "model_focal.pt"):
        import shutil

        shutil.copy(os.path.join(out_ref, s), os.path.join(out, s))
    with pytest.raises(TypeError, match="Cannot cast ufunc"):
        rx.run_reference_eval_cli(cfg)


def test_depth_protocol_and_table(disk_scene, ref_run, my_run):
    """Per-image masked depths match under the reference's
    normalise-before-mask transform (ours returns the RAW masked depths;
    the reference's uint8 ``depth_pred`` is the visualisation accident
    that crashes its own eval_depth branch, see above — the deviation is
    documented in docs/migration.md and pinned in
    test_evalrender_reference_exec too).  Our depth_evaluation.txt is
    A/B'd against the reference's own ``compute_errors`` executed over
    the `eval.py:182-202` median-ratio protocol on the raw arrays."""
    import cv2

    _, res, out_ref = ref_run
    _, _, outs, out_my = my_run
    for i, (frame, r, m) in enumerate(zip((2, 6), res.images, outs)):
        np.testing.assert_allclose(m["depth_gt"], r["depth_gt"], rtol=1e-6,
                                   err_msg=f"img {i}: gt depth/mask")
        gt = cv2.imread(
            os.path.join(disk_scene, "scene", "depth", f"{frame:03d}.png"),
            cv2.IMREAD_UNCHANGED).astype(np.float32) / 1000.0
        mask = (gt > 0.1) & (gt < 20.0)
        assert mask.sum() == m["depth_gt"].size, i
        d = m["depth"]
        d8 = np.clip(255.0 / d.max() * (d - d.min()), 0, 255).astype(np.uint8)
        dd = np.abs(d8[mask].astype(int) - r["depth_pred"].astype(int))
        # renders agree to ~3e-4 after the pose-opt -> never more than one
        # uint8 count apart, with off-by-ones only at quantisation edges
        assert dd.max() <= 1 and (dd == 0).mean() > 0.8, i

    import model.common as ref_common

    gts = [m["depth_gt"] for m in outs]
    preds = [m["depth_pred"].astype(np.float64) for m in outs]
    ratio = np.median(np.concatenate(gts)) / np.median(np.concatenate(preds))
    errs = []
    for gt, pred in zip(gts, preds):
        pred = np.clip(pred * ratio, 0.1, 20.0)
        errs.append(ref_common.compute_errors(gt, pred))
    want = np.asarray(errs).mean(0)

    with open(os.path.join(out_my, "extraction",
                           "depth_evaluation.txt")) as f:
        txt = f.read()
    rows = [ln for ln in txt.splitlines() if ln.strip().startswith("&")]
    assert rows, txt
    got = np.array([float(x) for x in
                    rows[-1].replace("\\", "").split("&") if x.strip()])
    assert got.shape == want.shape == (7,)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_artifact_trees_match(ref_run, my_run):
    import imageio.v2 as imageio

    _, res, out_ref = ref_run
    _, _, _, out_my = my_run
    for sub, tol in (("img_out", 1), ("depth_out", 1), ("img_gt_out", 0)):
        dref = os.path.join(out_ref, "extraction", "eval", "pre", sub)
        dmy = os.path.join(out_my, "extraction", "eval", "pre", sub)
        names = sorted(os.listdir(dref))
        assert names == sorted(os.listdir(dmy)) and names, sub
        for n in names:
            a = np.asarray(imageio.imread(os.path.join(dref, n))
                           ).astype(np.int32)
            b = np.asarray(imageio.imread(os.path.join(dmy, n))
                           ).astype(np.int32)
            assert a.shape == b.shape, (sub, n)
            assert np.abs(a - b).max() <= tol, (sub, n)


def test_video_frames_match(ref_run, my_run):
    from nope_nerf_tpu.utils.mp4 import read_mjpeg_mp4

    _, res, out_ref = ref_run
    _, _, _, out_my = my_run
    assert len(res.videos) == 1
    path, frames, kw = res.videos[0]
    assert path == os.path.join(out_ref, "extraction", "eval", "pre",
                                "video_out", "img.mp4")
    assert kw.get("fps") == 30
    mine, fps = read_mjpeg_mp4(os.path.join(out_my, "extraction", "eval",
                                            "pre", "video_out", "img.mp4"))
    assert fps == pytest.approx(30, abs=0.5)  # ms timescale: 1000/33
    assert mine.shape == frames.shape == (2, H, W, 3)
    # ours is written through the MJPEG muxer (lossy jpeg), the
    # reference's mimwrite input is raw uint8 — compare post-codec
    assert np.abs(mine.astype(np.int32)
                  - frames.astype(np.int32)).mean() <= 3.0


def test_eval_poses_cli_matches(ref_run, my_run):
    """Executed A/B of the reference's `evaluation/eval_poses.py` — a
    module-level SCRIPT run as a CLI on the run.yaml + checkpoints the
    ref_run fixture wrote: pose-checkpoint restore, Sim(3) ATE alignment
    of the learned train poses to the loader's c2ws, and the printed
    ``rpe_t*100 &rpe_r_deg & ate`` LaTeX row — vs our eval_poses CLI on
    the converted npz streams (full precision vs the reference's
    3-decimal print)."""
    _, _, out_ref = ref_run
    out = rx.run_reference_eval_poses_cli(os.path.join(out_ref, "run.yaml"))
    row = out.strip().splitlines()[-1]
    want = [float(x) for x in row.replace("&", " ").split()]
    assert len(want) == 3

    my_cfg, _, _, _ = my_run
    epath = os.path.join(os.path.dirname(__file__), "..", "evaluation",
                         "eval_poses.py")
    spec = importlib.util.spec_from_file_location("my_eval_poses_cli", epath)
    emod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(emod)
    got = emod.main(dict(my_cfg))
    for k, w in zip(("rpe_trans", "rpe_rot_deg", "ate"), want):
        # the reference prints 3 decimals; ours is full precision
        assert got[k] == pytest.approx(w, abs=5.1e-4), (k, got, row)


def test_render_cli_matches(ref_run, my_run):
    """Executed A/B of the reference's `vis/render.py` script run as a
    real CLI (argv + cwd-relative default.yaml) on the shared run.yaml and
    checkpoints: checkpoint restore, the mode='render' dataloader (train
    split), the 'interp' trajectory dispatch, the per-frame
    `Extract_Images.generate_images` artifact tree, and the img/depth
    video stacks — vs our vis/render.py CLI on the converted streams."""
    import imageio.v2 as imageio

    _, _, out_ref = ref_run
    my_cfg, _, _, out_my = my_run
    res = rx.run_reference_render_cli(os.path.join(out_ref, "run.yaml"))

    rpath = os.path.join(os.path.dirname(__file__), "..", "vis", "render.py")
    spec = importlib.util.spec_from_file_location("my_render_cli", rpath)
    rmod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rmod)
    rmod.main(dict(my_cfg))

    dref = os.path.join(out_ref, "extraction", "extracted_images", "interp")
    dmy = os.path.join(out_my, "extraction", "extracted_images", "interp")

    # per-frame artifact tree (raw-depth npys are pinned per-frame by
    # test_extract_reference_exec; here: the uint8 pngs the CLI leaves)
    for sub in ("img_out", "depth_out"):
        ref_names = sorted(f for f in os.listdir(os.path.join(dref, sub))
                           if f.endswith(".png"))
        my_names = sorted(f for f in os.listdir(os.path.join(dmy, sub))
                          if f.endswith(".png"))
        assert ref_names == my_names and len(ref_names) == 6, sub
        for n in ref_names:
            a = np.asarray(imageio.imread(
                os.path.join(dref, sub, n))).astype(np.int32)
            b = np.asarray(imageio.imread(
                os.path.join(dmy, sub, n))).astype(np.int32)
            assert a.shape == b.shape, (sub, n)
            assert np.abs(a - b).max() <= 1, (sub, n)

    # video stacks: the reference's two mimwrite calls vs our MJPEG mp4s
    from nope_nerf_tpu.utils.mp4 import read_mjpeg_mp4

    assert [os.path.basename(p) for p, _, _ in res.videos] == [
        "img.mp4", "depth.mp4"]
    for (path, frames, kw), name in zip(res.videos, ("img", "depth")):
        assert kw.get("fps") == 30
        assert frames.shape[0] == 6
        mine, fps = read_mjpeg_mp4(
            os.path.join(dmy, "video_out", f"{name}.mp4"))
        assert fps == pytest.approx(30, abs=0.5)
        assert mine.shape[:3] == frames.shape[:3]
        a = mine.astype(np.int32)
        b = frames.astype(np.int32)
        if b.ndim == 3:  # grayscale depth stack: ours stores rgb jpeg
            a = a.mean(-1)
        assert np.abs(a - b).mean() <= 3.0, name
