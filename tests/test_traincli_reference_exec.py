"""Executed A/B of the reference's WHOLE ``train.py`` CLI (L7 orchestration).

Every other executed-oracle test drives the reference's modules (Trainer,
Renderer, Loss, DataField, ...) directly; this one runs the reference's
``train(cfg)`` itself (`train.py:18-352`) to completion on a synthesized
on-disk scene and pins the orchestration-layer behavior the module-level
tests cannot see:

* the auto-scheduler plateau state machine (`train.py:309-319`): window
  trimming, best-metric update, patient counting, the scheduling_start
  rewrite — asserted by feeding the reference run's OWN per-epoch PSNR
  sequence into our ``Scheduler`` and requiring identical decisions;
* the APPLIED learning-rate sequences (read from the live torch
  ``param_groups`` at every real ``train_step``): the auto path applies the
  decay formula evaluated at the PREVIOUS epoch (end-of-epoch updates,
  `train.py:326-340`), and the non-auto MultiStepLR path applies one EXTRA
  decay relative to that formula (torch applies the milestone at
  ``scheduling_start`` at the end of epoch ``scheduling_start`` itself,
  `train.py:77-81`) — both now mirrored exactly by
  ``Scheduler.applied_lrs``;
* the total-epoch accounting (``while epoch_it < scheduling_start +
  scheduling_epoch`` with the post-fire scheduling_start, inclusive of the
  boundary epoch, `train.py:202-203`);
* the four-stream checkpoint cadence + numbered backups + resume scalars
  (`train.py:249-271`);
* two reference quirks, pinned as executed evidence: the stage-1 PSNR fed
  to the plateau detector goes STALE when ``eval_img_every > 1``
  (`train.py:291-294,310` — the window re-appends the last computed value),
  and resuming a non-auto run crashes (MultiStepLR with ``last_epoch >= 0``
  on optimizers without ``initial_lr``, `train.py:78-81`).
"""
import os
import sys

import numpy as np
import pytest
import yaml

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import reference_exec as rx  # noqa: E402

from nope_nerf_tpu.training.scheduler import Scheduler  # noqa: E402

pytestmark = pytest.mark.skipif(
    not rx.reference_available(), reason="/root/reference not present"
)

FRAMES = 10  # sample_rate 4 -> i_test [2, 6], 8 train frames per epoch
H, W = 24, 32


@pytest.fixture(scope="module")
def disk_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("traincli_ab")
    out = str(root / "scene")
    sys.argv = ["x", out, "--frames", str(FRAMES), "--height", str(H),
                "--width", str(W)]
    from tools.make_synthetic_dataset import main as gen

    gen()
    return os.path.dirname(out)


def _make_cfg(disk_scene, out_dir, training_overrides, pose_overrides=None):
    """Build the run cfg through the reference's OWN load_config so the
    merge semantics and key set are exactly its (`configloading.py:3-47`)."""
    _, dl = rx.load_reference_train()
    overrides = {
        "dataloading": {
            "path": disk_scene,
            "scene": ["scene"],
            "n_workers": 0,
            "sample_rate": 4,
        },
        "model": {"hidden_dim": 32},
        "rendering": {"num_points": 16},
        "pose": {"learn_focal": True, **(pose_overrides or {})},
        "training": {
            "out_dir": out_dir,
            "n_training_points": 96,
            "annealing_epochs": 4,
            "eval_pose_every": 1,
            "eval_img_every": 1,
            "print_every": -1,
            "visualize_every": -1,
            "validate_every": -1,
            "checkpoint_every": 40,
            "backup_every": 64,
            **training_overrides,
        },
    }
    cfg_path = os.path.join(out_dir, "run.yaml")
    os.makedirs(out_dir, exist_ok=True)
    with open(cfg_path, "w") as f:
        yaml.safe_dump(overrides, f)
    return dl.load_config(
        cfg_path, os.path.join(rx.REFERENCE_DIR, "configs", "default.yaml")
    )


def _by_epoch(steps, key):
    """{epoch: the per-epoch value}, asserting it is constant within each
    epoch (the reference only updates schedules at epoch boundaries)."""
    out = {}
    for s in steps:
        e = s["epoch"]
        if e in out:
            assert out[e] == s[key], (e, key, out[e], s[key])
        else:
            out[e] = s[key]
    return out


def _psnr_seq(res):
    return [v for _, v in res.scalars["train/psnr"]]


# ---------------------------------------------------------------------------
# auto-scheduler run (the production path: every Tanks config)
# ---------------------------------------------------------------------------

AUTO_S0, AUTO_EPOCHS = 12, 14


@pytest.fixture(scope="module")
def auto_run(disk_scene, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("auto_out"))
    cfg = _make_cfg(
        disk_scene, out,
        {
            "auto_scheduler": True,
            "scheduling_start": AUTO_S0,
            "scheduling_epoch": AUTO_EPOCHS,
            "length_smooth": 3,
            "patient": 2,
            # noisy LR so the window mean oscillates and the plateau FIRES
            "learning_rate": 0.01,
        },
    )
    res = rx.run_reference_train_cli(cfg)
    return cfg, res, out


def _our_sched(cfg):
    return Scheduler(cfg)


class TestAutoScheduler:
    def test_plateau_fired_and_epoch_accounting(self, auto_run):
        cfg, res, _ = auto_run
        ss = _by_epoch(res.steps, "scheduling_start")
        epochs = sorted(ss)
        fires = sorted({v for v in ss.values()})
        assert len(fires) == 2 and fires[1] == AUTO_S0, (
            "tune the fixture: the plateau must fire for this A/B "
            f"(scheduling_start trace {fires})")
        s_star = fires[0]
        # the rewrite reaches train_step the NEXT epoch (end-of-epoch update)
        fire_seen = min(e for e, v in ss.items() if v == s_star)
        assert fire_seen == s_star + 1
        # total epochs: while epoch_it < s* + scheduling_epoch, INCLUSIVE of
        # the boundary epoch (`train.py:202-203`)
        assert epochs[-1] == s_star + AUTO_EPOCHS
        assert epochs == list(range(0, s_star + AUTO_EPOCHS + 1))

    def test_state_machine_reproduces_decisions(self, auto_run):
        """Our Scheduler, fed the reference run's own per-epoch PSNR
        sequence, makes the identical plateau decision at the identical
        epoch (`train.py:309-319`)."""
        cfg, res, _ = auto_run
        ss = _by_epoch(res.steps, "scheduling_start")
        s_star = min(ss.values())
        psnr = _psnr_seq(res)
        sched = _our_sched(cfg)
        fired_at = None
        for e, p in enumerate(psnr):
            if sched.update_plateau(e, p) and fired_at is None:
                fired_at = e
        assert fired_at == s_star
        assert sched.state.scheduling_start == s_star
        assert sched.total_epochs == s_star + AUTO_EPOCHS

    def test_applied_lr_parity(self, auto_run):
        """The reference applies the decay formula evaluated at the
        PREVIOUS epoch (param_groups are rewritten at end-of-epoch,
        `train.py:326-340`); ``Scheduler.applied_lrs`` must reproduce the
        applied sequence exactly, including the fire transition."""
        cfg, res, _ = auto_run
        psnr = _psnr_seq(res)
        per_epoch = {
            g: _by_epoch(res.steps, f"lr_{g}")
            for g in ("nerf", "pose", "focal", "distortion")
        }
        n_epochs = max(per_epoch["nerf"]) + 1
        sched = _our_sched(cfg)
        for e in range(n_epochs):
            ours = sched.applied_lrs(e)
            for g in per_epoch:
                assert ours[g] == pytest.approx(
                    per_epoch[g][e], rel=1e-12
                ), (g, e, ours[g], per_epoch[g][e])
            sched.update_plateau(e, psnr[e])
        # sanity: the run decayed the nerf LR at least once (s*+10 reached
        # when the plateau fires by epoch 4 = 14-epoch tail crosses a decade)
        lrs = [per_epoch["nerf"][e] for e in range(n_epochs)]
        assert min(lrs) < max(lrs)

    def test_checkpoint_tree_and_resume_scalars(self, auto_run):
        cfg, res, out = auto_run
        for f in ("model.pt", "model_pose.pt", "model_focal.pt",
                  "model_distortion.pt"):
            assert os.path.exists(os.path.join(out, f)), f
        backups = [f for f in os.listdir(out)
                   if f.startswith("model_") and f[6:-3].isdigit()]
        assert backups, "backup_every never fired — tune the fixture"
        ck = torch.load(os.path.join(out, "model.pt"), map_location="cpu",
                        weights_only=False)
        ss = _by_epoch(res.steps, "scheduling_start")
        last_save_it = max(
            s["it"] for s in res.steps
            if s["it"] % cfg["training"]["checkpoint_every"] == 0
        )
        saved_epoch = max(
            s["epoch"] for s in res.steps if s["it"] == last_save_it
        )
        assert ck["it"] == last_save_it
        assert ck["epoch_it"] == saved_epoch
        # the auto-scheduler state is checkpointed (`train.py:252-253`), so
        # the phase switch survives restarts — scheduling_start at save time
        assert ck["scheduling_start"] == ss[saved_epoch]
        assert "patient_count" in ck and "loss_val_best" in ck

    def test_ate_logged_every_epoch(self, auto_run):
        cfg, res, _ = auto_run
        epochs = sorted(_by_epoch(res.steps, "scheduling_start"))
        ates = res.scalars["eval/ate_trans"]
        assert len(ates) == len(epochs)
        assert all(np.isfinite(v) for _, v in ates)


# ---------------------------------------------------------------------------
# non-auto MultiStepLR path (`train.py:77-81,107-110,297-308`)
# ---------------------------------------------------------------------------

NA_S0, NA_EPOCHS = 3, 25


@pytest.fixture(scope="module")
def nonauto_run(disk_scene, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("nonauto_out"))
    cfg = _make_cfg(
        disk_scene, out,
        {
            "auto_scheduler": False,
            "scheduling_start": NA_S0,
            "scheduling_epoch": NA_EPOCHS,
        },
    )
    res = rx.run_reference_train_cli(cfg)
    return cfg, res, out


class TestNonAutoMultiStepLR:
    def test_applied_lr_closed_form(self, nonauto_run):
        """torch's ``LRScheduler.__init__`` runs one ``step()`` at
        construction, so the milestone at m fires at the END of epoch m-1 —
        the applied LR during epoch E is base*gamma^|{m in milestones :
        m <= E}|, one decade AHEAD of the auto path's int((E-1-s)/10) at
        every boundary. Executed evidence for the closed form, then parity
        for ``Scheduler.applied_lrs`` in non-auto mode."""
        cfg, res, _ = nonauto_run
        t = cfg["training"]
        per_epoch = {
            g: _by_epoch(res.steps, f"lr_{g}")
            for g in ("nerf", "pose", "focal", "distortion")
        }
        n_epochs = max(per_epoch["nerf"]) + 1
        assert n_epochs == NA_S0 + NA_EPOCHS + 1

        base = {"nerf": t["learning_rate"], "pose": t["pose_lr"],
                "focal": t["focal_lr"], "distortion": t["distortion_lr"]}
        gamma = {"nerf": t["scheduler_gamma"],
                 "pose": t["scheduler_gamma_pose"],
                 "focal": t["scheduler_gamma_focal"],
                 "distortion": t["scheduler_gamma_distortion"]}
        stride = {"nerf": 10, "pose": 100, "focal": 100, "distortion": 100}
        sched = _our_sched(cfg)
        for e in range(n_epochs):
            ours = sched.applied_lrs(e)
            for g in per_epoch:
                miles = range(NA_S0, NA_S0 + NA_EPOCHS, stride[g])
                n_hit = sum(1 for m in miles if m <= e)
                closed = base[g] * gamma[g] ** n_hit
                assert per_epoch[g][e] == pytest.approx(closed, rel=1e-12), (
                    g, e, per_epoch[g][e], closed)
                assert ours[g] == pytest.approx(per_epoch[g][e], rel=1e-12)
        # the nerf group crossed all three milestones (3, 13, 23)
        assert per_epoch["nerf"][n_epochs - 1] == pytest.approx(
            base["nerf"] * gamma["nerf"] ** 3, rel=1e-12)
        # the per-100 groups crossed exactly one (milestone 3)
        assert per_epoch["pose"][n_epochs - 1] == pytest.approx(
            base["pose"] * gamma["pose"], rel=1e-12)

    def test_nonauto_resume_continues_at_the_saved_schedule(
            self, nonauto_run):
        """Resuming a non-auto run WORKS in the reference — but only by a
        subtle accident this test pins as executed evidence: MultiStepLR
        with ``last_epoch = epoch_it >= 0`` requires ``initial_lr`` in the
        param_groups (torch raises KeyError otherwise), and it is present
        on resume ONLY because the first run's scheduler wrote it into the
        optimizer param_groups, which ``CheckpointIO`` saved and restored
        whole (`train.py:78-81`, `model/checkpoints.py:29-41`). The resumed
        run restarts at the checkpointed ``epoch_it + 1`` and trains at the
        restored (already-decayed) LR."""
        cfg, res, out = nonauto_run
        assert os.path.exists(os.path.join(out, "model.pt"))
        res2 = rx.run_reference_train_cli(cfg)
        ck = torch.load(os.path.join(out, "model.pt"), map_location="cpu",
                        weights_only=False)
        first_epoch = min(s["epoch"] for s in res2.steps)
        assert first_epoch == ck["epoch_it"] + 1
        # epochs 24.. run past the last milestone (23): the restored LR is
        # gamma^3 and stays there — the schedule continued, not restarted
        t = cfg["training"]
        for s in res2.steps:
            assert s["lr_nerf"] == pytest.approx(
                t["learning_rate"] * t["scheduler_gamma"] ** 3, rel=1e-12)
        assert max(s["epoch"] for s in res2.steps) == NA_S0 + NA_EPOCHS


# ---------------------------------------------------------------------------
# eval_img_every > 1: the plateau detector sees STALE PSNR (`train.py:291,310`)
# ---------------------------------------------------------------------------


def test_stale_psnr_quirk(disk_scene, tmp_path_factory):
    """With ``eval_img_every: 2`` the reference re-appends the LAST computed
    PSNR on odd epochs (``psnr`` is only rebound inside the eval_img block,
    `train.py:291-294`), so the plateau window sees duplicates. Executed
    evidence: our state machine fed the duplicated sequence reproduces the
    reference's fire epoch. Shipped configs all use eval_img_every 1, where
    the quirk is dormant; our loop always feeds the fresh per-epoch PSNR."""
    out = str(tmp_path_factory.mktemp("stale_out"))
    cfg = _make_cfg(
        disk_scene, out,
        {
            "auto_scheduler": True,
            "scheduling_start": 12,
            "scheduling_epoch": 6,
            "length_smooth": 3,
            "patient": 2,
            "learning_rate": 0.01,
            "eval_img_every": 2,
        },
    )
    res = rx.run_reference_train_cli(cfg)
    ss = _by_epoch(res.steps, "scheduling_start")
    s_star = min(ss.values())
    n_epochs = max(ss) + 1
    computed = dict(
        zip(range(0, n_epochs, 2), [v for _, v in res.scalars["train/psnr"]])
    )
    sched = _our_sched(cfg)
    fired_at = None
    for e in range(n_epochs):
        stale = computed[e - (e % 2)]
        if sched.update_plateau(e, stale) and fired_at is None:
            fired_at = e
    if s_star < 12:
        assert fired_at == s_star
    else:
        assert fired_at is None
