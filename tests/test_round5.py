"""Round-5 surface tests: parity-profile coverage across every CLI and
the multichip dryrun's correctness assert."""
import inspect
import os
import sys

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")


class TestParityKnobSurface:
    """The r3 mandate: ONE knob (tpu.parity) producing the most
    reference-faithful trajectory — accepted by every CLI entry point."""

    def test_all_clis_apply_the_profile(self):
        """Every CLI's cfg path routes through apply_parity_profile:
        train via training.loop.train; eval/render/eval_poses/dpt_depth in
        their mains."""
        sys.path.insert(0, REPO)
        from nope_nerf_tpu.training import loop

        assert "apply_parity_profile" in inspect.getsource(loop.train)
        for mod_path in ("evaluation/eval.py", "evaluation/eval_poses.py",
                         "vis/render.py", "preprocess/dpt_depth.py"):
            src = open(os.path.join(REPO, mod_path)).read()
            assert "apply_parity_profile" in src, mod_path

    def test_profile_noop_without_knob(self):
        from nope_nerf_tpu.config import DEFAULT_CONFIG, load_config
        from nope_nerf_tpu.config import apply_parity_profile

        cfg = load_config(DEFAULT_CONFIG, default_path=None)
        import copy

        before = copy.deepcopy(cfg)
        apply_parity_profile(cfg)
        assert cfg == before


class TestDryrunCorrectnessAssert:
    def test_dryrun_compares_against_single_device(self):
        """VERDICT r4 item 5: MULTICHIP_r*.json is a correctness artifact —
        the dryrun must compute the same step on a 1-device mesh and assert
        closeness, not just finiteness."""
        src = open(os.path.join(REPO, "__graft_entry__.py")).read()
        assert "make_ray_mesh(1)" in src
        assert "assert_allclose" in src

    def test_dryrun_runs_green_small_mesh(self):
        """Execute the real dryrun on a 2-virtual-device mesh (the full
        8-device run is the driver's job; 2 keeps suite time sane)."""
        import subprocess

        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "PYTHONPATH": REPO,
        })
        # strip the axon relay (see conftest): the dryrun must be hermetic
        env["PYTHONPATH"] = REPO
        r = subprocess.run(
            [sys.executable, "-c",
             "import __graft_entry__ as g; g.dryrun_multichip(2)"],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "params allclose" in r.stdout
