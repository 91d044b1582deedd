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


class TestAutoDefault:
    """Round 5 flips the stock chamfer_mode to 'auto' (band on the
    training clouds, quality-gated); parity still pins exact, silently."""

    def test_stock_default_is_auto(self):
        from nope_nerf_tpu.config import DEFAULT_CONFIG, load_config

        cfg = load_config(DEFAULT_CONFIG, default_path=None)
        assert cfg["tpu"]["chamfer_mode"] == "auto"

    def test_parity_overrides_stock_auto_silently(self):
        import warnings

        from nope_nerf_tpu.config import apply_parity_profile

        cfg = {"tpu": {"parity": True, "chamfer_mode": "auto"}}
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            apply_parity_profile(cfg)
        assert cfg["tpu"]["chamfer_mode"] == "exact"


class TestShardedBand:
    def test_sharded_band_matches_unsharded(self):
        """chamfer_loss_banded_sharded on an 8-device CPU mesh (interpret
        kernels) == the unsharded banded loss: the multi-chip band path is
        a correctness-checked citizen like the exact sharded kernel
        (tests/test_parallel.py pattern)."""
        import jax
        import jax.numpy as jnp
        import numpy as _np

        from nope_nerf_tpu.ops.pallas.chamfer_band import (
            QB,
            TILE,
            band_start_tiles,
            chamfer_loss_banded,
            chamfer_loss_banded_sharded,
        )
        from nope_nerf_tpu.parallel.mesh import make_ray_mesh

        mesh = make_ray_mesh(8)
        k1, k2 = jax.random.split(jax.random.PRNGKey(3))
        S = D = 8 * QB          # whole groups per shard
        X = jax.random.uniform(k1, (S, 3), minval=-1, maxval=1)
        Y = jax.random.uniform(k2, (D, 3), minval=-1, maxval=1)
        n_tiles = -(-D // TILE)
        k_tiles = 2
        rng = _np.random.default_rng(0)
        sx = jnp.asarray(
            rng.integers(0, n_tiles - k_tiles + 1, S // QB), jnp.int32)
        sy = jnp.asarray(
            rng.integers(0, n_tiles - k_tiles + 1, D // QB), jnp.int32)
        want = chamfer_loss_banded(X, Y, sx, sy, k_tiles, use_pallas=False)
        got = chamfer_loss_banded_sharded(X, Y, sx, sy, mesh, k_tiles,
                                          interpret=True)
        _np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


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
