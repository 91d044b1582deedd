"""Round-4 tests: the tpu.parity profile, multiplier-aware throughput
logging, and the outage-resilient bench supervisor."""
import json
import os
import subprocess
import sys
import warnings

import numpy as np
import pytest

from nope_nerf_tpu.config import (
    PARITY_PROFILE,
    apply_parity_profile,
)
from nope_nerf_tpu.utils.synthetic import SyntheticScene, tiny_config


class TestParityProfile:
    def test_expansion(self):
        cfg = {"tpu": {"parity": True}}
        apply_parity_profile(cfg)
        for k, v in PARITY_PROFILE.items():
            assert cfg["tpu"][k] == v
        assert cfg["tpu"]["fast_ray_sampling"] is False
        assert cfg["tpu"]["chamfer_mode"] == "exact"
        assert cfg["tpu"]["eager_metrics"] is True
        assert cfg["tpu"]["mlp_bf16"] is False
        assert cfg["tpu"]["use_pallas_mlp"] is False

    def test_off_is_noop(self):
        cfg = {"tpu": {"chamfer_mode": "grid", "fast_ray_sampling": True}}
        apply_parity_profile(cfg)
        assert cfg["tpu"]["chamfer_mode"] == "grid"
        assert "eager_metrics" not in cfg["tpu"]

    def test_override_warns_only_for_non_stock_values(self):
        # stock default.yaml values (fast_ray_sampling True, chamfer_mode
        # auto since r5) override silently
        cfg = {"tpu": {"parity": True, "fast_ray_sampling": True,
                       "chamfer_mode": "auto"}}
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            apply_parity_profile(cfg)
        assert cfg["tpu"]["fast_ray_sampling"] is False
        assert cfg["tpu"]["chamfer_mode"] == "exact"
        # a clearly user-set conflicting value warns
        cfg = {"tpu": {"parity": True, "chamfer_mode": "grid"}}
        with pytest.warns(UserWarning, match="chamfer_mode"):
            apply_parity_profile(cfg)
        assert cfg["tpu"]["chamfer_mode"] == "exact"

    def test_identical_losses_to_individually_set_flags(self, tmp_path):
        """The profile must be EXACTLY the five flags — same seed, same
        trajectory, bitwise-equal parameters after a few epochs."""
        from nope_nerf_tpu.training.loop import train

        def run(out, tpu_over):
            scene = SyntheticScene(n_frames=4, hw=(16, 20), num_points=16)
            cfg = tiny_config(scene, out, n_training_points=64,
                              num_points=16)
            cfg["training"].update({"scheduling_start": 0,
                                    "annealing_epochs": 0,
                                    "auto_scheduler": False,
                                    "checkpoint_every": 0})
            cfg["tpu"].update(tpu_over)
            state, _, _ = train(cfg, max_epochs=3, scene=scene)
            return state

        s_profile = run(str(tmp_path / "a"), {"parity": True})
        s_manual = run(str(tmp_path / "b"), dict(PARITY_PROFILE))

        import jax

        leaves_a = jax.tree.leaves(s_profile.params)
        leaves_b = jax.tree.leaves(s_manual.params)
        assert len(leaves_a) == len(leaves_b)
        for a, b in zip(leaves_a, leaves_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_eager_metrics_no_pipeline_lag(self, tmp_path):
        """With eager_metrics the per-epoch PSNR log is complete through the
        FINAL epoch at loop exit (pipelined mode would still be draining)."""
        from nope_nerf_tpu.training.loop import train

        scene = SyntheticScene(n_frames=4, hw=(16, 20), num_points=16)
        out = str(tmp_path / "out")
        cfg = tiny_config(scene, out, n_training_points=64, num_points=16)
        cfg["training"].update({"scheduling_start": 0, "annealing_epochs": 0,
                                "auto_scheduler": False})
        cfg["tpu"]["eager_metrics"] = True
        train(cfg, max_epochs=4, scene=scene)
        events = [json.loads(l)
                  for l in open(os.path.join(out, "logs", "events.jsonl"))]
        psnrs = [e for e in events if e["tag"] == "train/psnr"]
        assert len(psnrs) == 4


class TestChamferAutoMode:
    """tpu.chamfer_mode: auto — trace-time selection between the exact
    kernel and the Morton-window mode from the static cloud sizes."""

    def test_resolution_by_size(self):
        from nope_nerf_tpu.ops.chamfer import resolve_chamfer_mode

        # Tanks defaults (pc_ratio 4 at 540x960): exact — reference argmin
        assert resolve_chamfer_mode("auto", 32400, 32400) == "exact"
        # 2x Tanks scale: grid wins (BASELINE.md r4: 18.3 vs 26.7 ms)
        assert resolve_chamfer_mode("auto", 64800, 64800) == "grid"
        # asymmetric clouds: each mode on its OWN cost law (exact ~ S*D,
        # grid ~ S+D), not a single product threshold (r4 ADVICE item 2)
        assert resolve_chamfer_mode("auto", 16200, 64800) == "exact"
        # a very asymmetric pair whose product is large but whose exact
        # cost is still below the grid sort cost stays exact
        assert resolve_chamfer_mode("auto", 1024, 1024 * 1024) == "exact"
        # explicit modes pass through untouched at any size
        assert resolve_chamfer_mode("exact", 10 ** 6, 10 ** 6) == "exact"
        assert resolve_chamfer_mode("grid", 8, 8) == "grid"
        # a ray mesh shards the exact kernel's quadratic work — but ONLY
        # when the per-shard Pallas path will actually run (ADVICE item 1)
        assert resolve_chamfer_mode("auto", 64800, 64800, n_devices=8) == \
            "exact"
        assert resolve_chamfer_mode("auto", 64800, 64800, n_devices=8,
                                    sharded_exact=False) == "grid"
        # projection hints trump everything: band is the fastest at every
        # scale on the structured training clouds (r5)
        assert resolve_chamfer_mode("auto", 64800, 64800,
                                    hints_available=True) == "band"

    def test_auto_grid_warns_once(self):
        import warnings as _w

        import nope_nerf_tpu.ops.chamfer as chamfer_mod

        chamfer_mod._warned_auto.clear()
        with _w.catch_warnings(record=True) as rec:
            _w.simplefilter("always")
            assert chamfer_mod.resolve_chamfer_mode(
                "auto", 999888, 999888) == "grid"
            assert chamfer_mod.resolve_chamfer_mode(
                "auto", 999888, 999888) == "grid"
        msgs = [r for r in rec if "APPROXIMATE" in str(r.message)]
        assert len(msgs) == 1  # one-time per cloud-size key

    def test_config_accepts_auto(self):
        from nope_nerf_tpu.config import check_supported

        check_supported({"tpu": {"chamfer_mode": "auto"}})
        with pytest.raises(ValueError, match="chamfer_mode"):
            check_supported({"tpu": {"chamfer_mode": "morton"}})

    def test_auto_matches_exact_below_crossover(self):
        """Below the crossover, auto's loss is bitwise the exact mode's."""
        import jax.numpy as jnp

        from nope_nerf_tpu.losses.losses import total_loss

        rng = np.random.RandomState(0)
        X = jnp.asarray(rng.randn(96, 3).astype(np.float32))
        Y = jnp.asarray(rng.randn(80, 3).astype(np.float32))
        weights = {"rgb_weight": 0.0, "depth_weight": 0.0, "pc_weight": 1.0,
                   "rgb_s_weight": 0.0, "depth_consistency_weight": 0.0,
                   "weight_dist_1st_loss": 0.0, "weight_dist_2nd_loss": 0.0}
        kw = dict(X=X, Y=Y)
        l_auto = total_loss(weights, chamfer_mode="auto", **kw)
        l_exact = total_loss(weights, chamfer_mode="exact", **kw)
        np.testing.assert_array_equal(np.asarray(l_auto["loss"]),
                                      np.asarray(l_exact["loss"]))

    def test_auto_takes_grid_above_crossover(self, monkeypatch):
        """Above the (monkeypatched) crossover, auto's loss is bitwise the
        grid mode's — proving total_loss routes through the resolver."""
        import jax.numpy as jnp

        import nope_nerf_tpu.ops.chamfer as chamfer_mod
        from nope_nerf_tpu.losses.losses import total_loss

        # force the exact cost model sky-high so auto resolves to grid at
        # this toy size
        monkeypatch.setattr(chamfer_mod, "_EXACT_MS_PER_PAIR", 1e6)
        rng = np.random.RandomState(1)
        X = jnp.asarray(rng.randn(96, 3).astype(np.float32))
        Y = jnp.asarray(rng.randn(80, 3).astype(np.float32))
        weights = {"rgb_weight": 0.0, "depth_weight": 0.0, "pc_weight": 1.0,
                   "rgb_s_weight": 0.0, "depth_consistency_weight": 0.0,
                   "weight_dist_1st_loss": 0.0, "weight_dist_2nd_loss": 0.0}
        kw = dict(X=X, Y=Y, chamfer_window=32)
        l_auto = total_loss(weights, chamfer_mode="auto", **kw)
        l_grid = total_loss(weights, chamfer_mode="grid", **kw)
        np.testing.assert_array_equal(np.asarray(l_auto["loss"]),
                                      np.asarray(l_grid["loss"]))


class TestThroughputMultiplier:
    def test_rays_per_step_counts_k_batches(self, tmp_path, monkeypatch):
        """VERDICT-r3 item 7: with rays_per_step_multiplier k the production
        logger must account k x n_training_points rays per step, matching
        bench.py (which computes steps * N_RAYS * k)."""
        import nope_nerf_tpu.training.loop as loop_mod

        captured = {}
        real = loop_mod.Throughput

        class Spy(real):
            def __init__(self, rays_per_step):
                captured["rays_per_step"] = rays_per_step
                super().__init__(rays_per_step)

        monkeypatch.setattr(loop_mod, "Throughput", Spy)
        scene = SyntheticScene(n_frames=4, hw=(16, 20), num_points=16)
        cfg = tiny_config(scene, str(tmp_path / "out"),
                          n_training_points=64, num_points=16)
        cfg["training"].update({"scheduling_start": 0, "annealing_epochs": 0,
                                "auto_scheduler": False})
        cfg["tpu"]["rays_per_step_multiplier"] = 4
        loop_mod.train(cfg, max_epochs=1, scene=scene)
        assert captured["rays_per_step"] == 64 * 4


class TestBenchSupervisor:
    def test_child_failure_is_retried_then_reported(self, tmp_path,
                                                    monkeypatch):
        """The supervisor retries a failing child with backoff and returns
        the final rc; a succeeding child's stdout is forwarded verbatim."""
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        import bench

        calls = {"n": 0}

        class FakeProc:
            def __init__(self, rc, out):
                self.returncode = rc
                self.stdout = out
                self.stderr = ""

        def fake_run(cmd, env=None, capture_output=None, text=None):
            calls["n"] += 1
            assert env.get("_BENCH_CHILD") == "1"
            if calls["n"] < 2:
                return FakeProc(1, "")
            return FakeProc(0, '{"metric": "x"}\n')

        monkeypatch.setattr(subprocess, "run", fake_run)
        monkeypatch.setattr(bench.time, "sleep", lambda s: None)
        rc = bench._supervise()
        assert rc == 0 and calls["n"] == 2

        calls["n"] = 0
        monkeypatch.setattr(
            subprocess, "run",
            lambda *a, **k: (calls.__setitem__("n", calls["n"] + 1),
                             FakeProc(3, ""))[1],
        )
        rc = bench._supervise()
        assert rc == 3 and calls["n"] == bench.BENCH_ATTEMPTS
