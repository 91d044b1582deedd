"""Pallas kernel tests (interpreter mode on CPU; compiled parity runs on TPU
via the ablation/bench drivers)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestChamferKernel:
    def test_matches_xla_impl(self, rng):
        from nope_nerf_tpu.ops.chamfer import nearest_idx
        from nope_nerf_tpu.ops.pallas.chamfer_kernel import nearest_idx_pallas

        X = jnp.asarray(rng.normal(size=(1500, 3)), jnp.float32)
        Y = jnp.asarray(rng.normal(size=(2100, 3)), jnp.float32)
        ix1, iy1 = nearest_idx(X, Y, block=512)
        ix2, iy2 = nearest_idx_pallas(X, Y, interpret=True)
        np.testing.assert_array_equal(np.asarray(ix1), np.asarray(ix2))
        np.testing.assert_array_equal(np.asarray(iy1), np.asarray(iy2))

    def test_validity_masks(self, rng):
        from nope_nerf_tpu.ops.pallas.chamfer_kernel import nearest_idx_pallas

        X = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
        Y = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
        yv = jnp.zeros(64).at[7].set(1.0)  # only y[7] valid
        ix, _ = nearest_idx_pallas(X, Y, y_valid=yv, interpret=True)
        assert (np.asarray(ix) == 7).all()

    def test_loss_matches(self, rng):
        from nope_nerf_tpu.ops.chamfer import chamfer_loss
        from nope_nerf_tpu.ops.pallas.chamfer_kernel import chamfer_loss_pallas

        X = jnp.asarray(rng.normal(size=(700, 3)), jnp.float32)
        Y = jnp.asarray(rng.normal(size=(900, 3)), jnp.float32)
        l1 = float(chamfer_loss(X, Y, block=256))
        l2 = float(chamfer_loss_pallas(X, Y, interpret=True))
        assert abs(l1 - l2) < 1e-6


class TestLPIPS:
    def test_random_init_shapes(self, rng):
        from nope_nerf_tpu.models.lpips import init_lpips_params, lpips_distance

        params = init_lpips_params(jax.random.PRNGKey(0))
        a = jnp.asarray(rng.uniform(size=(64, 64, 3)), jnp.float32)
        b = jnp.asarray(rng.uniform(size=(64, 64, 3)), jnp.float32)
        d_same = float(lpips_distance(params, a, a))
        d_diff = float(lpips_distance(params, a, b))
        assert d_same < 1e-8
        assert d_diff > 0 and np.isfinite(d_diff)


class TestFusedMLP:
    """Interpret-mode parity of the fused Pallas MLP (ops/pallas/mlp_kernel)
    against the XLA field — forward and full gradients."""

    def _setup(self, rng, M=2048):
        from nope_nerf_tpu.models.nerf import init_nerf_params

        cfg = {
            "model": {"hidden_dim": 256, "pos_enc_levels": 10,
                      "dir_enc_levels": 4, "occ_activation": "softplus"},
            "rendering": {"white_background": False},
        }
        params = init_nerf_params(jax.random.PRNGKey(3), cfg)
        pts = jnp.asarray(rng.normal(size=(M, 3)), jnp.float32)
        d = rng.normal(size=(M, 3))
        dirs = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True),
                           jnp.float32)
        cfg_model = {
            "occ_activation": "softplus", "pos_enc_levels": 10,
            "dir_enc_levels": 4, "dist_alpha": False,
        }
        return params, pts, dirs, cfg_model

    @pytest.mark.parametrize("act,dist_alpha", [
        ("softplus", False),   # occupancy alpha in-kernel
        ("softplus", True),    # raw softplus density
        ("relu", False),
        ("relu", True),
    ])
    def test_forward_matches_xla(self, rng, act, dist_alpha):
        """All four activation-epilogue branches (softplus/relu x
        occupancy-alpha on/off) reproduce the XLA field."""
        import nope_nerf_tpu.ops.pallas.mlp_kernel as mk
        from nope_nerf_tpu.models.nerf import apply_nerf

        params, pts, dirs, cfg_model = self._setup(rng)
        cfg_model = dict(cfg_model, occ_activation=act,
                         dist_alpha=dist_alpha)
        rgb_ref, den_ref = apply_nerf(params, pts, dirs, cfg_model)
        mk.INTERPRET = True
        try:
            rgb, den = apply_nerf(params, pts, dirs,
                                  dict(cfg_model, use_pallas_mlp=True))
        finally:
            mk.INTERPRET = False
        # bf16 operands: rgb is post-sigmoid (well-conditioned), density
        # post-activation
        np.testing.assert_allclose(rgb, rgb_ref, atol=0.03)
        np.testing.assert_allclose(den, den_ref, rtol=0.08, atol=0.05)

    def test_relu_grads_match_xla(self, rng):
        """The relu density-activation backward branch (incl. the
        occupancy-alpha chain) against the f32 XLA gradients."""
        import nope_nerf_tpu.ops.pallas.mlp_kernel as mk
        from nope_nerf_tpu.models.nerf import apply_nerf

        params, pts, dirs, cfg_model = self._setup(rng, M=1024)
        cfg_model = dict(cfg_model, occ_activation="relu", dist_alpha=False)

        def loss(p, mode):
            cm = dict(cfg_model)
            if mode == "fused":
                cm["use_pallas_mlp"] = True
            elif mode == "bf16":
                cm["mlp_bf16"] = True
            rgb, den = apply_nerf(p, pts, dirs, cm)
            return jnp.mean(rgb**2) + jnp.mean(den * jnp.cos(den))

        g_ref = jax.grad(loss)(params, "bf16")
        mk.INTERPRET = True
        try:
            g_fused = jax.grad(loss)(params, "fused")
        finally:
            mk.INTERPRET = False
        for name in g_ref:
            for k in ("w", "b"):
                a = np.asarray(g_fused[name][k])
                b = np.asarray(g_ref[name][k])
                err = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)
                assert err < 0.02, f"{name}/{k}: relL2={err:.4f}"

    def test_grads_match_xla(self, rng):
        import nope_nerf_tpu.ops.pallas.mlp_kernel as mk
        from nope_nerf_tpu.models.nerf import apply_nerf

        params, pts, dirs, cfg_model = self._setup(rng, M=1024)

        def loss(p, pts_, dirs_, mode):
            cm = dict(cfg_model)
            if mode == "fused":
                cm["use_pallas_mlp"] = True
            elif mode == "bf16":
                cm["mlp_bf16"] = True
            rgb, den = apply_nerf(p, pts_, dirs_, cm)
            return jnp.mean(rgb**2) + jnp.mean(den * jnp.cos(den))

        # apples-to-apples reference is XLA's OWN bf16 path: both it and the
        # kernel deviate ~7% relL2 from f32 on input grads (inherent bf16
        # round-off through 10 chained matmuls x 2^9 encoding frequencies),
        # but agree with each other to <1% — asserting against f32 would
        # only measure bf16, not the kernel.
        g_ref = jax.grad(loss, argnums=(0, 1, 2))(params, pts, dirs, "bf16")
        mk.INTERPRET = True
        try:
            g_fused = jax.grad(loss, argnums=(0, 1, 2))(params, pts, dirs,
                                                        "fused")
        finally:
            mk.INTERPRET = False

        def check(a, b, nm, rel_l2=0.02):
            a, b = np.asarray(a), np.asarray(b)
            assert a.dtype == np.float32, nm
            err = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)
            assert err < rel_l2, f"{nm}: relL2={err:.4f}"

        for name in g_ref[0]:
            for k in ("w", "b"):
                check(g_fused[0][name][k], g_ref[0][name][k], f"{name}/{k}")
        check(g_fused[1], g_ref[1], "pts")
        check(g_fused[2], g_ref[2], "dirs")

class TestSplitDots:
    """The kernel's bf16 split-dot precision claims (mlp_kernel._split3 /
    _sel_dot): a 3-way bf16 split of f32 reconstructs to ~2^-27
    relative, and the 3-pass split selector dot inside _encode_fwd matches
    a full-f32 HIGHEST dot to float roundoff."""

    def test_split3_reconstructs_f32(self, rng):
        import nope_nerf_tpu.ops.pallas.mlp_kernel as mk

        v = jnp.asarray(
            rng.uniform(-8, 8, size=(512, 64)).astype(np.float32))
        v0, v1, v2 = mk._split3(v)
        rec = (v0.astype(jnp.float32) + v1.astype(jnp.float32)
               + v2.astype(jnp.float32))
        err = np.abs(np.asarray(rec - v))
        assert err.max() <= np.abs(np.asarray(v)).max() * 2**-26

    def test_split3_selector_dot_matches_highest(self, rng):
        """The _split3 3-pass dot against a bf16-exact selector (the
        pattern _encode_fwd uses for the frequency expansion) matches a
        full-f32 HIGHEST dot to float roundoff."""
        import nope_nerf_tpu.ops.pallas.mlp_kernel as mk

        # selector: 0/1 with exactly one hit per column
        sel = np.zeros((8, 128), np.float32)
        sel[rng.integers(0, 8, size=128), np.arange(128)] = 1.0
        sel = jnp.asarray(sel)
        v = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32) * 3)
        got = sum(
            jax.lax.dot_general(
                sel.astype(jnp.bfloat16), p, ((((0,), (0,))), ((), ())),
                preferred_element_type=jnp.float32)
            for p in mk._split3(v))
        want = jax.lax.dot_general(
            sel, v, ((((0,), (0,))), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=1e-6)

    def test_encode_fwd_matches_f64_reference(self, rng):
        """The in-kernel positional encoding (3-pass split selector dot +
        masks) against a float64 host-side reference — the top frequency
        2^9 amplifies any value error 512x, so this pins the claim that
        the split expansion is f32-exact."""
        import nope_nerf_tpu.ops.pallas.mlp_kernel as mk

        pts32 = rng.uniform(-4, 4, size=(64, 3)).astype(np.float32)
        enc = np.asarray(mk._encode_fwd(jnp.asarray(pts32), 10)[0])
        # reference channel order [x, sin_0, cos_0, sin_1, cos_1, ...],
        # from the SAME f32 points in float64 (scaling by 2^lv is exact)
        p64 = pts32.astype(np.float64)
        cols = [p64]
        for lv in range(10):
            arg = p64 * (2.0 ** lv)
            cols += [np.sin(arg), np.cos(arg)]
        want = np.concatenate(cols, axis=1)
        # remaining error is f32 sin argument reduction at |arg| ~ 2048
        # (~1.2e-4); a bf16-truncated expansion would be ~4.0 off here
        np.testing.assert_allclose(enc, want, atol=5e-4)


class TestFusedComposite:
    """Interpret-mode parity of the MLP+compositing kernel
    (fused_mlp_composite) against the unfused paths at the render_rays
    level — forward and gradients."""

    def _render(self, rng_np, cfg_over, mode, n=16, s=128, grad=False):
        import nope_nerf_tpu.ops.pallas.mlp_kernel as mk
        from nope_nerf_tpu.models.nerf import init_nerf_params
        from nope_nerf_tpu.ops.rendering import render_rays

        cfg = {
            "model": {"hidden_dim": 64, "pos_enc_levels": 10,
                      "dir_enc_levels": 4, "occ_activation": "softplus"},
            "rendering": {"white_background": False},
        }
        params = init_nerf_params(jax.random.PRNGKey(3), cfg)
        render_cfg = {
            "num_points": s, "depth_range": [0.1, 4.0],
            "sample_option": "uniform", "dist_alpha": False,
            "use_ray_dir": True, "normalise_ray": True,
            "white_background": False, "normal_loss": False,
            "outside_steps": 0, "occ_activation": "softplus",
            "pos_enc_levels": 10, "dir_enc_levels": 4,
            "mlp_bf16": True,
        }
        render_cfg.update(cfg_over)
        if mode == "fused":
            render_cfg.update(use_pallas_mlp=True, fuse_compositing=True)
        elif mode == "pallas":
            render_cfg.update(use_pallas_mlp=True, fuse_compositing=False)
        pixels = jnp.asarray(rng_np.uniform(-1, 1, size=(n, 2)), jnp.float32)
        depth = jnp.asarray(1.0 + rng_np.uniform(size=(n,)), jnp.float32)
        cam = jnp.asarray(np.diag([1.2, -1.1, -1.0, 1.0]), jnp.float32)
        world = jnp.eye(4, dtype=jnp.float32)
        scale = jnp.eye(4, dtype=jnp.float32)

        def fwd(p, w):
            out = render_rays(p, pixels, depth, cam, w, scale, render_cfg,
                              add_noise=False, eval_mode=False)
            return out

        mk.INTERPRET = True
        try:
            if grad:
                def loss(p, w):
                    out = fwd(p, w)
                    return (jnp.mean(out["rgb"] ** 2)
                            + jnp.mean(jnp.cos(out["depth_pred"])))
                return jax.grad(loss, argnums=(0, 1))(params, world)
            return jax.tree.map(
                lambda x: None if x is None else np.asarray(x), fwd(params, world)
            )
        finally:
            mk.INTERPRET = False

    @pytest.mark.parametrize("dist_alpha,white_bg,s,sample", [
        (False, False, 128, "uniform"),
        (True, False, 128, "uniform"),
        (True, True, 128, "uniform"),
        (False, False, 24, "uniform"),  # R=40 rays/block (non-128 samples)
        (False, False, 128, "ndc"),     # ndc_o/ndc_d enter the kernel
    ])
    def test_forward_matches_unfused_pallas(self, rng, dist_alpha,
                                            white_bg, s, sample):
        """Same MLP kernel numerics, so the only difference is the
        compositing itself (log-space cumprod vs XLA scan): tight bound."""
        over = {"dist_alpha": dist_alpha, "white_background": white_bg,
                "num_points": s, "sample_option": sample}
        a = self._render(rng, over, "fused", s=s)
        rng2 = np.random.default_rng(42)
        b = self._render(rng2, over, "pallas", s=s)
        np.testing.assert_allclose(a["rgb"], b["rgb"], atol=2e-5)
        np.testing.assert_allclose(a["depth_pred"], b["depth_pred"],
                                   atol=2e-4)
        np.testing.assert_allclose(a["alpha"], b["alpha"], atol=2e-5)
        np.testing.assert_allclose(a["depth_gt"], b["depth_gt"], atol=1e-6)

    def test_chunked_fallback_stays_on_composite_kernel(self, rng):
        """n_pts > n_max_network_queries with fuse_compositing on must chunk
        RAYS through the same fused kernel (r4 fix: the old fallback dropped
        to the point-level path) — identical numerics to one dispatch."""
        over = {"num_points": 24}
        a = self._render(rng, over, "fused", n=16, s=24)
        rng2 = np.random.default_rng(42)
        # 16x24=384 points, bound 96 -> 4 chunks of 4 rays via lax.map
        b = self._render(rng2, dict(over, n_max_network_queries=96),
                         "fused", n=16, s=24)
        np.testing.assert_allclose(a["rgb"], b["rgb"], atol=1e-6)
        np.testing.assert_allclose(a["depth_pred"], b["depth_pred"],
                                   atol=1e-6)
        np.testing.assert_allclose(a["alpha"], b["alpha"], atol=1e-6)

    def test_forward_matches_xla_bf16(self, rng):
        a = self._render(rng, {}, "fused")
        rng2 = np.random.default_rng(42)
        b = self._render(rng2, {}, "xla")
        np.testing.assert_allclose(a["rgb"], b["rgb"], atol=0.03)
        np.testing.assert_allclose(a["depth_pred"], b["depth_pred"],
                                   atol=0.05)

    def test_grads_match_unfused_pallas(self, rng):
        ga = self._render(rng, {"dist_alpha": True}, "fused", grad=True)
        rng2 = np.random.default_rng(42)
        gb = self._render(rng2, {"dist_alpha": True}, "pallas", grad=True)

        def check(x, y, nm, tol=2e-3):
            x, y = np.asarray(x), np.asarray(y)
            err = np.linalg.norm(x - y) / max(np.linalg.norm(y), 1e-12)
            assert err < tol, f"{nm}: relL2={err:.5f}"

        for name in gb[0]:
            for k in ("w", "b"):
                check(ga[0][name][k], gb[0][name][k], f"{name}/{k}")
        check(ga[1], gb[1], "world_mat")


def test_fused_mlp_padding(rng):
    """Non-multiple-of-BM batches are padded and sliced correctly."""
    import nope_nerf_tpu.ops.pallas.mlp_kernel as mk
    from nope_nerf_tpu.models.nerf import apply_nerf

    params, pts, dirs, cfg_model = TestFusedMLP()._setup(rng, M=1500)
    rgb_ref, den_ref = apply_nerf(params, pts, dirs, cfg_model)
    mk.INTERPRET = True
    try:
        rgb, den = apply_nerf(params, pts, dirs,
                              dict(cfg_model, use_pallas_mlp=True))
    finally:
        mk.INTERPRET = False
    assert rgb.shape == (1500, 3) and den.shape == (1500, 1)
    np.testing.assert_allclose(rgb, rgb_ref, atol=0.03)
