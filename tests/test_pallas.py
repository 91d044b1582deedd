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
