"""Round-2 behaviors: rigid inverse, precomputed resize pyramid parity,
auto-mask, honored config keys (rgb_loss_type, focalx/focaly,
log_scale_shift_per_view), grid-sample identity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nope_nerf_tpu.utils.synthetic import SyntheticScene, tiny_config


@pytest.fixture(scope="module")
def scene():
    return SyntheticScene(n_frames=4, hw=(16, 20), num_points=16)


@pytest.fixture()
def cfg(scene, tmp_path):
    return tiny_config(scene, str(tmp_path / "out"), n_training_points=64,
                       num_points=16)


def _scalars():
    return {
        "weights": {
            "rgb_weight": np.float32(1.0),
            "depth_weight": np.float32(0.04),
            "pc_weight": np.float32(1.0),
            "rgb_s_weight": np.float32(1.0),
            "depth_consistency_weight": np.float32(0.0),
            "weight_dist_1st_loss": np.float32(0.0),
            "weight_dist_2nd_loss": np.float32(0.0),
        },
        "w_l1": np.float32(1.0),
        "w_l2": np.float32(0.0),
        "lrs": {g: np.float32(1e-3) for g in
                ("nerf", "pose", "focal", "distortion")},
    }


def test_rigid_inv_matches_linalg_inv():
    from nope_nerf_tpu.geometry.rays import rigid_inv
    from nope_nerf_tpu.geometry.so3 import exp_so3

    R = exp_so3(jnp.array([0.3, -0.2, 0.8]))
    M = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(jnp.array([1.0, -2.0, 0.5]))
    np.testing.assert_allclose(
        np.asarray(rigid_inv(M)), np.asarray(jnp.linalg.inv(M)),
        rtol=0, atol=1e-6,
    )


def test_grid_sample_identity_at_pixel_grid():
    # the identity the trainer's rgb_pc1 relies on: sampling an image at its
    # own arange_pixels grid with align_corners=True returns the image
    from nope_nerf_tpu.geometry.rays import arange_pixels
    from nope_nerf_tpu.ops.interp import grid_sample

    img = jnp.asarray(np.random.RandomState(0).rand(7, 9, 3), jnp.float32)
    _, p = arange_pixels((7, 9))
    out = grid_sample(img, p, mode="bilinear", align_corners=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img).reshape(-1, 3),
                               atol=1e-6)


def test_pyramid_parity_with_and_without_smalls(cfg, scene):
    """The precomputed imgs_small/dpts_small path must match the in-trace
    resize fallback exactly (same rng, same loss, same grads)."""
    from nope_nerf_tpu.training.loop import build_params, scene_batch_arrays
    from nope_nerf_tpu.training.trainer import compute_loss, make_render_cfg

    cfg = dict(cfg)
    cfg["_num_cams"] = scene.N_imgs
    # non-trivial distortion params so the affine-commute claim is exercised
    params, init_c2w = build_params(cfg, scene, jax.random.PRNGKey(1))
    params["distortion"]["scales"] = (
        params["distortion"]["scales"] + 0.3 * np.arange(scene.N_imgs)[:, None]
    )
    params["distortion"]["shifts"] = (
        params["distortion"]["shifts"] - 0.1 * np.arange(scene.N_imgs)[:, None]
    )
    batch = scene_batch_arrays(scene, cfg)
    batch["idx"] = jnp.int32(3)  # last frame -> exercises the swap branch
    batch["ref_idx"] = jnp.int32(1)
    batch["camera_mat_gt"] = jnp.asarray(scene.K)
    batch["scale_mat"] = jnp.asarray(scene.scale_mat)
    assert "imgs_small" in batch and "dpts_small" in batch
    batch_nosmall = {k: v for k, v in batch.items()
                     if k not in ("imgs_small", "dpts_small")}

    static = {"render_model": True, "use_ref": True, "use_rgb_s": True}
    rng = jax.random.PRNGKey(7)
    kw = dict(cfg=cfg, static=static, init_c2w=init_c2w,
              render_cfg=make_render_cfg(cfg))

    def loss_of(b):
        return compute_loss(params, b, _scalars(), rng, **kw)[0]

    (l1, g1) = jax.value_and_grad(lambda p: compute_loss(
        p, batch, _scalars(), rng, **kw)[0])(params)
    (l2, g2) = jax.value_and_grad(lambda p: compute_loss(
        p, batch_nosmall, _scalars(), rng, **kw)[0])(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5),
        g1, g2,
    )


def test_focal_aux_and_scale_steps(cfg, scene):
    from nope_nerf_tpu.training.loop import build_params, scene_batch_arrays
    from nope_nerf_tpu.training.trainer import (
        init_train_state,
        make_epoch_step,
        make_render_cfg,
    )

    cfg = dict(cfg)
    cfg["_num_cams"] = scene.N_imgs
    cfg["pose"] = dict(cfg["pose"])
    cfg["pose"]["learn_focal"] = True  # focalx/focaly only logged then
    params, init_c2w = build_params(cfg, scene, jax.random.PRNGKey(1))
    state, _ = init_train_state(params)
    epoch_fn = make_epoch_step(cfg, make_render_cfg(cfg), init_c2w)
    arrs = scene_batch_arrays(scene, cfg)
    arrs["camera_mat_gt"] = jnp.asarray(scene.K)
    arrs["scale_mat"] = jnp.asarray(scene.scale_mat)
    n = scene.N_imgs
    static = {"render_model": True, "use_ref": True, "use_rgb_s": True}
    state2, aux_mean, aux_last = epoch_fn(
        state, arrs, jnp.arange(n, dtype=jnp.int32),
        jnp.roll(jnp.arange(n, dtype=jnp.int32), 1), _scalars(),
        jax.random.PRNGKey(0), static,
    )
    # focal ratio logged like the reference (`model/training.py:372-374`)
    assert "focalx" in aux_mean and "focaly" in aux_mean
    assert np.isfinite(float(aux_mean["focalx"]))
    # per-step scale/shift for log_scale_shift_per_view
    assert aux_last["scale_steps"].shape == (n,)
    assert aux_last["shift_steps"].shape == (n,)


def test_auto_mask_gates_rgb_s():
    from nope_nerf_tpu.losses.losses import rgb_s_loss

    h, w = 4, 6
    rgb1 = jnp.zeros((h, w, 3))
    rgb2 = jnp.full((h, w, 3), 0.5)      # warped: err 0.5 everywhere
    ori_better = jnp.full((h, w, 3), 0.1)   # unwarped explains rgb1 better
    ori_worse = jnp.full((h, w, 3), 0.9)    # unwarped is worse
    valid = jnp.ones((h, w, 1))
    # warp worse than ori everywhere -> mask empty -> loss 0
    l_masked = rgb_s_loss(rgb1, rgb2, valid, rgb2_ori=ori_better)
    assert float(l_masked) == 0.0
    # warp better than ori everywhere -> mask full -> plain mean
    l_kept = rgb_s_loss(rgb1, rgb2, valid, rgb2_ori=ori_worse)
    np.testing.assert_allclose(float(l_kept), 0.5, atol=1e-6)


def test_rgb_loss_type_honored(cfg):
    from nope_nerf_tpu.training.scheduler import Scheduler

    cfg = dict(cfg)
    cfg["training"] = dict(cfg["training"])
    cfg["training"]["rgb_loss_type"] = "l2"
    sched = Scheduler(cfg)
    assert sched.rgb_loss_switch(0) == (0.0, 1.0)
    cfg["training"]["rgb_loss_type"] = "l1"
    sched = Scheduler(cfg)
    assert sched.rgb_loss_switch(0) == (1.0, 0.0)
    s = cfg["training"]["scheduling_start"]
    a = cfg["training"]["annealing_epochs"]
    assert sched.rgb_loss_switch(s + a) == (0.0, 1.0)


def test_matmul_bf16_custom_vjp_grads():
    """The bf16 matmul's custom vjp must match the f32 grads to bf16
    round-off — and its backward matmuls must themselves be bf16 (the
    profiler showed f32 backward convolutions dominating the MLP step)."""
    import jax
    import jax.numpy as jnp

    from nope_nerf_tpu.models.nerf import _matmul_bf16

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (64, 63))
    w = jax.random.normal(k2, (63, 32)) / 8.0
    ct = jax.random.normal(k3, (64, 32))

    def f_bf16(x, w):
        return jnp.sum(_matmul_bf16(x, w) * ct)

    def f_f32(x, w):
        return jnp.sum(x @ w * ct)

    gx, gw = jax.grad(f_bf16, argnums=(0, 1))(x, w)
    gx32, gw32 = jax.grad(f_f32, argnums=(0, 1))(x, w)
    assert gx.dtype == jnp.float32 and gw.dtype == jnp.float32
    np.testing.assert_allclose(gx, gx32, rtol=0.05, atol=0.15)
    np.testing.assert_allclose(gw, gw32, rtol=0.05, atol=0.3)
    # backward lowers to bf16 dots: the HLO must not contain f32xf32 dots
    hlo = jax.jit(jax.grad(f_bf16, argnums=(0, 1))).lower(x, w).as_text()
    for line in hlo.splitlines():
        if " dot(" in line and "bf16" not in line:
            raise AssertionError(f"f32 dot survived in backward: {line}")


def test_check_supported_config():
    """Unsupported reference keys fail loudly instead of silently:
    network_type != 'official' and match_method != 'dense' CRASH the
    reference itself; validate_every > 0 hits a method that does not exist
    there (train.py:243)."""
    import warnings

    import pytest as _pytest

    from nope_nerf_tpu.config import check_supported

    check_supported({})  # defaults fine
    check_supported({"model": {"network_type": "official"},
                     "training": {"match_method": "dense",
                                  "validate_every": -1}})
    with _pytest.raises(ValueError, match="network_type"):
        check_supported({"model": {"network_type": "nerf"}})
    with _pytest.raises(ValueError, match="match_method"):
        check_supported({"training": {"match_method": "sparse"}})
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        check_supported({"training": {"validate_every": 100}})
    assert any("validate_every" in str(x.message) for x in w)
    # depth_consistency_weight != 0 crashes the reference
    # (model/losses.py:185-186 with d1_proj=None) -> loud error, both the
    # scheduled-pair and scalar config forms
    with _pytest.raises(ValueError, match="depth_consistency_weight"):
        check_supported(
            {"training": {"depth_consistency_weight": [0.0, 0.1]}})
    with _pytest.raises(ValueError, match="depth_consistency_weight"):
        check_supported({"training": {"depth_consistency_weight": 0.1}})
    check_supported({"training": {"depth_consistency_weight": [0.0, 0.0]}})
    # matmul_precision warning decides from the CONFIG alone (ADVICE r3:
    # querying jax.default_backend() in validation initializes the backend
    # as a side effect, which can hang on a broken TPU session): it fires
    # unless BOTH mlp flags are explicitly False
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        check_supported({"tpu": {"matmul_precision": "highest"}})
    assert any("matmul_precision" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        check_supported({"tpu": {"matmul_precision": "highest",
                                 "mlp_bf16": False,
                                 "use_pallas_mlp": False}})
    assert not any("matmul_precision" in str(x.message) for x in w)


@pytest.mark.parametrize("k", [2, 4])
def test_rays_per_step_multiplier_convergence(k):
    """tpu.rays_per_step_multiplier: the step consumes k frames' ray
    batches (VERDICT r1 item 10); training still converges and the loss
    structure is unchanged. k=4 is the marketed headline scaling config
    (BASELINE.md: 112.9k rays/s), so its convergence is gated here too
    (VERDICT r3 item 4)."""
    import jax
    import jax.numpy as jnp

    from nope_nerf_tpu.training.loop import build_params, scene_batch_arrays
    from nope_nerf_tpu.training.trainer import (
        init_train_state,
        make_epoch_step,
        make_render_cfg,
    )
    from nope_nerf_tpu.utils.synthetic import SyntheticScene, tiny_config

    scene = SyntheticScene(n_frames=4, hw=(16, 20), num_points=16)
    cfg = tiny_config(scene, "/tmp/mult_out", num_points=16,
                      n_training_points=64)
    cfg["_num_cams"] = scene.N_imgs
    cfg.setdefault("tpu", {})["rays_per_step_multiplier"] = k

    params, init_c2w = build_params(cfg, scene, jax.random.PRNGKey(0))
    state, _ = init_train_state(params)
    batch = scene_batch_arrays(scene, cfg)
    batch["camera_mat_gt"] = jnp.asarray(scene.K)
    batch["scale_mat"] = jnp.asarray(scene.scale_mat)
    scalars = {
        "weights": {
            "rgb_weight": np.float32(1.0),
            "depth_weight": np.float32(0.04),
            "pc_weight": np.float32(1.0),
            "rgb_s_weight": np.float32(1.0),
            "depth_consistency_weight": np.float32(0.0),
            "weight_dist_1st_loss": np.float32(0.0),
            "weight_dist_2nd_loss": np.float32(0.0),
        },
        "w_l1": np.float32(1.0),
        "w_l2": np.float32(0.0),
        "lrs": {g: np.float32(1e-3) for g in
                ("nerf", "pose", "focal", "distortion")},
    }
    static = {"render_model": True, "use_ref": True, "use_rgb_s": True}
    epoch_fn = make_epoch_step(cfg, make_render_cfg(cfg), init_c2w)
    n = scene.N_imgs
    # (steps, k=2) frame matrix per epoch
    rng = np.random.default_rng(0)
    losses = []
    for e in range(14):
        order = rng.permutation(n)
        extra = rng.integers(0, n, size=(n, k - 1))
        idxs = np.concatenate([order[:, None], extra], axis=1).astype(np.int32)
        refs = ((order + 1) % n).astype(np.int32)
        state, aux, _ = epoch_fn(
            state, batch, jnp.asarray(idxs), jnp.asarray(refs), scalars,
            jax.random.fold_in(jax.random.PRNGKey(7), e), static,
        )
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.6 * losses[0], losses
