"""Multi-chip sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4d):
sharded training step must match the single-device step to tolerance, and the
driver entry points must compile and run."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nope_nerf_tpu.parallel.mesh import make_ray_mesh, shard_train_step
from nope_nerf_tpu.training.loop import build_params, scene_device_arrays
from nope_nerf_tpu.training.trainer import (
    init_train_state,
    make_render_cfg,
    make_train_step,
)
from nope_nerf_tpu.utils.synthetic import SyntheticScene, tiny_config


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    scene = SyntheticScene(n_frames=4, hw=(16, 20), num_points=16)
    cfg = tiny_config(
        scene, str(tmp_path_factory.mktemp("out")), n_training_points=64,
        num_points=16,
    )
    cfg["_num_cams"] = scene.N_imgs
    params, init_c2w = build_params(cfg, scene, jax.random.PRNGKey(1))
    state, _ = init_train_state(params)
    imgs, dpts = scene_device_arrays(scene)
    batch = {
        "imgs": imgs,
        "dpts": dpts,
        "idx": jnp.int32(0),
        "ref_idx": jnp.int32(1),
        "camera_mat_gt": jnp.asarray(scene.K),
        "scale_mat": jnp.asarray(scene.scale_mat),
    }
    scalars = {
        "weights": {
            k: np.float32(v)
            for k, v in dict(
                rgb_weight=1.0, depth_weight=0.04, pc_weight=1.0,
                rgb_s_weight=1.0, depth_consistency_weight=0.0,
                weight_dist_1st_loss=0.0, weight_dist_2nd_loss=0.0,
            ).items()
        },
        "w_l1": np.float32(1.0),
        "w_l2": np.float32(0.0),
        "lrs": {g: np.float32(1e-3) for g in
                ("nerf", "pose", "focal", "distortion")},
    }
    static = {"render_model": True, "use_ref": True, "use_rgb_s": True}
    return cfg, state, batch, scalars, static, init_c2w


class TestShardedStep:
    def test_eight_devices_available(self):
        assert len(jax.devices()) >= 8

    def test_sharded_matches_single(self, setup):
        cfg, state, batch, scalars, static, init_c2w = setup
        rcfg = make_render_cfg(cfg)
        rng = jax.random.PRNGKey(7)

        step1 = make_train_step(cfg, rcfg, init_c2w)
        s1, aux1 = step1(state, batch, scalars, rng, static)

        mesh = make_ray_mesh(8)
        step8 = shard_train_step(cfg, rcfg, init_c2w, mesh)
        s8, aux8 = step8(state, batch, scalars, rng, static)

        np.testing.assert_allclose(
            float(aux1["loss"]), float(aux8["loss"]), rtol=1e-4
        )
        # updated parameters agree across all four groups
        for g in ("nerf", "pose", "focal", "distortion"):
            l1 = jax.tree.leaves(s1.params[g])
            l8 = jax.tree.leaves(s8.params[g])
            for a, b in zip(l1, l8):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=2e-5,
                    err_msg=f"group {g}",
                )

    def test_mesh_too_large_raises(self):
        with pytest.raises(ValueError):
            make_ray_mesh(1024)


class TestGraftEntry:
    def test_entry_compiles(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        rgb, depth = out
        assert rgb.shape == (1024, 3) and depth.shape == (1024,)
        assert np.isfinite(np.asarray(rgb)).all()

    def test_dryrun_multichip(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestShardedEval:
    def test_sharded_render_image_matches(self):
        from nope_nerf_tpu.models import init_nerf_params
        from nope_nerf_tpu.ops.rendering import render_image

        cfg_model = {
            "model": {"hidden_dim": 32, "pos_enc_levels": 4,
                      "dir_enc_levels": 2, "occ_activation": "softplus"},
            "rendering": {"white_background": False},
        }
        rcfg = {
            "num_points": 8, "depth_range": [0.5, 4.0],
            "sample_option": "uniform", "dist_alpha": False,
            "use_ray_dir": True, "normalise_ray": True,
            "white_background": False, "normal_loss": False,
            "outside_steps": 0, "occ_activation": "softplus",
            "pos_enc_levels": 4, "dir_enc_levels": 2,
        }
        params = init_nerf_params(jax.random.PRNGKey(0), cfg_model)
        K = jnp.diag(jnp.array([1.0, -1.0, -1.0, 1.0]))
        rgb1, d1 = render_image(params, (8, 16), K, jnp.eye(4), jnp.eye(4),
                                rcfg, chunk=64)
        mesh = make_ray_mesh(8)
        rgb8, d8 = render_image(params, (8, 16), K, jnp.eye(4), jnp.eye(4),
                                rcfg, chunk=64, mesh=mesh)
        np.testing.assert_allclose(np.asarray(rgb1), np.asarray(rgb8),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d8), atol=1e-5)

    def test_sharded_render_image_fused_composite(self):
        """Mesh'd eval render through the fused MLP+compositing kernel
        (r3): render_image re-attaches the mesh inside the cached jit and
        the chunk loop rides fused_mlp_composite_sharded's shard_map.
        Parity vs the single-device fused render (identical kernel
        numerics) and exercises the pad-to-quantum path (64-ray chunks
        pad to R*n_dev = 1024)."""
        import nope_nerf_tpu.ops.pallas.mlp_kernel as mk
        from nope_nerf_tpu.models import init_nerf_params
        from nope_nerf_tpu.ops.rendering import render_image

        cfg_model = {
            "model": {"hidden_dim": 32, "pos_enc_levels": 4,
                      "dir_enc_levels": 2, "occ_activation": "softplus"},
            "rendering": {"white_background": False},
        }
        rcfg = {
            "num_points": 8, "depth_range": [0.5, 4.0],
            "sample_option": "uniform", "dist_alpha": False,
            "use_ray_dir": True, "normalise_ray": True,
            "white_background": False, "normal_loss": False,
            "outside_steps": 0, "occ_activation": "softplus",
            "pos_enc_levels": 4, "dir_enc_levels": 2,
            "mlp_bf16": True, "use_pallas_mlp": True,
            "fuse_compositing": True,
        }
        params = init_nerf_params(jax.random.PRNGKey(0), cfg_model)
        K = jnp.diag(jnp.array([1.0, -1.0, -1.0, 1.0]))
        mesh = make_ray_mesh(8)
        mk.INTERPRET = True
        try:
            rgb1, d1 = render_image(params, (8, 16), K, jnp.eye(4),
                                    jnp.eye(4), rcfg, chunk=64)
            rgb8, d8 = render_image(params, (8, 16), K, jnp.eye(4),
                                    jnp.eye(4), rcfg, chunk=64, mesh=mesh)
        finally:
            mk.INTERPRET = False
        np.testing.assert_allclose(np.asarray(rgb1), np.asarray(rgb8),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d8),
                                   atol=1e-5)

    def test_sharded_dpt_batched(self):
        from nope_nerf_tpu.models.dpt import apply_dpt_batched, init_dpt_params

        params = init_dpt_params(jax.random.PRNGKey(0))
        imgs = jnp.zeros((8, 32, 32, 3))
        mesh = make_ray_mesh(8)
        out = jax.jit(
            lambda p, im: apply_dpt_batched(p, im, mesh=mesh)
        )(params, imgs)
        assert out.shape == (8, 32, 32)
        assert np.isfinite(np.asarray(out)).all()


class TestMeshTrainLoop:
    def test_n_devices_config_drives_sharded_training(self, tmp_path):
        """tpu.n_devices in the config wires the production train() loop
        through the ray mesh (not just the dryrun/tests): 3 epochs on the
        8-device CPU mesh must run, log and keep loss finite."""
        import json
        import os

        from nope_nerf_tpu.training.loop import train

        scene = SyntheticScene(n_frames=4, hw=(16, 20), num_points=16)
        cfg = tiny_config(scene, str(tmp_path / "mesh_out"),
                          n_training_points=64, num_points=16)
        cfg["training"].update({
            "scheduling_start": 0, "annealing_epochs": 0,
            "auto_scheduler": False, "eval_pose_every": 0,
            # exercise the auxiliary render paths UNDER the mesh — they
            # must thread the mesh through (render_visdata/render_image and
            # the reprojection pair dump jit separate programs from the
            # train step and would otherwise build mesh-less jits over
            # mesh-committed params)
            "visualize_every": 8, "vis_reprojection_every": 8,
            "vis_resolution": [16, 20], "checkpoint_every": 0,
        })
        cfg.setdefault("tpu", {})["n_devices"] = 8
        train(cfg, max_epochs=3, scene=scene)
        events = [
            json.loads(l)
            for l in open(os.path.join(cfg["training"]["out_dir"], "logs",
                                       "events.jsonl"))
        ]
        losses = [e["value"] for e in events if e["tag"] == "train/loss"]
        psnrs = [e["value"] for e in events if e["tag"] == "train/psnr"]
        assert len(psnrs) == 3
        assert np.isfinite(losses).all() and np.isfinite(psnrs).all()


    def test_mesh_composes_with_rays_multiplier(self, tmp_path):
        """tpu.n_devices=8 and tpu.rays_per_step_multiplier=2 together: the
        vmapped multi-frame sampling must still shard and run."""
        from nope_nerf_tpu.training.loop import train

        scene = SyntheticScene(n_frames=4, hw=(16, 20), num_points=16)
        cfg = tiny_config(scene, str(tmp_path / "mm_out"),
                          n_training_points=64, num_points=16)
        cfg["training"].update({
            "scheduling_start": 0, "annealing_epochs": 0,
            "auto_scheduler": False, "eval_pose_every": 0,
            "visualize_every": 0, "checkpoint_every": 0,
        })
        cfg.setdefault("tpu", {}).update(
            {"n_devices": 8, "rays_per_step_multiplier": 2})
        state, _, _ = train(cfg, max_epochs=2, scene=scene)
        assert all(
            np.isfinite(np.asarray(l)).all()
            for l in jax.tree.leaves(state.params)
        )


class TestMultiplierMeshPallas:
    @pytest.mark.parametrize("fuse", [False, True])
    def test_vmap_of_shard_map_of_pallas(self, setup, fuse):
        """rays_per_step_multiplier=2 + mesh + the Pallas field path: the
        multi-frame branch puts shard_map(pallas_call) INSIDE
        jax.vmap(_sample_and_render) (trainer.py) — ADVICE r2 flagged this
        as never exercised (the CPU-mesh gate disables Pallas and the
        driver dryrun had been red). Exercised here with interpret-mode
        kernels on the 8-device mesh, and on real TPU with a 1-device mesh
        (r3: both fused and unfused compiled and matched, loss 1.0260).
        Parity vs the mesh-less Pallas path pins the values."""
        import nope_nerf_tpu.ops.pallas.mlp_kernel as mk
        from nope_nerf_tpu.training.trainer import compute_loss

        cfg, state, batch, scalars, static, init_c2w = setup
        cfg = dict(cfg)
        cfg["tpu"] = {**cfg.get("tpu", {}), "rays_per_step_multiplier": 2}
        rcfg = dict(make_render_cfg(cfg))
        rcfg.update(use_pallas_mlp=True, fuse_compositing=fuse,
                    mlp_bf16=True)
        batch = dict(batch)
        batch["idx"] = jnp.array([0, 1], jnp.int32)
        rng = jax.random.PRNGKey(11)
        mesh = make_ray_mesh(8)

        def make_loss(rc, mesh_):
            def loss(params):
                return compute_loss(
                    params, batch, scalars, rng, cfg=cfg, static=static,
                    init_c2w=init_c2w, render_cfg=rc, mesh=mesh_)[0]
            return loss

        mk.INTERPRET = True
        try:
            l_ref = jax.jit(
                make_loss(dict(rcfg, pallas_mesh=None), None))(state.params)
            l_mesh, g_mesh = jax.jit(jax.value_and_grad(
                make_loss(dict(rcfg, pallas_mesh=mesh), mesh)))(state.params)
        finally:
            mk.INTERPRET = False
        np.testing.assert_allclose(float(l_mesh), float(l_ref), rtol=1e-5)
        assert all(np.isfinite(np.asarray(x)).all()
                   for x in jax.tree.leaves(g_mesh))


class TestShardedFusedMLP:
    def test_sharded_matches_single(self):
        """fused_mlp_sharded (shard_map, interpret kernels) reproduces the
        single-device fused_mlp forward AND gradients — weight cotangents
        psum over the mesh, point cotangents stay sharded."""
        import nope_nerf_tpu.ops.pallas.mlp_kernel as mk
        from nope_nerf_tpu.models.nerf import init_nerf_params

        cfg = {
            "model": {"hidden_dim": 256, "pos_enc_levels": 10,
                      "dir_enc_levels": 4, "occ_activation": "softplus"},
            "rendering": {"white_background": False},
        }
        params = init_nerf_params(jax.random.PRNGKey(3), cfg)
        W = mk.collect_weights(params)
        rng = np.random.default_rng(5)
        M = 8 * mk.BM  # one tile per device
        pts = jnp.asarray(rng.normal(size=(M, 3)), jnp.float32)
        dirs = jnp.asarray(rng.normal(size=(M, 3)), jnp.float32)
        mesh = make_ray_mesh(8)

        def loss(W, p, d, sharded):
            f = (lambda *a: mk.fused_mlp_sharded(*a, mesh)) if sharded \
                else mk.fused_mlp
            rgb, den = f(W, p, d, 10, 4, "softplus", True)
            return jnp.mean(rgb**2) + jnp.mean(den * jnp.cos(den))

        mk.INTERPRET = True
        try:
            ref = jax.grad(loss, argnums=(0, 1, 2))(W, pts, dirs, False)
            got = jax.grad(loss, argnums=(0, 1, 2))(W, pts, dirs, True)
            out_ref = mk.fused_mlp(W, pts, dirs, 10, 4, "softplus", True)
            out_got = mk.fused_mlp_sharded(W, pts, dirs, 10, 4, "softplus",
                                           True, mesh)
        finally:
            mk.INTERPRET = False
        for a, b in zip(out_got, out_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)
        for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
            scale = max(np.abs(np.asarray(b)).max(), 1e-6)
            np.testing.assert_allclose(np.asarray(a) / scale,
                                       np.asarray(b) / scale, atol=1e-5)


class TestShardedChamfer:
    def test_sharded_pallas_matches_xla(self):
        """chamfer_loss_pallas_sharded (shard_map, interpret kernels) ==
        single-device XLA chamfer on the 8-dev CPU mesh, with cloud sizes
        NOT divisible by the mesh (pad path) — VERDICT r1 item 8."""
        from nope_nerf_tpu.ops.chamfer import chamfer_loss
        from nope_nerf_tpu.ops.pallas.chamfer_kernel import (
            chamfer_loss_pallas_sharded,
        )

        rng = np.random.default_rng(3)
        X = jnp.asarray(rng.normal(size=(403, 3)), jnp.float32)
        Y = jnp.asarray(rng.normal(size=(517, 3)), jnp.float32)
        mesh = make_ray_mesh(8)
        want = float(chamfer_loss(X, Y, block=256))
        got = float(chamfer_loss_pallas_sharded(X, Y, mesh, interpret=True))
        assert abs(got - want) < 1e-6

    def test_sharded_pallas_grads_match(self):
        """Gradients flow through the shard_map + all_gather transpose."""
        from nope_nerf_tpu.ops.chamfer import chamfer_loss
        from nope_nerf_tpu.ops.pallas.chamfer_kernel import (
            chamfer_loss_pallas_sharded,
        )

        rng = np.random.default_rng(4)
        X = jnp.asarray(rng.normal(size=(96, 3)), jnp.float32)
        Y = jnp.asarray(rng.normal(size=(120, 3)), jnp.float32)
        mesh = make_ray_mesh(8)
        gx_ref, gy_ref = jax.grad(
            lambda a, b: chamfer_loss(a, b, block=64), argnums=(0, 1)
        )(X, Y)
        gx, gy = jax.grad(
            lambda a, b: chamfer_loss_pallas_sharded(a, b, mesh,
                                                     interpret=True),
            argnums=(0, 1),
        )(X, Y)
        np.testing.assert_allclose(gx, gx_ref, atol=1e-6)
        np.testing.assert_allclose(gy, gy_ref, atol=1e-6)


class TestShardedDPTPreprocess:
    def test_frame_batch_sharded_matches_unsharded(self):
        """SURVEY.md §2.5's DPT batched-frame parallelism: sharding the
        frame batch over the mesh must not change the depths (params
        replicated, frames independent)."""
        from nope_nerf_tpu.models.dpt import apply_dpt_batched, init_dpt_params

        params = init_dpt_params(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.uniform(size=(8, 32, 32, 3)), jnp.float32)
        mesh = make_ray_mesh(8)
        want = np.asarray(jax.jit(apply_dpt_batched)(params, imgs))
        got = np.asarray(
            jax.jit(lambda p, im: apply_dpt_batched(p, im, mesh=mesh))(
                params, imgs))
        np.testing.assert_allclose(got, want, atol=1e-5)
