"""Unit tests for the geometry core: SO(3), camera/ray math, NDC, alignment.

Hand-computed values + round-trip identities (SURVEY.md §4 test strategy).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from nope_nerf_tpu.geometry import align, rays, so3


class TestSO3:
    def test_exp_zero_is_identity(self):
        R = so3.exp_so3(jnp.zeros(3))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    def test_exp_z_axis_90deg(self):
        r = jnp.array([0.0, 0.0, np.pi / 2])
        R = np.asarray(so3.exp_so3(r))
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
        np.testing.assert_allclose(R, expected, atol=1e-6)

    def test_exp_batched(self, rng):
        rs = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
        R_batch = np.asarray(so3.exp_so3(rs))
        for i in range(5):
            np.testing.assert_allclose(
                R_batch[i], np.asarray(so3.exp_so3(rs[i])), atol=1e-6
            )

    def test_exp_is_rotation(self, rng):
        r = jnp.asarray(rng.normal(size=3), jnp.float32)
        R = np.asarray(so3.exp_so3(r))
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert abs(np.linalg.det(R) - 1.0) < 1e-5

    def test_log_roundtrip(self, rng):
        r = jnp.asarray(0.5 * rng.normal(size=3), jnp.float32)
        R = so3.exp_so3(r)
        r2 = so3.so3_log(R)
        np.testing.assert_allclose(r2, r, atol=1e-4)

    def test_make_c2w(self):
        c2w = np.asarray(so3.make_c2w(jnp.zeros(3), jnp.array([1.0, 2.0, 3.0])))
        np.testing.assert_allclose(c2w[:3, :3], np.eye(3), atol=1e-6)
        np.testing.assert_allclose(c2w[:3, 3], [1, 2, 3], atol=1e-6)
        np.testing.assert_allclose(c2w[3], [0, 0, 0, 1])

    def test_quat_roundtrip(self, rng):
        from scipy.spatial.transform import Rotation

        Rm = Rotation.random(8, random_state=0).as_matrix()
        q = so3.rotation_matrix_to_quat(Rm)
        q_ref = Rotation.from_matrix(Rm).as_quat()
        # quaternions are sign-ambiguous
        for a, b in zip(q, q_ref):
            assert np.allclose(a, b, atol=1e-6) or np.allclose(a, -b, atol=1e-6)


class TestPixelsAndTransforms:
    def test_arange_pixels_corners(self):
        loc, scaled = rays.arange_pixels((4, 6))
        assert loc.shape == (24, 2)
        np.testing.assert_array_equal(loc[0], [0, 0])
        np.testing.assert_array_equal(loc[-1], [5, 3])
        np.testing.assert_allclose(scaled[0], [-1, -1], atol=1e-6)
        np.testing.assert_allclose(scaled[-1], [1, 1], atol=1e-6)
        # row-major: second entry is x=1, y=0
        np.testing.assert_array_equal(loc[1], [1, 0])

    def test_transform_world_roundtrip(self, rng):
        # world -> pixels -> world must round-trip through the K convention
        fx, fy, w, h = 500.0, 480.0, 640, 480
        K = jnp.array(
            [
                [2 * fx / w, 0, 0, 0],
                [0, -2 * fy / h, 0, 0],
                [0, 0, -1, 0],
                [0, 0, 0, 1],
            ],
            jnp.float32,
        )
        r = jnp.asarray(0.3 * rng.normal(size=3), jnp.float32)
        t = jnp.asarray(rng.normal(size=3), jnp.float32)
        c2w = so3.make_c2w(r, t)
        world_mat = jnp.linalg.inv(c2w)
        scale_mat = jnp.eye(4)

        pix = jnp.asarray(rng.uniform(-0.8, 0.8, size=(16, 2)), jnp.float32)
        depth = jnp.asarray(rng.uniform(1.0, 5.0, size=16), jnp.float32)
        p_world = rays.transform_to_world(pix, depth, K, world_mat, scale_mat)
        p_cam = rays.transform_to_camera_space(p_world, K, world_mat, scale_mat)
        # p_cam rows should be [x*d, y*d, d] in scaled pixel coords
        np.testing.assert_allclose(p_cam[:, 2], depth, atol=1e-4)
        np.testing.assert_allclose(p_cam[:, 0] / depth, pix[:, 0], atol=1e-4)
        np.testing.assert_allclose(p_cam[:, 1] / depth, pix[:, 1], atol=1e-4)

    def test_origin_to_world_is_camera_center(self, rng):
        r = jnp.asarray(0.3 * rng.normal(size=3), jnp.float32)
        t = jnp.asarray(rng.normal(size=3), jnp.float32)
        c2w = so3.make_c2w(r, t)
        world_mat = jnp.linalg.inv(c2w)
        K = jnp.diag(jnp.array([1.0, -1.0, -1.0, 1.0]))
        origin = rays.origin_to_world(K, world_mat, jnp.eye(4))
        np.testing.assert_allclose(origin, c2w[:3, 3], atol=1e-5)

    def test_identity_camera_ray_depth(self):
        # with identity pose, pixel (0,0) at depth d lands at z=-d (camera
        # looks down -z through the -1 in K[2,2])
        K = jnp.array(
            [[1.0, 0, 0, 0], [0, -1.0, 0, 0], [0, 0, -1.0, 0], [0, 0, 0, 1.0]]
        )
        p = rays.transform_to_world(
            jnp.zeros((1, 2)), jnp.array([2.0]), K, jnp.eye(4), jnp.eye(4)
        )
        np.testing.assert_allclose(p[0], [0, 0, -2.0], atol=1e-6)

    def test_project_to_cam_inverse_of_backproject(self, rng):
        K = jnp.array(
            [[1.2, 0, 0, 0], [0, -0.9, 0, 0], [0, 0, -1.0, 0], [0, 0, 0, 1.0]]
        )
        pix = jnp.asarray(rng.uniform(-0.5, 0.5, size=(8, 2)), jnp.float32)
        depth = jnp.asarray(rng.uniform(1, 4, size=8), jnp.float32)
        # backproject to camera frame using K^-1
        p_cam = rays.transform_to_world(pix, depth, K, jnp.eye(4), jnp.eye(4))
        xy, valid = rays.project_to_cam(p_cam, K)
        np.testing.assert_allclose(xy, pix, atol=1e-5)
        assert bool(valid.all())

    def test_ndc_rays_at_origin(self):
        # ray through image center, looking down -z
        fxfy = jnp.array([1.5, -1.2])
        rays_o = jnp.array([[0.0, 0.0, 0.0]])
        rays_d = jnp.array([[0.0, 0.0, -1.0]])
        o_ndc, d_ndc = rays.get_ndc_rays_fxfy(fxfy, 1.0, rays_o, rays_d)
        # shifted to near plane z=-1: o2 = 1 + 2/(-1) = -1 -> d2 = 2
        np.testing.assert_allclose(o_ndc[0], [0, 0, -1.0], atol=1e-6)
        np.testing.assert_allclose(d_ndc[0], [0, 0, 2.0], atol=1e-6)


class TestAlignment:
    def _random_traj(self, rng, n=12):
        from scipy.spatial.transform import Rotation

        c2ws = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
        c2ws[:, :3, :3] = Rotation.random(n, random_state=1).as_matrix()
        c2ws[:, :3, 3] = rng.normal(size=(n, 3)) * 2.0
        return c2ws

    def test_umeyama_recovers_known_sim3(self, rng):
        pts = rng.normal(size=(30, 3))
        from scipy.spatial.transform import Rotation

        R_true = Rotation.random(random_state=2).as_matrix()
        s_true, t_true = 2.5, np.array([1.0, -2.0, 0.5])
        transformed = s_true * (pts @ R_true.T) + t_true
        s, R, t = align.align_umeyama(transformed, pts)
        assert abs(s - s_true) < 1e-6
        np.testing.assert_allclose(R, R_true, atol=1e-6)
        np.testing.assert_allclose(t, t_true, atol=1e-6)

    def test_align_traj_perfect_after_sim3(self, rng):
        gt = self._random_traj(rng)
        from scipy.spatial.transform import Rotation

        R_p = Rotation.random(random_state=3).as_matrix()
        s_p, t_p = 0.7, np.array([0.3, 0.1, -0.2])
        est = gt.copy()
        est[:, :3, :3] = R_p[None] @ gt[:, :3, :3]
        est[:, :3, 3] = s_p * (gt[:, :3, 3] @ R_p.T) + t_p
        # invert the perturbation via alignment est->gt
        aligned = align.align_ate_c2b_use_a2b(est, gt)
        ate = align.compute_ate(gt, aligned)
        assert ate < 1e-5
        rpe_t, rpe_r = align.compute_rpe(gt, aligned)
        # rpe_rot = arccos(1-eps) amplifies f32 rounding to ~sqrt(2*eps)
        assert rpe_t < 1e-5 and rpe_r < 1e-3

    def test_ate_known_offset(self):
        gt = np.tile(np.eye(4), (5, 1, 1))
        pred = gt.copy()
        pred[:, 0, 3] = 0.3
        assert abs(align.compute_ate(gt, pred) - 0.3) < 1e-9

    def test_rpe_known_rotation(self):
        gt = np.tile(np.eye(4), (3, 1, 1))
        pred = gt.copy()
        # second relative motion is a 10-degree z rotation
        th = np.deg2rad(10)
        pred[1, :3, :3] = np.array(
            [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
        )
        _, rpe_r = align.compute_rpe(gt, pred)
        # two relative steps: +10deg then -10deg -> mean 10deg
        assert abs(np.rad2deg(rpe_r) - 10.0) < 1e-6


class TestTrajectory:
    def test_interp_poses_endpoints(self, rng):
        from nope_nerf_tpu.geometry import trajectory

        c2ws = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
        c2ws[:, :3, 3] = rng.normal(size=(4, 3))
        out = trajectory.interp_poses(c2ws, 16)
        assert out.shape == (16, 4, 4)
        np.testing.assert_allclose(out[0, :3, :3], np.eye(3), atol=1e-5)

    def test_bspline_shape(self, rng):
        from nope_nerf_tpu.geometry import trajectory

        c2ws = np.tile(np.eye(4, dtype=np.float32), (6, 1, 1))
        c2ws[:, :3, 3] = rng.normal(size=(6, 3))
        out = trajectory.interp_poses_bspline(
            c2ws, 20, np.linspace(0, 1, 6), degree=3
        )
        assert out.shape == (20, 4, 4)
