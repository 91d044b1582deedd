"""Executed A/B of the pose-evaluation stack against the reference.

geometry/align.py re-implements Umeyama Sim(3)/SE(3)/posyaw alignment,
`align_ate_c2b_use_a2b`, ATE and RPE (`ATE/align_trajectory.py`,
`ATE/align_utils.py`, `utils_poses/align_traj.py`, `utils_poses/comp_ate.py`);
round 4 restyled `align_umeyama` after a similarity flag. These tests run
the reference's own modules (numpy/torch CPU, path set up by
tools/reference_exec.load_reference) on random noisy trajectories and
assert numerical agreement — the per-epoch ATE/RPE numbers and the
eval_poses LaTeX row come from this code on both sides.
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import reference_exec as rx  # noqa: E402

from nope_nerf_tpu.geometry import align as al  # noqa: E402

pytestmark = pytest.mark.skipif(
    not rx.reference_available(), reason="/root/reference not present"
)


@pytest.fixture(scope="module")
def ref_mods():
    rx.load_reference()  # puts /root/reference on sys.path with shims
    import ATE.align_trajectory as ref_align
    import ATE.align_utils as ref_align_utils
    import utils_poses.align_traj as ref_traj
    import utils_poses.comp_ate as ref_ate

    return ref_align, ref_align_utils, ref_traj, ref_ate


def _noisy_trajectories(n, seed, scale=1.7):
    """(gt, est) c2w pairs: est = a global Sim(3) of gt plus noise."""
    from scipy.spatial.transform import Rotation as R

    rng = np.random.default_rng(seed)
    gt = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
    gt[:, :3, :3] = R.random(n, rng=rng).as_matrix()
    gt[:, :3, 3] = rng.normal(0, 2, (n, 3))
    g_rot = R.random(1, rng=rng).as_matrix()[0]
    g_t = rng.normal(0, 1, 3)
    est = gt.copy()
    est[:, :3, :3] = g_rot[None] @ gt[:, :3, :3]
    est[:, :3, 3] = scale * (gt[:, :3, 3] @ g_rot.T) + g_t
    est[:, :3, 3] += rng.normal(0, 0.05, (n, 3))  # alignment residual
    # per-frame rotation noise so RPE_rot sits well away from the arccos
    # precision floor at 0
    noise = R.from_rotvec(rng.normal(0, 0.02, (n, 3))).as_matrix()
    est[:, :3, :3] = noise @ est[:, :3, :3]
    return gt, est


class TestUmeyama:
    @pytest.mark.parametrize("known_scale,yaw_only",
                             [(False, False), (True, False), (True, True)])
    def test_align_umeyama(self, ref_mods, known_scale, yaw_only):
        ref_align = ref_mods[0]
        rng = np.random.default_rng(3 + known_scale + 2 * yaw_only)
        data = rng.normal(0, 1, (12, 3))
        model = 1.3 * data @ _rot_z_np(0.7).T + rng.normal(0, 0.02, (12, 3))
        s_r, R_r, t_r = ref_align.align_umeyama(
            model, data, known_scale=known_scale, yaw_only=yaw_only)
        s_o, R_o, t_o = al.align_umeyama(
            model, data, known_scale=known_scale, yaw_only=yaw_only)
        np.testing.assert_allclose(s_o, s_r, rtol=1e-10)
        np.testing.assert_allclose(R_o, R_r, rtol=1e-9, atol=1e-10)
        np.testing.assert_allclose(t_o, t_r, rtol=1e-9, atol=1e-10)

    def test_reflection_case(self, ref_mods):
        """Degenerate near-planar clouds exercise the det<0 reflection fix."""
        ref_align = ref_mods[0]
        rng = np.random.default_rng(9)
        data = rng.normal(0, 1, (10, 3))
        data[:, 2] *= 1e-4
        model = data.copy()
        model[:, 2] = -model[:, 2] + rng.normal(0, 1e-5, 10)
        s_r, R_r, t_r = ref_align.align_umeyama(model, data)
        s_o, R_o, t_o = al.align_umeyama(model, data)
        np.testing.assert_allclose(np.linalg.det(R_o), 1.0, rtol=1e-9)
        np.testing.assert_allclose(R_o, R_r, rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(s_o, s_r, rtol=1e-8)


class TestTrajectoryAlignment:
    def test_align_ate_c2b_use_a2b(self, ref_mods):
        _, _, ref_traj, _ = ref_mods
        gt, est = _noisy_trajectories(9, seed=1)
        ref_out = ref_traj.align_ate_c2b_use_a2b(
            torch.tensor(est, dtype=torch.float32),
            torch.tensor(gt, dtype=torch.float32))
        if isinstance(ref_out, tuple):
            ref_out = ref_out[0]
        ours = al.align_ate_c2b_use_a2b(est, gt)
        np.testing.assert_allclose(ours, ref_out.numpy(),
                                   rtol=1e-4, atol=1e-5)

    def test_align_scale_c2b_use_a2b(self, ref_mods):
        _, _, ref_traj, _ = ref_mods
        gt, est = _noisy_trajectories(7, seed=2)
        ref_out = ref_traj.align_scale_c2b_use_a2b(
            torch.tensor(est, dtype=torch.float32),
            torch.tensor(gt, dtype=torch.float32))
        if isinstance(ref_out, tuple):
            ref_out = ref_out[0]
        ours, _scale = al.align_scale_c2b_use_a2b(est, gt)
        np.testing.assert_allclose(ours, ref_out.numpy(),
                                   rtol=1e-4, atol=1e-5)


class TestATERPE:
    def test_compute_ate_rpe(self, ref_mods):
        _, _, _, ref_ate = ref_mods
        gt, est = _noisy_trajectories(11, seed=4, scale=1.0)
        aligned = al.align_ate_c2b_use_a2b(est, gt)
        ate_ref = ref_ate.compute_ATE(gt.astype(np.float32),
                                      aligned.astype(np.float32))
        rpe_t_ref, rpe_r_ref = ref_ate.compute_rpe(
            gt.astype(np.float32), aligned.astype(np.float32))
        ate_o = al.compute_ate(gt, aligned)
        rpe_t_o, rpe_r_o = al.compute_rpe(gt, aligned)
        np.testing.assert_allclose(ate_o, ate_ref, rtol=1e-5)
        np.testing.assert_allclose(rpe_t_o, rpe_t_ref, rtol=1e-5)
        np.testing.assert_allclose(rpe_r_o, rpe_r_ref, rtol=1e-4)


def _rot_z_np(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
