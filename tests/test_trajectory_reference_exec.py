"""Executed A/B of the NVS trajectory toolkit against the reference.

geometry/trajectory.py re-derives the reference's pose-interpolation and
path-generation functions (`model/common.py:333-615`); round 4 rewrote
`scipy_bspline` and `interp_poses` from the standard constructions after a
similarity flag. These tests EXECUTE the reference's own functions (scipy +
torch on CPU, via tools/reference_exec.load_reference) on random pose sets
and assert our outputs match — turning the "same semantics, re-derived
construction" claim into executed evidence for every path `vis/render.py`
can produce (interp / bspline / 'sprial' / spheric).
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import reference_exec as rx  # noqa: E402

from nope_nerf_tpu.geometry import trajectory as tj  # noqa: E402

pytestmark = pytest.mark.skipif(
    not rx.reference_available(), reason="/root/reference not present"
)


@pytest.fixture(scope="module")
def ref_common():
    return rx.load_reference().common


def _random_c2ws(n, seed):
    from scipy.spatial.transform import Rotation as R

    rng = np.random.default_rng(seed)
    rots = R.random(n, rng=rng).as_matrix().astype(np.float32)
    trans = rng.normal(0, 1.5, (n, 3)).astype(np.float32)
    c2ws = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    c2ws[:, :3, :3] = rots
    c2ws[:, :3, 3] = trans
    return c2ws


class TestInterpolation:
    @pytest.mark.parametrize("n_in,n_out", [(4, 13), (6, 60)])
    def test_interp_poses(self, ref_common, n_in, n_out):
        c2ws = _random_c2ws(n_in, seed=n_in)
        ref = ref_common.interp_poses(torch.tensor(c2ws), n_out).numpy()
        ours = tj.interp_poses(c2ws, n_out)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("degree", [2, 3, 100])
    def test_interp_poses_bspline(self, ref_common, degree):
        # degree 100 exercises the reference's degree clamp to count-1
        # (the stock extract_images.bspline_degree is 100)
        c2ws = _random_c2ws(7, seed=degree)
        times = np.linspace(0, 1, 7)
        ref = ref_common.interp_poses_bspline(
            torch.tensor(c2ws), 25, times, degree).numpy()
        ours = tj.interp_poses_bspline(c2ws, 25, times, degree)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_get_poses_at_times(self, ref_common):
        """Rotations (slerp) match the executed reference; translations
        are a DOCUMENTED divergence — the reference's `interp_t`
        (`model/common.py:545-556`, DEAD code: no reference CLI calls
        `get_poses_at_times`) applies the lerp weights to the WRONG
        endpoints ((t-t1)/(t2-t1) multiplies trans[t1] instead of
        trans[t2]) and 0/0-NaNs whenever a target time equals an input
        knot. Ours is the standard piecewise-linear np.interp."""
        c2ws = _random_c2ws(5, seed=11)
        input_times = np.linspace(0, 1, 5)
        target_times = np.array([0.06, 0.13, 0.49, 0.77, 0.94])
        ref = ref_common.get_poses_at_times(
            torch.tensor(c2ws), input_times, target_times).numpy()
        ours = tj.get_poses_at_times(c2ws, input_times, target_times)
        # slerp rotations: executed parity
        np.testing.assert_allclose(ours[:, :3, :3], ref[:, :3, :3],
                                   rtol=1e-4, atol=1e-5)
        # translations: the reference's swapped weights == evaluating the
        # correct lerp at the REFLECTED parameter (t1 + t2 - target)
        for k, tt in enumerate(target_times):
            lo = input_times[input_times <= tt].max()
            hi = input_times[input_times >= tt].min()
            reflected = tj.get_poses_at_times(
                c2ws, input_times, np.array([lo + hi - tt]))
            np.testing.assert_allclose(
                reflected[0, :3, 3], ref[k, :3, 3], rtol=1e-4, atol=1e-5,
                err_msg="reference interp_t is not the swapped-weight lerp")

    def test_get_poses_at_times_knot_nan_divergence(self, ref_common):
        """At a target time equal to an input knot the reference NaNs
        (0/0 in `interp_t`); our np.interp returns the knot pose."""
        c2ws = _random_c2ws(4, seed=12)
        input_times = np.linspace(0, 1, 4)
        target_times = np.array([0.0, 0.5])
        ref = ref_common.get_poses_at_times(
            torch.tensor(c2ws), input_times, target_times).numpy()
        assert np.isnan(ref[:, :3, 3]).any()  # the reference's 0/0
        ours = tj.get_poses_at_times(c2ws, input_times, target_times)
        assert np.isfinite(ours).all()
        np.testing.assert_allclose(ours[0, :3, 3], c2ws[0, :3, 3],
                                   rtol=1e-6, atol=1e-7)

    @pytest.mark.parametrize("periodic", [False, True])
    @pytest.mark.parametrize("degree", [1, 2, 3, 5])
    def test_scipy_bspline(self, ref_common, degree, periodic):
        """The r4 re-derived knot constructions == the reference's
        divmod/clip construction, both knot families, degrees 1-5."""
        rng = np.random.default_rng(degree + 10 * periodic)
        cv = rng.normal(0, 2, (8, 3))
        ref = ref_common.scipy_bspline(cv, n=50, degree=degree,
                                       periodic=periodic)
        ours = tj.scipy_bspline(cv, n=50, degree=degree, periodic=periodic)
        np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-11)


class TestSpiralPaths:
    def test_poses_avg_and_viewmatrix(self, ref_common):
        rng = np.random.default_rng(0)
        poses = rng.normal(0, 1, (6, 3, 5)).astype(np.float32)
        np.testing.assert_allclose(
            tj.poses_avg(poses), ref_common.poses_avg(poses.copy()),
            rtol=1e-6, atol=1e-7)

    def test_render_path_spiral(self, ref_common):
        rng = np.random.default_rng(1)
        poses = rng.normal(0, 1, (6, 3, 5)).astype(np.float32)
        c2w = tj.poses_avg(poses)
        up = poses[:, :3, 1].sum(0) / np.linalg.norm(poses[:, :3, 1].sum(0))
        rads = np.percentile(np.abs(poses[:, :3, 3]), 90, 0)
        ref = np.stack(ref_common.render_path_spiral(
            c2w.copy(), up.copy(), rads.copy(), focal=2.5, zdelta=0.1,
            zrate=0.5, rots=2, N=30))
        ours = np.stack(tj.render_path_spiral(
            c2w, up, rads, focal=2.5, zdelta=0.1, zrate=0.5, rots=2, N=30))
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)

    def test_generate_spiral_nerf(self, ref_common):
        c2ws = _random_c2ws(6, seed=5)
        bds = np.array([2.0, 6.0])
        hwf = np.tile(np.array([[60.0], [80.0], [50.0]],
                               dtype=np.float32).T.reshape(1, 3, 1), (6, 1, 1))
        ref = ref_common.generate_spiral_nerf(
            torch.tensor(c2ws), bds, 20, hwf)
        if hasattr(ref, "numpy"):
            ref = ref.numpy()
        ours = tj.generate_spiral_nerf(c2ws, bds, 20, hwf)
        np.testing.assert_allclose(ours, np.asarray(ref)[:, :3, :4],
                                   rtol=1e-5, atol=1e-6)

    def test_create_spheric_poses(self, ref_common):
        ref = ref_common.create_spheric_poses(3.0, 0.4, n_poses=24)
        if hasattr(ref, "numpy"):
            ref = ref.numpy()
        ours = tj.create_spheric_poses(3.0, 0.4, n_poses=24)
        np.testing.assert_allclose(np.asarray(ours)[:, :3, :4],
                                   np.asarray(ref)[:, :3, :4],
                                   rtol=1e-9, atol=1e-12)
