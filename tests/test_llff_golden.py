"""Golden test pinning LLFF pose-preprocessing output.

The fixture `tests/fixtures/llff_golden.npz` was generated ONCE from the
validated round-1 implementation (itself semantics-matched to the reference
`dataloading/common.py:149-238`); the vectorised rewrite must reproduce it to
float64 round-off, so LLFF `poses_bounds.npy` compatibility is provably
preserved across refactors.
"""
import os

import numpy as np
import pytest

from nope_nerf_tpu.dataloading.llff import (
    poses_avg,
    recenter_poses,
    spherify_poses,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "llff_golden.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(FIX)


def test_poses_avg_golden(golden):
    np.testing.assert_allclose(
        poses_avg(golden["poses"]), golden["avg"], rtol=0, atol=1e-12
    )


def test_recenter_poses_golden(golden):
    got = recenter_poses(golden["poses"])
    np.testing.assert_allclose(got, golden["rec"], rtol=0, atol=1e-12)
    # hwf column untouched
    np.testing.assert_array_equal(got[:, :3, 4], golden["poses"][:, :3, 4])


def test_spherify_poses_golden(golden):
    reset, new, bds = spherify_poses(golden["poses"], golden["bds"])
    np.testing.assert_allclose(reset, golden["sph_reset"], rtol=0, atol=1e-12)
    np.testing.assert_allclose(new, golden["sph_new"], rtol=0, atol=1e-12)
    np.testing.assert_allclose(bds, golden["sph_bds"], rtol=0, atol=1e-12)


def test_recenter_is_rigid(golden):
    """The recentered rotations stay orthonormal with det +1."""
    got = recenter_poses(golden["poses"])
    R = got[:, :3, :3]
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-10)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-10)
