"""3D data synthesis + loader schema tests, and 3D odometry recovery."""

import os

import numpy as np
import pytest

from icp_rust_tpu.utils import io as scan_io
from icp_rust_tpu.utils import oracle_np as oracle


def test_hdf5_schema_roundtrip(tmp_path):
    import h5py

    p = os.path.join(tmp_path, "scans.hdf5")
    traj = scan_io.synthesize_scans3d(p, n_frames=2, seed=3)
    assert traj.shape == (2, 3)
    with h5py.File(p, "r") as f:
        names = sorted(f.keys())
        # reference reader expects one dataset per packet, (24,16,3)
        # (examples/scan3d.rs:9,21-23), 75 packets per frame (:104).
        assert len(names) == 2 * scan_io.PACKETS_PER_FRAME
        assert f[names[0]].shape == (24, 16, 3)
    frames = scan_io.load_scans3d_hdf5(p)
    assert len(frames) == 2
    for fr in frames:
        # range filter must have dropped the injected invalid returns
        assert (np.linalg.norm(fr, axis=1) > scan_io.RANGE_FILTER).all()
        assert len(fr) < 28800


@pytest.mark.slow
def test_oracle_3d_odometry_recovers_ground_truth(tmp_path):
    p = os.path.join(tmp_path, "scans.hdf5")
    traj = scan_io.synthesize_scans3d(p, n_frames=3, seed=0)
    frames = scan_io.load_scans3d_hdf5(p)
    _, path = oracle.run_odometry3d(frames)
    c, s = np.cos(traj[0, 2]), np.sin(traj[0, 2])
    gt_local = (traj[1:, :2] - traj[0, :2]) @ np.array([[c, -s], [s, c]])
    assert np.abs(path - gt_local).max() < 0.01
