"""Full SLAM pipeline test on a synthetic loop trajectory."""

import numpy as np

from icp_rust_tpu.config import REFERENCE_CONFIG
from icp_rust_tpu.models.slam import run_slam2d


def _loop_sequence(n_frames=24, n_pts=350, seed=0):
    """Scans from a pose loop that returns near its start (guarantees
    loop-closure candidates)."""
    rng = np.random.default_rng(seed)
    walls = []
    for _ in range(10):
        a = rng.uniform(-10, 10, 2)
        ang = rng.uniform(0, np.pi)
        walls.append((a, np.array([np.cos(ang), np.sin(ang)]),
                      rng.uniform(4, 9)))
    ang = np.linspace(0, 2 * np.pi, n_frames, endpoint=True)
    poses = np.column_stack([
        1.5 * np.sin(ang), 1.5 * (1 - np.cos(ang)), 0.3 * np.sin(ang)
    ])
    frames = []
    for x, y, th in poses:
        widx = rng.integers(0, len(walls), n_pts)
        ts = rng.uniform(0, 1, n_pts)
        pw = np.stack([walls[i][0] + walls[i][1] * t * walls[i][2]
                       for i, t in zip(widx, ts)])
        c, s = np.cos(th), np.sin(th)
        local = (pw - [x, y]) @ np.array([[c, -s], [s, c]])
        local += rng.normal(0, 0.004, local.shape)
        frames.append(local)
    return frames, poses


def test_slam2d_checkpoint_resume_bitwise(tmp_path):
    """Phase checkpoints on the 2D pipeline: a completed record lets a
    rerun skip the batched odometry + verification solves and reproduce
    the result bitwise."""
    from icp_rust_tpu.utils.checkpoint import SequenceCheckpointer, load_state

    frames, _ = _loop_sequence(n_frames=12, n_pts=200, seed=3)
    ck = str(tmp_path / "slam2d.npz")
    ref = run_slam2d(frames, REFERENCE_CONFIG, loop_radius=0.8, min_gap=4,
                     checkpoint=SequenceCheckpointer(ck, 4))
    state = load_state(ck)
    assert int(state["slam_phase"]) == 2
    assert state["pose_t"].shape == (len(frames), 2)
    res = run_slam2d(frames, REFERENCE_CONFIG, loop_radius=0.8, min_gap=4,
                     checkpoint=SequenceCheckpointer(ck, 4), resume=True)
    np.testing.assert_array_equal(res.optimized_path, ref.optimized_path)
    assert res.n_loop_closures == ref.n_loop_closures


def test_slam_finds_loop_closures_and_optimizes():
    frames, poses = _loop_sequence()
    res = run_slam2d(
        frames, REFERENCE_CONFIG, loop_radius=0.8, min_gap=8,
    )
    assert res.n_loop_closures >= 1
    assert res.error_after <= res.error_before
    # The optimized trajectory must return near the start (ground truth
    # loops back to (0, 0)).
    end_opt = np.linalg.norm(res.optimized_path[-1] - res.optimized_path[0])
    assert end_opt < 0.25, end_opt
    # And track ground truth reasonably throughout (gauge: pose 0 = origin).
    c, s = np.cos(poses[0, 2]), np.sin(poses[0, 2])
    gt = (poses[:, :2] - poses[0, :2]) @ np.array([[c, -s], [s, c]])
    err = np.linalg.norm(res.optimized_path - gt, axis=1)
    assert err.mean() < 0.2, err.mean()
