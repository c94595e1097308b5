"""Checkpoint / resume and per-frame metrics on the odometry runners."""

import json
import os

import jax.numpy as jnp
import numpy as np

from icp_rust_tpu.config import REFERENCE_CONFIG
from icp_rust_tpu.models.odometry import (
    run_odometry_device,
    run_odometry_fused,
)
from icp_rust_tpu.utils.checkpoint import SequenceCheckpointer
from icp_rust_tpu.utils.metrics import MetricsLogger


def _sequence(f=9, n=256, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-3000, 3000, (n, 2))
    frames = np.zeros((f, n, 2))
    for k in range(f):
        th = 0.01 * k
        c, s = np.cos(th), np.sin(th)
        frames[k] = base @ np.array([[c, -s], [s, c]]).T + [10.0 * k, 0]
        frames[k] += rng.normal(0, 0.5, (n, 2))
    return frames, np.ones((f, n), bool)


def test_kill_and_resume_reproduces_trajectory_bitwise(tmp_path):
    frames, masks = _sequence()
    ck = str(tmp_path / "ck.npz")

    # Uninterrupted reference run.
    _, path_ref = run_odometry_device(frames, masks, REFERENCE_CONFIG)

    # "Crash" after frame 5: run only the first 6 frames with mid-run
    # checkpoints every 2.
    _, _ = run_odometry_device(
        frames[:6], masks[:6], REFERENCE_CONFIG,
        checkpoint=SequenceCheckpointer(ck, every=2),
    )
    assert os.path.exists(ck)

    # Resume the FULL sequence from the saved cursor; frames before it
    # are never recomputed (their path rows come from the checkpoint).
    _, path_res = run_odometry_device(
        frames, masks, REFERENCE_CONFIG,
        checkpoint=SequenceCheckpointer(ck, every=2),
        resume=True,
    )
    np.testing.assert_array_equal(path_res, path_ref)


def test_metrics_rows_populated(tmp_path):
    frames, masks = _sequence(f=5)
    mpath = str(tmp_path / "m.jsonl")
    log = MetricsLogger(mpath)
    run_odometry_device(frames, masks, REFERENCE_CONFIG, metrics=log)
    log.close()

    rows = [json.loads(line) for line in open(mpath)]
    assert len(rows) == 4
    for r in rows:
        assert np.isfinite(r["huber_error"])
        assert np.isfinite(r["mean_nn_dist"]) and r["mean_nn_dist"] >= 0
        assert 0.0 <= r["inlier_fraction"] <= 1.0
        assert r["extra"]["outer_iters"] >= 1
        assert r["seconds"] > 0


def test_fused_runner_metrics_match_device_loop():
    frames, masks = _sequence(f=5)
    log = MetricsLogger(None)
    _, path_d = run_odometry_device(
        frames, masks, REFERENCE_CONFIG, metrics=log
    )
    _, path_f, stats = run_odometry_fused(
        frames, masks, REFERENCE_CONFIG, with_metrics=True
    )
    np.testing.assert_array_equal(path_f, path_d)
    for i, rec in enumerate(log.records):
        assert int(stats.outer_iters[i]) == rec.extra["outer_iters"]
        np.testing.assert_allclose(
            float(stats.huber_error[i]), rec.huber_error, rtol=1e-12
        )
        np.testing.assert_allclose(
            float(stats.mean_nn_dist[i]), rec.mean_nn_dist, rtol=1e-12
        )


def _sequence3d(f=7, n=256, seed=1):
    """Gentle 3D terrain scans (normals well-defined for p2l)."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(-2, 2, (n, 3))
    base[:, 2] = 0.2 * np.sin(base[:, 0]) + 0.1 * base[:, 1]
    frames = np.zeros((f, n, 3))
    for k in range(f):
        th = 0.02 * k
        c, s = np.cos(th), np.sin(th)
        rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        frames[k] = base @ rot.T + [0.05 * k, 0.02 * k, 0.0]
    return frames, np.ones((f, n), bool)


def test_kill_and_resume_p2l_bitwise(tmp_path):
    """The SE(3) p2l runner has the 2D path's resume guarantees."""
    from icp_rust_tpu.models.odometry import run_odometry_p2l

    frames, masks = _sequence3d()
    ck = str(tmp_path / "ck3.npz")

    _, path_ref = run_odometry_p2l(
        frames, masks, REFERENCE_CONFIG, normals_voxel_size=1.0
    )
    _, _ = run_odometry_p2l(
        frames[:4], masks[:4], REFERENCE_CONFIG, normals_voxel_size=1.0,
        checkpoint=SequenceCheckpointer(ck, every=2),
    )
    assert os.path.exists(ck)
    _, path_res = run_odometry_p2l(
        frames, masks, REFERENCE_CONFIG, normals_voxel_size=1.0,
        checkpoint=SequenceCheckpointer(ck, every=2), resume=True,
    )
    np.testing.assert_array_equal(path_res, path_ref)


def test_p2l_runner_metrics_rows(tmp_path):
    from icp_rust_tpu.models.odometry import run_odometry_p2l

    frames, masks = _sequence3d(f=4)
    mpath = str(tmp_path / "m3.jsonl")
    log = MetricsLogger(mpath)
    run_odometry_p2l(frames, masks, REFERENCE_CONFIG,
                     normals_voxel_size=1.0, metrics=log)
    log.close()
    rows = [json.loads(line) for line in open(mpath)]
    assert len(rows) == 3
    for r in rows:
        assert np.isfinite(r["huber_error"])
        assert np.isfinite(r["mean_nn_dist"]) and r["mean_nn_dist"] >= 0
        assert 0.0 <= r["inlier_fraction"] <= 1.0
        assert r["extra"]["outer_iters"] >= 1


def test_submap_segmented_matches_unsegmented():
    """The checkpointable segmented submap runner executes the same scan
    step on the same carried state — only the program boundary moves, so
    the trajectory must match the single fused program."""
    from icp_rust_tpu.models.submap import run_submap_odometry

    frames, masks = _sequence(f=9)
    _, path_one = run_submap_odometry(
        frames, masks, REFERENCE_CONFIG, voxel_size=20.0,
        capacity=1 << 12,
    )
    log = MetricsLogger(None)  # metrics forces the segmented path
    _, path_seg = run_submap_odometry(
        frames, masks, REFERENCE_CONFIG, voxel_size=20.0,
        capacity=1 << 12, metrics=log,
    )
    np.testing.assert_allclose(path_seg, path_one, rtol=0, atol=1e-9)
    assert len(log.records) == 8
    for r in log.records:
        assert np.isfinite(r.huber_error)
        assert 0.0 <= r.inlier_fraction <= 1.0
        assert r.extra["outer_iters"] >= 1


def test_kill_and_resume_submap_bitwise(tmp_path):
    """Kill-and-resume on the fused submap runner: the restored carry
    (transform, relative motion, voxel hash map, view order) reproduces
    the remaining trajectory bitwise vs the uninterrupted segmented run
    with the same cadence."""
    from icp_rust_tpu.models.submap import run_submap_odometry

    frames, masks = _sequence(f=9)
    kw = dict(config=REFERENCE_CONFIG, voxel_size=20.0, capacity=1 << 12)
    ck_ref = str(tmp_path / "ck_ref.npz")
    _, path_ref = run_submap_odometry(
        frames, masks, checkpoint=SequenceCheckpointer(ck_ref, every=2),
        **kw,
    )

    # "Crash" after frame 5 (frames 1..5 processed), then resume the
    # full sequence from the saved cursor.
    ck = str(tmp_path / "ck.npz")
    _, _ = run_submap_odometry(
        frames[:6], masks[:6],
        checkpoint=SequenceCheckpointer(ck, every=2), **kw,
    )
    assert os.path.exists(ck)
    _, path_res = run_submap_odometry(
        frames, masks, checkpoint=SequenceCheckpointer(ck, every=2),
        resume=True, **kw,
    )
    np.testing.assert_array_equal(path_res, path_ref)


def test_submap_and_p2l_stats():
    """Per-frame stats from the fused submap runner and the p2l driver."""
    import jax.numpy as jnp

    from icp_rust_tpu.geometry.transform3d import RigidTransform3
    from icp_rust_tpu.models.icp_p2l import icp_point_to_plane
    from icp_rust_tpu.models.submap import run_submap_odometry

    frames, masks = _sequence(f=5)
    _, _, stats = run_submap_odometry(
        frames, masks, REFERENCE_CONFIG, voxel_size=20.0, capacity=1 << 12,
        with_metrics=True,
    )
    assert stats.outer_iters.shape == (4,)
    assert np.all(np.asarray(stats.outer_iters) >= 1)
    assert np.all(np.isfinite(np.asarray(stats.huber_error)))
    assert np.all(np.asarray(stats.mean_nn_dist) >= 0)
    inl = np.asarray(stats.inlier_fraction)
    assert np.all((inl >= 0) & (inl <= 1))

    rng = np.random.default_rng(0)
    pts = rng.uniform(-2, 2, (512, 3))
    pts[:, 2] = 0.1 * pts[:, 0]  # a plane so normals are defined
    src = jnp.asarray(pts)
    dst = src + jnp.asarray([0.02, -0.01, 0.0])
    m = jnp.ones(512, bool)
    t, st = icp_point_to_plane(
        src, dst, m, m, RigidTransform3.identity(dtype=jnp.float64),
        REFERENCE_CONFIG, normals_voxel_size=1.0, return_stats=True,
    )
    assert int(st.outer_iters) >= 1
    assert np.isfinite(float(st.huber_error))
    assert 0.0 <= float(st.inlier_fraction) <= 1.0
