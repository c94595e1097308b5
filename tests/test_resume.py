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
