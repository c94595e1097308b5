"""End-to-end SE(3) SLAM: p2l odometry + 3D loop closure + SE(3) graph."""

import numpy as np
import jax.numpy as jnp

from icp_rust_tpu.config import ICPConfig
from icp_rust_tpu.geometry.transform3d import RigidTransform3
from icp_rust_tpu.models.slam import run_slam3d


def _scene(rng, n=6000):
    """Planar room: floor + two walls + a ramp (normals well-defined)."""
    f = rng.uniform([-3, -3, 0], [3, 3, 0], (n // 2, 3))
    w1 = rng.uniform([-3, -3, 0], [3, -3, 2], (n // 4, 3))
    w2 = rng.uniform([-3, 3, 0], [-3, 3, 2], (n // 4, 3))
    ramp = rng.uniform([1, 1, 0], [3, 3, 1], (n // 4, 3))
    ramp[:, 2] = 0.5 * (ramp[:, 0] - 1.0)
    return np.concatenate([f, w1, w2, ramp]).astype(np.float32)


def _trajectory(n_poses=28, radius=1.0):
    """Closing loop with full 6-DoF motion (small z/pitch wobble)."""
    poses = []
    for k in range(n_poses):
        a = 2 * np.pi * k / (n_poses - 1)
        tw = jnp.asarray(
            [radius * np.cos(a), radius * np.sin(a), 0.05 * np.sin(2 * a),
             0.02 * np.sin(a), 0.02 * np.cos(a), a],
            jnp.float32,
        )
        poses.append(RigidTransform3.from_twist(tw))
    return poses


def _frames(rng, scene, poses, keep, noise=0.004):
    frames = []
    for p in poses:
        pts = np.asarray(
            p.inverse().apply_points(jnp.asarray(scene))
        ) + rng.normal(0, noise, scene.shape).astype(np.float32)
        sel = rng.permutation(len(pts))[:keep]
        frames.append(pts[sel])
    return frames


def test_slam3d_kill_and_resume_bitwise(tmp_path):
    """Kill-and-resume on the full SLAM pipeline: a crash mid-odometry
    leaves a partial chain checkpoint; resuming the full sequence
    reproduces the uninterrupted result bitwise, and the final record
    carries the pose-graph state (poses + edges + cursor)."""
    from icp_rust_tpu.utils.checkpoint import SequenceCheckpointer, load_state

    rng = np.random.default_rng(1)
    scene = _scene(rng, n=2000)
    poses = _trajectory(n_poses=10)
    frames = _frames(rng, scene, poses, keep=1024)
    cfg = ICPConfig(compute_dtype=jnp.float32)
    kw = dict(loop_radius=0.8, min_gap=4, max_loop_candidates=4,
              normals_voxel_size=0.4)

    ref = run_slam3d(frames, cfg, **kw)

    ck = str(tmp_path / "slam3d.npz")
    # "Crash" after 5 frames: the checkpoint holds a 5-edge chain (its
    # phase-1/2 record covers only the truncated sequence).
    run_slam3d(frames[:6], cfg, checkpoint=SequenceCheckpointer(ck, 2),
               **kw)
    res = run_slam3d(frames, cfg, checkpoint=SequenceCheckpointer(ck, 2),
                     resume=True, **kw)
    np.testing.assert_array_equal(res.optimized_path, ref.optimized_path)
    assert res.n_loop_closures == ref.n_loop_closures

    state = load_state(ck)
    assert int(state["slam_phase"]) == 2
    assert state["pose_t"].shape == (len(frames), 3)
    assert state["rel_rot"].shape[0] == len(frames) - 1
    assert "edge_i" in state

    # Resuming from the completed phase-2 record skips odometry and the
    # loop-closure verification entirely and still reproduces the result.
    res2 = run_slam3d(frames, cfg, checkpoint=SequenceCheckpointer(ck, 2),
                      resume=True, **kw)
    np.testing.assert_array_equal(res2.optimized_path, ref.optimized_path)


def test_run_slam3d_closes_loop():
    rng = np.random.default_rng(0)
    scene = _scene(rng)
    poses = _trajectory()
    frames = []
    for p in poses:
        pts = np.asarray(
            p.inverse().apply_points(jnp.asarray(scene))
        ) + rng.normal(0, 0.004, scene.shape).astype(np.float32)
        sel = rng.permutation(len(pts))[:3072]
        frames.append(pts[sel])

    cfg = ICPConfig(compute_dtype=jnp.float32)
    res = run_slam3d(
        frames, cfg, loop_radius=0.8, min_gap=8, max_loop_candidates=8,
        normals_voxel_size=0.4,
    )
    # Odometry/graph poses live in the frame of pose 0 (anchored there),
    # so ground truth must be expressed relative to pose 0 too.
    p0_inv = poses[0].inverse()
    gt = np.stack([np.asarray(p0_inv.compose(p).t) for p in poses])

    assert res.n_loop_closures >= 1
    assert np.isfinite(res.error_after)
    assert res.error_after < res.error_before

    # The loop closure must pull the end pose toward ground truth.
    end_err_odo = np.linalg.norm(res.odometry_path[-1] - gt[-1])
    end_err_opt = np.linalg.norm(res.optimized_path[-1] - gt[-1])
    assert end_err_opt <= max(0.8 * end_err_odo, 0.02), (
        end_err_odo, end_err_opt
    )
    # And overall ATE should not get worse.
    ate_odo = np.sqrt(((res.odometry_path - gt) ** 2).sum(-1).mean())
    ate_opt = np.sqrt(((res.optimized_path - gt) ** 2).sum(-1).mean())
    assert ate_opt <= ate_odo * 1.05, (ate_odo, ate_opt)
