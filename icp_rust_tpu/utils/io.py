"""Scan IO: the reference's datasets, padding, and 3D data synthesis.

- 2D scans: whitespace "x y" text files, 000.txt..209.txt
  (reference examples/scan2d.rs:10-34; scans/2d/).
- 3D scans: HDF5 file of per-packet datasets shaped (24, 16, 3) = 384
  points; a frame is 75 consecutive packets; points with ||p|| <= 0.2 are
  invalid returns (reference examples/scan3d.rs:9,34-69,104).  The actual
  blob is absent from the reference checkout (.MISSING_LARGE_BLOBS), so
  ``synthesize_scans3d`` regenerates an equivalent sequence with a known
  ground-truth trajectory, written in the reader's exact schema.
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import numpy as np

N_POINTS_IN_PACKET = 24 * 16  # reference examples/scan3d.rs:9
PACKETS_PER_FRAME = 75  # reference examples/scan3d.rs:104
RANGE_FILTER = 0.2  # reference examples/scan3d.rs:67


def load_scan2d(path: str) -> np.ndarray:
    return np.loadtxt(path, dtype=np.float64).reshape(-1, 2)


def load_scan2d_sequence(directory: str, limit: int | None = None) -> List[np.ndarray]:
    """All frames NNN.txt in order (reference numbering starts at 001 for
    the example loop but 000.txt exists; we load everything sorted)."""
    names = sorted(
        f for f in os.listdir(directory) if f.endswith(".txt")
    )
    if limit is not None:
        names = names[:limit]
    return [load_scan2d(os.path.join(directory, n)) for n in names]


def pad_points(
    scans: Sequence[np.ndarray], pad_to: int | None = None, multiple: int = 128
) -> Tuple[np.ndarray, np.ndarray]:
    """Stack ragged scans into (F, N, D) + bool mask (F, N).

    Pad value 0 is safe: every consumer masks the point axis.
    """
    dim = scans[0].shape[1]
    max_n = max(len(s) for s in scans)
    if pad_to is None:
        pad_to = -(-max_n // multiple) * multiple
    if pad_to < max_n:
        raise ValueError(f"pad_to={pad_to} < longest scan {max_n}")
    pts = np.zeros((len(scans), pad_to, dim), dtype=np.float64)
    mask = np.zeros((len(scans), pad_to), dtype=bool)
    for i, s in enumerate(scans):
        pts[i, : len(s)] = s
        mask[i, : len(s)] = True
    return pts, mask


# ------------------------- 3D synthesis -------------------------------------


def _make_world(rng: np.random.Generator, n_walls: int = 14):
    """A synthetic indoor-ish world as parametric vertical wall segments
    (anchor xy, direction xy, length), scaled to the reference example's
    +-3 m plot range (examples/scan3d.rs:127).  Surfaces are continuous so
    every scan resamples them freshly, like a real LiDAR."""
    walls = []
    for _ in range(n_walls):
        a = rng.uniform(-6, 6, 2)
        ang = rng.uniform(0, np.pi)
        length = rng.uniform(2.0, 6.0)
        walls.append((a, np.array([np.cos(ang), np.sin(ang)]), length))
    return walls


def ground_truth_trajectory(n_frames: int) -> np.ndarray:
    """Smooth planar trajectory (x, y, theta) per frame.

    Inter-frame motion is kept small (~5 cm, ~1 deg) so scan-to-first-scan
    ICP (the reference example's flow) stays inside its convergence basin,
    and total drift stays within scan overlap.
    """
    i = np.arange(n_frames)
    x = 0.05 * i * np.cos(0.02 * i)
    y = 0.03 * i
    theta = 0.02 * i
    return np.column_stack([x, y, theta])


def _scan_from_pose(
    walls, pose: np.ndarray, n_points: int, rng: np.random.Generator
) -> np.ndarray:
    """Sample a LiDAR-like frame from `pose` = (x,y,theta) in the sensor
    frame: fresh points on the wall surfaces with range noise, plus a few
    sub-0.2 invalid returns like the real sensor's
    (examples/scan3d.rs:63-69 filters them)."""
    x, y, theta = pose
    c, s = np.cos(theta), np.sin(theta)
    n_good = n_points - n_points // 40
    widx = rng.integers(0, len(walls), n_good)
    anchors = np.stack([walls[i][0] for i in widx])
    dirs = np.stack([walls[i][1] for i in widx])
    lens = np.array([walls[i][2] for i in widx])
    ts = rng.uniform(0, 1, n_good) * lens
    xy = anchors + dirs * ts[:, None]
    z = rng.uniform(0.2, 1.8, n_good)
    rel = xy - [x, y]
    local_xy = rel @ np.array([[c, s], [-s, c]]).T
    pts = np.column_stack([local_xy, z])
    pts += rng.normal(0, 0.005, pts.shape)
    # Invalid returns near the origin (filtered by ||p|| > 0.2 downstream).
    n_bad = n_points - n_good
    bad = rng.uniform(-0.05, 0.05, (n_bad, 3))
    return np.concatenate([pts, bad], axis=0)


def synthesize_scans3d(
    path: str,
    n_frames: int = 8,
    seed: int = 0,
) -> np.ndarray:
    """Write an HDF5 file in the reference reader's schema and return the
    ground-truth (x, y, theta) trajectory.

    Schema (examples/scan3d.rs:34-61): one dataset per packet, each
    (24, 16, 3) float64; a frame = 75 consecutive packets; dataset
    iteration order is the file's alphabetical dataset order, so names are
    zero-padded.
    """
    import h5py

    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    rng = np.random.default_rng(seed)
    world = _make_world(rng)
    traj = ground_truth_trajectory(n_frames)
    n_packets = n_frames * PACKETS_PER_FRAME
    with h5py.File(path, "w") as f:
        k = 0
        for fi in range(n_frames):
            frame_pts = _scan_from_pose(
                world, traj[fi], N_POINTS_IN_PACKET * PACKETS_PER_FRAME, rng
            )
            rng.shuffle(frame_pts)
            for p in range(PACKETS_PER_FRAME):
                pkt = frame_pts[
                    p * N_POINTS_IN_PACKET : (p + 1) * N_POINTS_IN_PACKET
                ].reshape(24, 16, 3)
                f.create_dataset(f"{k:06d}", data=pkt)
                k += 1
        f.attrs["ground_truth_xytheta"] = traj
    return traj


def ensure_scans3d(
    path: str, n_frames: int, seed: int = 0
) -> Tuple[List[np.ndarray], np.ndarray]:
    """Load (synthesizing or regenerating if absent/too short) the
    benchmark 3D sequence; returns (frames[:n_frames], traj[:n_frames]).

    Regenerates when an existing file holds fewer frames than asked:
    silently loading a shorter sequence would shrink a benchmark's
    workload.  Deterministic in (n_frames, seed) — a longer file's
    prefix is NOT the same as a shorter synthesis (the rng streams
    differ), so benches that share ``path`` should ask for the same
    n_frames or tolerate regeneration.
    """
    import h5py

    def n_avail() -> int:
        with h5py.File(path, "r") as f:
            return len(f.attrs["ground_truth_xytheta"])

    if not os.path.exists(path) or n_avail() < n_frames:
        synthesize_scans3d(path, n_frames=n_frames, seed=seed)
    with h5py.File(path, "r") as f:
        traj = np.asarray(f.attrs["ground_truth_xytheta"])
    frames = load_scans3d_hdf5(path)
    return frames[:n_frames], traj[:n_frames]


def load_scans3d_hdf5(
    path: str, apply_range_filter: bool = True
) -> List[np.ndarray]:
    """Read frames the way the reference example does: 75 packets each of
    (24,16,3) -> (28800, 3), then drop ||p|| <= 0.2
    (examples/scan3d.rs:51-69,104-119)."""
    import h5py

    frames = []
    with h5py.File(path, "r") as f:
        names = sorted(f.keys())
        for start in range(0, len(names) - PACKETS_PER_FRAME + 1, PACKETS_PER_FRAME):
            pkts = [
                np.asarray(f[names[start + i]]).reshape(-1, 3)
                for i in range(PACKETS_PER_FRAME)
            ]
            pts = np.concatenate(pkts, axis=0)
            if apply_range_filter:
                pts = pts[np.linalg.norm(pts, axis=1) > RANGE_FILTER]
            frames.append(pts)
    return frames
