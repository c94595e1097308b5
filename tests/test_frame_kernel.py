"""Whole-frame fused 2D ICP kernel (ops/align2d_pallas._icp2d_frame_kernel).

The kernel runs the reference's entire Icp2d::estimate call
(src/lib.rs:105-130) — outer loop, exact 1-NN, inner IRLS, bit-exact
fixed-point exit — in one Pallas launch.  This file asserts interpret-mode
equivalence against the unfused driver on CPU; the compiled-Mosaic parity
test lives in the hardware tier (test_tpu_hardware.py).
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from icp_rust_tpu.config import ICPConfig
from icp_rust_tpu.geometry.transform2d import RigidTransform2
from icp_rust_tpu.models.icp2d import icp2d
from icp_rust_tpu.utils import io as scan_io

SCANS = "/root/reference/scans/2d"

CFG_FRAME = ICPConfig(frame_backend="interpret", det_rel_eps=1e-9)
CFG_XLA = ICPConfig(frame_backend="off", align_backend="xla",
                    det_rel_eps=1e-9)


def _pair(seed=0, n=600, m=560, pad=768, theta=0.05, t=(0.1, -0.05)):
    # m != n by default (m < n subsamples; m > n appends fresh points) so
    # the kernels actually see unequal src/dst valid counts (the old
    # m=640 silently sliced a 600-row array back to 600).
    rng = np.random.default_rng(seed)
    src = rng.uniform(-3, 3, (n, 2)).astype(np.float32)
    c, s = np.cos(theta), np.sin(theta)
    rot = np.array([[c, -s], [s, c]], np.float32)
    full = src
    if m > n:
        extra = rng.uniform(-3, 3, (m - n, 2)).astype(np.float32)
        full = np.concatenate([src, extra])
    dst = (full @ rot.T + np.asarray(t, np.float32))
    dst = dst[rng.permutation(len(dst))][:m]
    assert len(dst) == m
    return _pad(src, pad) + _pad(dst, pad) + (rot, np.asarray(t))


def _pad(a, n):
    out = np.zeros((n, 2), np.float32)
    out[: len(a)] = a
    msk = np.zeros(n, bool)
    msk[: len(a)] = True
    return jnp.asarray(out), jnp.asarray(msk)


def _run(cfg, sp, sm, dp, dm, t0=None):
    t0 = t0 or RigidTransform2.identity(dtype=jnp.float32)
    return icp2d(sp, dp, sm, dm, t0, cfg)


def test_frame_kernel_matches_unfused_driver():
    sp, sm, dp, dm, rot, t = _pair()
    tf = _run(CFG_FRAME, sp, sm, dp, dm)
    tx = _run(CFG_XLA, sp, sm, dp, dm)
    np.testing.assert_allclose(np.asarray(tf.rot), np.asarray(tx.rot),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(tf.t), np.asarray(tx.t),
                               atol=1e-5)
    # and both recover the synthetic motion
    np.testing.assert_allclose(np.asarray(tf.rot), rot, atol=5e-3)
    np.testing.assert_allclose(np.asarray(tf.t), t, atol=5e-3)


def test_frame_kernel_warm_start():
    sp, sm, dp, dm, _, _ = _pair(seed=3, theta=0.3, t=(0.4, 0.2))
    th = 0.25
    warm = RigidTransform2(
        rot=jnp.asarray([[np.cos(th), -np.sin(th)],
                         [np.sin(th), np.cos(th)]], jnp.float32),
        t=jnp.asarray([0.35, 0.15], jnp.float32),
    )
    tf = _run(CFG_FRAME, sp, sm, dp, dm, warm)
    tx = _run(CFG_XLA, sp, sm, dp, dm, warm)
    np.testing.assert_allclose(np.asarray(tf.rot), np.asarray(tx.rot),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(tf.t), np.asarray(tx.t),
                               atol=1e-5)


def test_frame_kernel_masked_db_is_invisible():
    """A masked db point must never be matched: planting a masked decoy
    at every query's location changes nothing, bit-for-bit."""
    sp, sm, dp, dm, _, _ = _pair(seed=5)
    t_plain = _run(CFG_FRAME, sp, sm, dp, dm)
    # decoys: overwrite the PADDED (masked) tail rows with src points
    dp2 = np.asarray(dp).copy()
    n_valid = int(np.asarray(dm).sum())
    dp2[n_valid:] = np.asarray(sp)[: len(dp2) - n_valid]
    t_decoy = _run(CFG_FRAME, jnp.asarray(sp), sm, jnp.asarray(dp2), dm)
    np.testing.assert_array_equal(np.asarray(t_plain.rot),
                                  np.asarray(t_decoy.rot))
    np.testing.assert_array_equal(np.asarray(t_plain.t),
                                  np.asarray(t_decoy.t))


def test_frame_kernel_degenerate_perfect_fit_is_identity():
    """Perfect fit -> sigma 0 -> no update (reference Option::None
    semantics, src/lib.rs:236-247): warm start comes back unchanged."""
    sp, sm, _, _, _, _ = _pair(seed=7)
    tf = _run(CFG_FRAME, sp, sm, sp, sm)
    np.testing.assert_array_equal(np.asarray(tf.rot),
                                  np.eye(2, dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(tf.t),
                                  np.zeros(2, np.float32))


@pytest.mark.skipif(not os.path.isdir(SCANS),
                    reason="reference scans/2d not present")
def test_frame_kernel_real_scans_trajectory():
    """Warm-started scan-to-first-scan odometry over real frames: the
    fused-kernel trajectory tracks the unfused one at f32 roundoff."""
    frames = scan_io.load_scan2d_sequence(SCANS, limit=8)
    pts, mask = scan_io.pad_points(frames, multiple=128)
    cfg_f = CFG_FRAME.with_(point_scale=3000.0)
    cfg_x = CFG_XLA.with_(point_scale=3000.0)
    sp = jnp.asarray(pts[0], jnp.float32)
    sm = jnp.asarray(mask[0])
    paths = []
    for cfg in (cfg_f, cfg_x):
        t = RigidTransform2.identity(dtype=jnp.float32)
        path = []
        for i in range(1, len(frames)):
            t = icp2d(sp, jnp.asarray(pts[i], jnp.float32), sm,
                      jnp.asarray(mask[i]), t, cfg)
            path.append(np.asarray(t.inverse().t))
        paths.append(np.asarray(path))
    ate = np.sqrt(np.mean(np.sum((paths[0] - paths[1]) ** 2, axis=1)))
    assert ate < 1.0  # mm-scale data (coords ~ +-3000): < 1 mm apart


def _batch(bsz=5, pad=768):
    rng = np.random.default_rng(11)
    sps, sms, dps, dms = [], [], [], []
    for b in range(bsz):
        s = rng.uniform(-3, 3, (600, 2)).astype(np.float32)
        th = 0.03 * (b + 1)
        c, si = np.cos(th), np.sin(th)
        rot = np.array([[c, -si], [si, c]], np.float32)
        d = (s @ rot.T + np.array([0.05 * b, -0.03], np.float32))
        d = d[rng.permutation(len(d))][: 600 - 9 * b]
        (sp, sm), (dp, dm) = _pad(s, pad), _pad(d, pad)
        sps.append(sp), sms.append(sm), dps.append(dp), dms.append(dm)
    stack = lambda xs: jnp.stack(xs)
    return stack(sps), stack(sms), stack(dps), stack(dms)


def test_frame_kernel_pairs_matches_lockstep_driver():
    """The pair-grid whole-frame kernel (outer loops desynchronized per
    pair) vs the lockstep batched driver: pairs are independent, so the
    per-pair results agree at f32 roundoff."""
    sp, sm, dp, dm = _batch()
    b = sp.shape[0]
    t0 = RigidTransform2.identity((b,), jnp.float32)
    tp = icp2d(sp, dp, sm, dm, t0, CFG_FRAME)
    tx = icp2d(sp, dp, sm, dm, t0, CFG_XLA)
    np.testing.assert_allclose(np.asarray(tp.rot), np.asarray(tx.rot),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(tp.t), np.asarray(tx.t),
                               atol=1e-5)


def test_shared_db_batched_src_broadcasts():
    """A batched (B, N, 2) src against ONE shared (M, 2) db must work on
    every dispatch path (advisor r4: the frame-kernel gate used to let
    this reach the pairs kernel and die on a shape error).  Semantics:
    identical to passing the db per lane."""
    rng = np.random.default_rng(13)
    db = rng.uniform(-3, 3, (560, 2)).astype(np.float32)
    srcs = []
    for b in range(3):
        th = 0.02 * (b + 1)
        c, s = np.cos(th), np.sin(th)
        rot = np.array([[c, s], [-s, c]], np.float32)  # inverse motion
        srcs.append(db[: 520 - 5 * b] @ rot.T + np.float32(0.03 * b))
    sp = jnp.stack([_pad(s, 768)[0] for s in srcs])
    sm = jnp.stack([_pad(s, 768)[1] for s in srcs])
    dp, dm = _pad(db, 640)
    t0 = RigidTransform2.identity((3,), jnp.float32)
    dp3 = jnp.broadcast_to(dp, (3,) + dp.shape)
    dm3 = jnp.broadcast_to(dm, (3,) + dm.shape)
    for cfg in (CFG_FRAME, CFG_XLA):
        t_shared = icp2d(sp, dp, sm, dm, t0, cfg)
        t_tiled = icp2d(sp, dp3, sm, dm3, t0, cfg)
        np.testing.assert_array_equal(np.asarray(t_shared.rot),
                                      np.asarray(t_tiled.rot))
        np.testing.assert_array_equal(np.asarray(t_shared.t),
                                      np.asarray(t_tiled.t))


def test_frame_kernel_pairs_degenerate_lane():
    """One degenerate pair (perfect fit -> no update) must not disturb
    its neighbours, and must itself come back as the warm start."""
    sp, sm, dp, dm = _batch(bsz=3)
    dp = dp.at[1].set(sp[1])
    dm = dm.at[1].set(sm[1])
    b = sp.shape[0]
    t0 = RigidTransform2.identity((b,), jnp.float32)
    tp = icp2d(sp, dp, sm, dm, t0, CFG_FRAME)
    tx = icp2d(sp, dp, sm, dm, t0, CFG_XLA)
    np.testing.assert_array_equal(np.asarray(tp.rot[1]),
                                  np.eye(2, dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(tp.t[1]),
                                  np.zeros(2, np.float32))
    np.testing.assert_allclose(np.asarray(tp.rot), np.asarray(tx.rot),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(tp.t), np.asarray(tx.t),
                               atol=1e-5)
