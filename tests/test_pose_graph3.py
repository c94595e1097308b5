"""SE(3) pose-graph tests: noisy 3D loop, robust kernel, distributed parity.

Mirrors tests/test_pose_graph.py on the 6-DoF group — the graph layer is
dimension-generic (models/pose_graph.py `_group`), so these exercise the
same code paths with RigidTransform3 poses, plus the jacfwd-at-identity
regression that only bites in 3D (so3.log's arccos branch).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icp_rust_tpu.geometry import so3
from icp_rust_tpu.geometry.transform3d import RigidTransform3
from icp_rust_tpu.models import pose_graph as pg

F64 = jnp.float64


def test_so3_log_jacfwd_finite_at_identity():
    """Chain edges at their own measurement have rel == I bitwise; the
    edge Jacobian jacfwd must stay finite there (regression: arccos'
    derivative is -inf at cos=1, so the Taylor branch must not use it)."""
    j = jax.jacfwd(lambda w: so3.log(so3.exp(w)))(jnp.zeros(3, F64))
    assert np.all(np.isfinite(np.asarray(j)))
    np.testing.assert_allclose(np.asarray(j), np.eye(3), atol=1e-12)


def _noisy_helix_graph(n=30, seed=0, drift=0.02):
    """Ground truth: poses along a closing 3D loop (helix-like twist with
    full 6-DoF motion); odometry carries systematic drift; one exact
    loop-closure edge ties the ends."""
    rng = np.random.default_rng(seed)
    step = np.array(
        [2 * np.pi * 5.0 / n, 0.0, 0.05, 0.01, 0.015, 2 * np.pi / n]
    )
    z_true = RigidTransform3.from_twist(jnp.asarray(step, F64))
    rots, ts = [jnp.eye(3, dtype=F64)], [jnp.zeros(3, dtype=F64)]
    for _ in range(n - 1):
        prev = RigidTransform3(rots[-1], ts[-1])
        nxt = prev.compose(z_true)
        rots.append(nxt.rot)
        ts.append(nxt.t)
    gt = RigidTransform3(jnp.stack(rots), jnp.stack(ts))

    noisy = []
    for _ in range(n - 1):
        pert = step + rng.normal(
            [drift, 0, 0, 0, 0, 0], [0.01, 0.01, 0.01, 0.003, 0.003, 0.003]
        )
        noisy.append(pert)
    chain = RigidTransform3.from_twist(jnp.asarray(np.stack(noisy), F64))

    t0 = RigidTransform3(gt.rot[0], gt.t[0])
    tn = RigidTransform3(gt.rot[n - 1], gt.t[n - 1])
    z_loop = t0.inverse().compose(tn)
    extra = [(0, n - 1, z_loop, 100.0 * np.eye(6))]
    graph = pg.odometry_chain_graph(chain, extra_edges=extra)
    return graph, gt


@pytest.mark.parametrize("solver", ["dense", "cg"])
def test_loop_closure_reduces_error_and_pulls_to_gt_3d(solver):
    graph, gt = _noisy_helix_graph()
    e0 = float(pg.graph_error(graph))
    out = pg.optimize(graph, iters=25, solve=solver, cg_iters=150)
    e1 = float(pg.graph_error(out))
    assert np.isfinite(e1)
    assert e1 < e0 * 0.05, (e0, e1)

    end_err = np.linalg.norm(
        np.asarray(out.poses.t[-1]) - np.asarray(gt.t[-1])
    )
    start_drifted = np.linalg.norm(
        np.asarray(graph.poses.t[-1]) - np.asarray(gt.t[-1])
    )
    assert end_err < start_drifted * 0.2, (end_err, start_drifted)


def test_gauge_fixed_pose0_stays_identity_3d():
    graph, _ = _noisy_helix_graph()
    out = pg.optimize(graph, iters=10, solve="dense")
    np.testing.assert_allclose(np.asarray(out.poses.t[0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out.poses.rot[0]), np.eye(3), atol=1e-6
    )


def test_robust_kernel_downweights_bad_loop_closure_3d():
    graph, gt = _noisy_helix_graph()
    bad_z = RigidTransform3.from_twist(
        jnp.asarray([30.0, -20.0, 10.0, 0.8, -0.5, 1.2], F64)
    )
    graph2 = pg.PoseGraph(
        poses=graph.poses,
        edge_i=jnp.concatenate([graph.edge_i, jnp.asarray([3], jnp.int32)]),
        edge_j=jnp.concatenate([graph.edge_j, jnp.asarray([20], jnp.int32)]),
        meas=RigidTransform3(
            jnp.concatenate([graph.meas.rot, bad_z.rot[None]]),
            jnp.concatenate([graph.meas.t, bad_z.t[None]]),
        ),
        info=jnp.concatenate(
            [graph.info, 100.0 * jnp.eye(6, dtype=F64)[None]]
        ),
        edge_mask=jnp.concatenate([graph.edge_mask, jnp.asarray([True])]),
    )
    out_plain = pg.optimize(graph2, iters=15, solve="dense")
    out_robust = pg.optimize(
        graph2, iters=15, solve="dense", huber_k=1.345, kernel="cauchy"
    )
    err_plain = np.linalg.norm(
        np.asarray(out_plain.poses.t) - np.asarray(gt.t), axis=1
    ).mean()
    err_robust = np.linalg.norm(
        np.asarray(out_robust.poses.t) - np.asarray(gt.t), axis=1
    ).mean()
    assert err_robust < err_plain * 0.5, (err_robust, err_plain)


def test_distributed_matches_single_device_cg_3d():
    from icp_rust_tpu.parallel import make_mesh
    from icp_rust_tpu.parallel.dist_graph import optimize_distributed

    graph, _ = _noisy_helix_graph()
    mesh = make_mesh(("dp",), (8,))
    out_d = optimize_distributed(graph, mesh, iters=15, cg_iters=150)
    out_s = pg.optimize(graph, iters=15, solve="cg", cg_iters=150)
    np.testing.assert_allclose(
        np.asarray(out_d.poses.t), np.asarray(out_s.poses.t), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_d.poses.rot), np.asarray(out_s.poses.rot), atol=1e-6
    )
