"""Pose-graph optimization tests: loop closure on a noisy circle."""

import jax.numpy as jnp
import numpy as np
import pytest

from icp_rust_tpu.geometry.transform2d import RigidTransform2
from icp_rust_tpu.models import pose_graph as pg

F64 = jnp.float64


def _noisy_circle_graph(n=30, seed=0, drift=0.03):
    """Ground truth: poses around a circle; odometry measurements carry a
    systematic drift; one loop-closure edge ties the ends together."""
    rng = np.random.default_rng(seed)
    step_len = 2 * np.pi * 5.0 / n
    dtheta = 2 * np.pi / n
    z_true = RigidTransform2.from_twist(
        jnp.asarray([step_len, 0.0, dtheta], F64)
    )
    # Ground-truth poses: integrate the exact chain.
    rots, ts = [jnp.eye(2, dtype=F64)], [jnp.zeros(2, dtype=F64)]
    for _ in range(n - 1):
        prev = RigidTransform2(rots[-1], ts[-1])
        nxt = prev.compose(z_true)
        rots.append(nxt.rot)
        ts.append(nxt.t)
    gt = RigidTransform2(jnp.stack(rots), jnp.stack(ts))

    # Noisy odometry chain.
    noisy = []
    for k in range(n - 1):
        pert = np.array([step_len, 0.0, dtheta]) + rng.normal(
            [drift, 0, 0], [0.01, 0.01, 0.005]
        )
        noisy.append(pert)
    chain = RigidTransform2.from_twist(jnp.asarray(np.stack(noisy), F64))

    # Loop closure: exact relative transform between pose 0 and pose n-1.
    t0 = RigidTransform2(gt.rot[0], gt.t[0])
    tn = RigidTransform2(gt.rot[n - 1], gt.t[n - 1])
    z_loop = t0.inverse().compose(tn)
    extra = [(0, n - 1, z_loop, 100.0 * np.eye(3))]
    graph = pg.odometry_chain_graph(chain, extra_edges=extra)
    return graph, gt


@pytest.mark.parametrize("solver", ["dense", "cg"])
def test_loop_closure_reduces_error_and_pulls_to_gt(solver):
    graph, gt = _noisy_circle_graph()
    e0 = float(pg.graph_error(graph))
    out = pg.optimize(graph, iters=25, solve=solver, cg_iters=100)
    e1 = float(pg.graph_error(out))
    assert e1 < e0 * 0.05, (e0, e1)

    # End pose (pinned by the loop closure) must be near ground truth.
    end_err = np.linalg.norm(
        np.asarray(out.poses.t[-1]) - np.asarray(gt.t[-1])
    )
    start_drifted = np.linalg.norm(
        np.asarray(graph.poses.t[-1]) - np.asarray(gt.t[-1])
    )
    assert end_err < start_drifted * 0.2, (end_err, start_drifted)


def test_gauge_fixed_pose0_stays_identity():
    graph, _ = _noisy_circle_graph()
    out = pg.optimize(graph, iters=10, solve="dense")
    np.testing.assert_allclose(np.asarray(out.poses.t[0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out.poses.rot[0]), np.eye(2), atol=1e-6
    )


def test_edge_mask_excludes_edges():
    graph, _ = _noisy_circle_graph()
    # Masking out the loop closure must leave the drift uncorrected.
    masked = graph._replace(
        edge_mask=graph.edge_mask.at[-1].set(False)
    )
    out_m = pg.optimize(masked, iters=10, solve="dense")
    out_f = pg.optimize(graph, iters=10, solve="dense")
    # With the loop closure, the end pose moves substantially more.
    d_m = np.linalg.norm(
        np.asarray(out_m.poses.t[-1]) - np.asarray(graph.poses.t[-1])
    )
    d_f = np.linalg.norm(
        np.asarray(out_f.poses.t[-1]) - np.asarray(graph.poses.t[-1])
    )
    assert d_f > 5 * d_m, (d_f, d_m)


def test_robust_kernel_downweights_bad_loop_closure():
    graph, gt = _noisy_circle_graph()
    # Add a grossly wrong extra edge.
    bad_z = RigidTransform2.from_twist(jnp.asarray([30.0, -20.0, 1.5], F64))
    graph2 = pg.PoseGraph(
        poses=graph.poses,
        edge_i=jnp.concatenate([graph.edge_i, jnp.asarray([3], jnp.int32)]),
        edge_j=jnp.concatenate([graph.edge_j, jnp.asarray([20], jnp.int32)]),
        meas=RigidTransform2(
            jnp.concatenate([graph.meas.rot, bad_z.rot[None]]),
            jnp.concatenate([graph.meas.t, bad_z.t[None]]),
        ),
        info=jnp.concatenate([graph.info, 100.0 * jnp.eye(3, dtype=F64)[None]]),
        edge_mask=jnp.concatenate([graph.edge_mask, jnp.asarray([True])]),
    )
    out_plain = pg.optimize(graph2, iters=15, solve="dense")
    out_robust = pg.optimize(
        graph2, iters=15, solve="dense", huber_k=1.345, kernel="cauchy"
    )
    # The bad 3->20 edge distorts the interior poses; robustification must
    # suppress it (mean ATE over all poses).
    err_plain = np.linalg.norm(
        np.asarray(out_plain.poses.t) - np.asarray(gt.t), axis=1
    ).mean()
    err_robust = np.linalg.norm(
        np.asarray(out_robust.poses.t) - np.asarray(gt.t), axis=1
    ).mean()
    assert err_robust < err_plain * 0.5, (err_robust, err_plain)


def test_distributed_matches_single_device_cg():
    from icp_rust_tpu.parallel import make_mesh
    from icp_rust_tpu.parallel.dist_graph import optimize_distributed

    graph, gt = _noisy_circle_graph()
    mesh = make_mesh(("dp",), (8,))
    out_d = optimize_distributed(graph, mesh, iters=15, cg_iters=100)
    out_s = pg.optimize(graph, iters=15, solve="cg", cg_iters=100)
    np.testing.assert_allclose(
        np.asarray(out_d.poses.t), np.asarray(out_s.poses.t), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_d.poses.rot), np.asarray(out_s.poses.rot), atol=1e-6
    )
