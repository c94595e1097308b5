"""Chain-elimination Schur solver vs dense GN (exactness) and CG."""

import jax.numpy as jnp
import numpy as np
import pytest

from icp_rust_tpu.geometry.transform2d import RigidTransform2
from icp_rust_tpu.geometry.transform3d import RigidTransform3
from icp_rust_tpu.models import pose_graph as pg
from icp_rust_tpu.models.graph_schur import _solve_delta, _structure, optimize_schur

F64 = jnp.float64


def _graph2d(n=60, n_loops=3, seed=0):
    rng = np.random.default_rng(seed)
    step = np.array([1.0, 0.0, 2 * np.pi / n])
    noisy = step + rng.normal(0, [0.02, 0.02, 0.01], (n - 1, 3))
    chain = RigidTransform2.from_twist(jnp.asarray(noisy, F64))
    # GT-ish loop closures between well-separated poses.
    extra = []
    gt = [RigidTransform2.identity(dtype=F64)]
    z = RigidTransform2.from_twist(jnp.asarray(step, F64))
    for _ in range(n - 1):
        gt.append(gt[-1].compose(z))
    pairs = [(0, n - 1), (5, n // 2), (10, 3 * n // 4)][:n_loops]
    for i, j in pairs:
        extra.append((i, j, gt[i].inverse().compose(gt[j]),
                      50.0 * np.eye(3)))
    return pg.odometry_chain_graph(chain, extra_edges=extra)


def _graph3d(n=40, seed=1):
    rng = np.random.default_rng(seed)
    step = np.array([1.0, 0.0, 0.05, 0.01, 0.0, 2 * np.pi / n])
    noisy = step + rng.normal(0, 0.01, (n - 1, 6))
    chain = RigidTransform3.from_twist(jnp.asarray(noisy, F64))
    gt = [RigidTransform3.identity(dtype=F64)]
    z = RigidTransform3.from_twist(jnp.asarray(step, F64))
    for _ in range(n - 1):
        gt.append(gt[-1].compose(z))
    extra = [(0, n - 1, gt[0].inverse().compose(gt[-1]), 50.0 * np.eye(6)),
             (7, 2 * n // 3, gt[7].inverse().compose(gt[2 * n // 3]),
              50.0 * np.eye(6))]
    return pg.odometry_chain_graph(chain, extra_edges=extra)


@pytest.mark.parametrize("graph_fn", [_graph2d, _graph3d])
def test_schur_delta_equals_dense_solve(graph_fn):
    graph = graph_fn()
    dof = graph.info.shape[-1]
    p = graph.poses.t.shape[0]
    r, ji, jj = pg.edge_residuals_and_jacobians(graph)
    w = pg._edge_weights(r, graph.info, graph.edge_mask, None)
    h, b = pg._assemble_dense(graph, r, ji, jj, w)
    gauge = pg._gauge_prior(p, dof, F64)
    dense = -jnp.linalg.solve(
        h + jnp.diag(gauge) + 1e-10 * jnp.eye(dof * p), b
    )
    schur = _solve_delta(
        graph, r, ji, jj, w, _structure(graph)
    ).reshape(-1)
    # The 1e8 gauge prior dominates the conditioning; different exact
    # factorizations agree to ~1e-8 relative, not machine eps.
    scale = float(jnp.max(jnp.abs(dense))) + 1e-30
    assert float(jnp.max(jnp.abs(schur - dense))) < 1e-6 * max(scale, 1.0)


@pytest.mark.parametrize("graph_fn", [_graph2d, _graph3d])
def test_schur_optimization_matches_dense_gn(graph_fn):
    graph = graph_fn()
    out_d = pg.optimize(graph, iters=15, solve="dense")
    out_s = optimize_schur(graph, iters=15)
    np.testing.assert_allclose(
        np.asarray(out_s.poses.t), np.asarray(out_d.poses.t), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(out_s.poses.rot), np.asarray(out_d.poses.rot),
        atol=1e-8,
    )


def test_schur_robust_kernel():
    graph = _graph2d()
    out_d = pg.optimize(graph, iters=12, solve="dense", huber_k=1.345,
                        kernel="cauchy")
    out_s = optimize_schur(graph, iters=12, huber_k=1.345, kernel="cauchy")
    np.testing.assert_allclose(
        np.asarray(out_s.poses.t), np.asarray(out_d.poses.t), atol=1e-8
    )


def test_schur_adjacent_skeleton_nodes():
    """Loop endpoints right next to each other -> zero-length segments."""
    rng = np.random.default_rng(3)
    n = 20
    chain = RigidTransform2.from_twist(jnp.asarray(
        np.array([1.0, 0, 0.1]) + rng.normal(0, 0.01, (n - 1, 3)), F64))
    z = RigidTransform2.from_twist(jnp.asarray([2.0, 0.1, 0.2], F64))
    extra = [(3, 4, z, 10.0 * np.eye(3)), (4, 5, z, 10.0 * np.eye(3))]
    graph = pg.odometry_chain_graph(chain, extra_edges=extra)
    out_d = pg.optimize(graph, iters=10, solve="dense")
    out_s = optimize_schur(graph, iters=10)
    np.testing.assert_allclose(
        np.asarray(out_s.poses.t), np.asarray(out_d.poses.t), atol=1e-8
    )


def test_schur_rejects_non_chain_graph():
    graph = _graph2d()
    bad = graph._replace(edge_i=graph.edge_i.at[3].set(7))
    with pytest.raises(ValueError):
        optimize_schur(bad, iters=2)


@pytest.mark.parametrize("graph_fn", [_graph2d, _graph3d])
def test_distributed_schur_matches_single_device(graph_fn):
    """Segment-sharded elimination + psum'd skeleton == single device."""
    from icp_rust_tpu.parallel import make_mesh

    graph = graph_fn()
    mesh = make_mesh(("dp",), (8,))
    out_s = optimize_schur(graph, iters=12)
    out_d = optimize_schur(graph, iters=12, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(out_d.poses.t), np.asarray(out_s.poses.t), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(out_d.poses.rot), np.asarray(out_s.poses.rot),
        atol=1e-10,
    )
