"""Pose-graph optimization: chain + loop-closure recovery."""
import jax.numpy as jnp
import numpy as np

from bpvo_tpu.core import se3
from bpvo_tpu.parallel import pose_graph as pg


def make_chain(n, step_twist, noise=0.0, seed=0):
    r = np.random.default_rng(seed)
    T_step = np.asarray(se3.exp(jnp.asarray(step_twist, jnp.float32)))
    gt = [np.eye(4, dtype=np.float32)]
    for _ in range(n - 1):
        gt.append((T_step @ gt[-1]).astype(np.float32))
    meas = []
    for k in range(n - 1):
        Z = gt[k] @ np.linalg.inv(gt[k + 1])
        if noise > 0:
            tw = (noise * r.standard_normal(6)).astype(np.float32)
            Z = np.asarray(se3.exp(jnp.asarray(tw))) @ Z
        meas.append(Z.astype(np.float32))
    return gt, meas


def test_perfect_chain_zero_residual():
    gt, meas = make_chain(6, [0.01, 0, 0.005, 0.1, 0, 0.2])
    edges = pg.sequential_edges(6)
    poses, chi2 = pg.optimize(np.stack(gt), edges, np.stack(meas),
                              np.stack([np.eye(6)] * 5))
    assert float(chi2) < 1e-6
    for a, b in zip(np.asarray(poses), gt):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_perturbed_nodes_recover():
    gt, meas = make_chain(6, [0.01, 0, 0.005, 0.1, 0, 0.2])
    r = np.random.default_rng(1)
    init = [gt[0]]
    for T in gt[1:]:
        tw = (0.05 * r.standard_normal(6)).astype(np.float32)
        init.append((np.asarray(se3.exp(jnp.asarray(tw))) @ T).astype(np.float32))
    edges = pg.sequential_edges(6)
    poses, chi2 = pg.optimize(np.stack(init), edges, np.stack(meas),
                              np.stack([np.eye(6)] * 5))
    for a, b in zip(np.asarray(poses), gt):
        err = np.abs(np.asarray(se3.log(jnp.asarray(
            a @ np.linalg.inv(b), jnp.float32)))).max()
        assert err < 2e-3, err  # f32 composition roundoff floor


def test_loop_closure_distributes_drift():
    """Odometry with drift + one exact loop-closure edge: the closure pulls
    the final node back toward truth."""
    n = 8
    gt, meas = make_chain(n, [0, 0, 0, 0.2, 0, 0])
    # drifted odometry measurements (consistent bias)
    bias = np.asarray(se3.exp(jnp.asarray([0, 0, 0.01, 0.005, 0, 0],
                                          jnp.float32)))
    meas_drift = [(bias @ Z).astype(np.float32) for Z in meas]

    graph = pg.PoseGraph()
    # initialize nodes by chaining the drifted measurements
    T = np.eye(4, dtype=np.float32)
    graph.add_node(T)
    for k, Z in enumerate(meas_drift):
        T = (np.linalg.inv(Z) @ T).astype(np.float32)
        graph.add_node(T)
        graph.add_edge(k, k + 1, Z)
    drift_before = np.abs(np.asarray(se3.log(jnp.asarray(
        graph._poses[-1] @ np.linalg.inv(gt[-1]), jnp.float32)))).max()

    # strong loop closure: exact relative pose between first and last
    Z_loop = (gt[0] @ np.linalg.inv(gt[-1])).astype(np.float32)
    graph.add_edge(0, n - 1, Z_loop, 1e4 * np.eye(6, dtype=np.float32))
    poses = graph.optimize()

    drift_after = np.abs(np.asarray(se3.log(jnp.asarray(
        poses[-1] @ np.linalg.inv(gt[-1]), jnp.float32)))).max()
    assert drift_before > 0.02
    assert drift_after < drift_before * 0.15, (drift_before, drift_after)
