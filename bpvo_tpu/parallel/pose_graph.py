"""Pose-graph optimization over keyframe poses.

No reference analogue — halismai/bpvo only accumulates a trajectory
(trajectory.cc:42-50); BASELINE.json explicitly names the pose-graph layer as
a capability to add.  Nodes are keyframe warp poses T_k (camera-from-world),
edges carry measured relative poses Z_ij ~ T_i T_j^{-1} with 6x6 information
matrices (e.g. the GN Hessian of the frame-to-frame solve, which
``VisualOdometry`` already exposes as ``Result.covariance``^-1).

Residual per edge:  r_ij = log( Z_ij^{-1} T_i(d_i) T_j(d_j)^{-1} )
with right-increments T_k(d) = T_k exp(d_k).  Jacobians come from jax
autodiff through the closed-form ``se3.log`` — exact, no small-angle
hand-derivation to get wrong — and the normal equations are solved as one
dense (6N, 6N) system (windows here are tens of keyframes; blocks stay tiny).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bpvo_tpu.core import se3


class PoseGraphOptions(NamedTuple):
    max_iterations: int = 10
    damping: float = 1e-6
    gauge_prior: float = 1e9


def edge_residuals(poses, deltas, edge_idx, measurements_inv):
    """All edge residuals (E, 6) for perturbed poses T_k exp(d_k)."""
    T = jnp.einsum("nij,njk->nik", poses, se3.exp(deltas))
    Ti = T[edge_idx[:, 0]]
    Tj = T[edge_idx[:, 1]]
    rel = jnp.einsum("eij,ejk->eik", Ti, se3.inverse(Tj))
    return se3.log(jnp.einsum("eij,ejk->eik", measurements_inv, rel))


@partial(jax.jit, static_argnames=("opts",))
def optimize(poses_init, edge_idx, measurements, information,
             opts: PoseGraphOptions = PoseGraphOptions()):
    """Optimize (N, 4, 4) poses given (E, 2) edge indices, (E, 4, 4) measured
    relative poses, and (E, 6, 6) information matrices.  Node 0 is the gauge.

    Returns (poses (N, 4, 4), final chi2).
    """
    N = poses_init.shape[0]
    E = edge_idx.shape[0]
    meas_inv = se3.inverse(jnp.asarray(measurements, jnp.float32))
    info = jnp.asarray(information, jnp.float32)
    edge_idx = jnp.asarray(edge_idx, jnp.int32)

    def iteration(carry, _):
        poses, _chi = carry
        zero = jnp.zeros((N, 6), jnp.float32)
        r = edge_residuals(poses, zero, edge_idx, meas_inv)     # (E, 6)
        # exact Jacobian via autodiff: (E, 6, N, 6)
        J = jax.jacfwd(
            lambda d: edge_residuals(poses, d, edge_idx, meas_inv))(zero)
        Jf = J.reshape(E * 6, N * 6)
        # weight by information: stack sqrt-info-applied residual/jacobian
        # H = J^T L J, g = J^T L r with L block-diag of info
        Lr = jnp.einsum("epq,eq->ep", info, r).reshape(E * 6)
        LJ = jnp.einsum("epq,eqnk->epnk", info,
                        J).reshape(E * 6, N * 6)
        H = Jf.T @ LJ
        g = Jf.T @ Lr
        chi2 = jnp.dot(r.reshape(-1), Lr)

        H = H.at[:6, :6].add(opts.gauge_prior * jnp.eye(6))
        H = H + opts.damping * jnp.eye(N * 6)
        delta = -jnp.linalg.solve(H, g).reshape(N, 6)
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0).at[0].set(0.0)
        new_poses = jnp.einsum("nij,njk->nik", poses, se3.exp(delta))
        return (new_poses, chi2), chi2

    (poses, chi2), _ = jax.lax.scan(
        iteration, (jnp.asarray(poses_init, jnp.float32),
                    jnp.asarray(jnp.inf, jnp.float32)),
        None, length=opts.max_iterations)
    return poses, chi2


def sequential_edges(n: int) -> np.ndarray:
    """Odometry chain edges (k, k+1)."""
    return np.stack([np.arange(n - 1), np.arange(1, n)], axis=1)


class PoseGraph:
    """Host-side accumulator: add odometry/loop-closure constraints, optimize."""

    def __init__(self, opts: PoseGraphOptions = PoseGraphOptions()):
        self._opts = opts
        self._poses = []
        self._edges = []
        self._measurements = []
        self._infos = []

    def add_node(self, T: np.ndarray) -> int:
        self._poses.append(np.asarray(T, np.float32))
        return len(self._poses) - 1

    def add_edge(self, i: int, j: int, Z_ij: np.ndarray,
                 information: np.ndarray = None):
        self._edges.append((i, j))
        self._measurements.append(np.asarray(Z_ij, np.float32))
        self._infos.append(np.eye(6, dtype=np.float32)
                           if information is None
                           else np.asarray(information, np.float32))

    def optimize(self) -> np.ndarray:
        if len(self._poses) < 2 or not self._edges:
            return np.stack(self._poses) if self._poses else np.zeros((0, 4, 4))
        poses, _ = optimize(
            np.stack(self._poses), np.asarray(self._edges, np.int32),
            np.stack(self._measurements), np.stack(self._infos), self._opts)
        out = np.asarray(poses)
        self._poses = [out[k] for k in range(len(out))]
        return out
