"""Coarse-to-fine multi-level pose estimation driver.

Counterpart of the reference's ``bpvo/vo_pose_estimator.{h,cc}``
(``estimatePose`` loop from coarsest level down to maxTestLevel at
vo_pose_estimator.cc:63-93; relaxed parameters for coarse levels;
``getFractionOfGoodPoints`` at :101-107).

Each pyramid level has its own static shape, so each level's GN run is its own
jit specialization (compiled once per image-size/parameter combination and
cached process-wide).
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from bpvo_tpu.config import AlgorithmParameters
from bpvo_tpu.solver import gauss_newton as gn
from bpvo_tpu.types import OptimizerStatistics
from bpvo_tpu.vo import warp as warp_mod
from bpvo_tpu.vo.template_data import TemplateData


@partial(jax.jit, static_argnames=("opts",))
def _run_level(tdata, channels, cam, T, opts):
    return gn.run(tdata, channels, cam, T, opts)


class PoseEstimator:
    def __init__(self, p: AlgorithmParameters):
        self._p = p
        self._fine_opts = gn.GNOptions.from_params(p, coarse=False)
        self._coarse_opts = gn.GNOptions.from_params(p, coarse=True)
        self._last_state: Optional[gn.GNState] = None
        self._last_tdata: Optional[TemplateData] = None

    def estimate(self, templates: Sequence[Optional[TemplateData]],
                 channels_pyr: Sequence[jnp.ndarray],
                 cams: Sequence[warp_mod.CameraModel],
                 T_init) -> tuple:
        """Run GN from the coarsest level down to maxTestLevel.

        ``templates[l]``/``channels_pyr[l]``/``cams[l]`` are per-level; levels
        below maxTestLevel may be None.  Returns (T_est (4,4) np, per-level
        OptimizerStatistics list).
        """
        p = self._p
        n_levels = len(channels_pyr)
        stats: List[Optional[OptimizerStatistics]] = [None] * n_levels
        T = jnp.asarray(T_init, jnp.float32)

        st = None
        for level in range(n_levels - 1, p.maxTestLevel - 1, -1):
            opts = self._fine_opts if level == p.maxTestLevel else self._coarse_opts
            st = _run_level(templates[level], channels_pyr[level], cams[level],
                            T, opts)
            T = st.T
            stats[level] = OptimizerStatistics(
                num_iterations=int(st.num_iters),
                final_error=float(st.f_norm),
                first_order_optimality=float(jnp.max(jnp.abs(st.g))),
                status=gn.STATUS_ENUMS[int(st.status)])

        self._last_state = st
        self._last_tdata = templates[p.maxTestLevel]
        return np.asarray(T), [s for s in stats if s is not None]

    # ---- queries about the most recent run (finest level) ----

    def fraction_of_good_points(self, threshold: float) -> float:
        """(reference vo_pose_estimator.cc:101-107)"""
        if self._last_state is None:
            return 1.0
        td = self._last_tdata
        return float(gn.fraction_of_good_points(
            self._last_state.weights, td.num_channels, td.num_valid, threshold))

    def last_weights(self):
        return None if self._last_state is None else self._last_state.weights

    def last_covariance(self) -> np.ndarray:
        """6x6 covariance = inverse of the final GN Hessian
        (reference Result.covariance, types.h:503)."""
        if self._last_state is None:
            return np.eye(6)
        H = np.asarray(self._last_state.H, np.float64)
        try:
            return np.linalg.inv(H)
        except np.linalg.LinAlgError:
            return np.linalg.pinv(H)
