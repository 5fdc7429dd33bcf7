"""Synthetic plane-scene dataset: analytic texture on a slanted plane observed
under a configurable constant per-frame motion.

No reference analogue — serves as a deterministic, dependency-free fixture for
tests and benchmarks (the role Tsukuba's ground-truth disparity plays for the
reference), with exact ground-truth trajectory for ATE/RPE evaluation.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from bpvo_tpu.config import ConfigFile
from bpvo_tpu.data.dataset import Dataset, DatasetFrame, StereoCalibration


class SyntheticPlaneDataset(Dataset):
    def __init__(self, rows: int = 240, cols: int = 320,
                 twist_per_frame=(0.0005, 0.001, 0.0008, 0.006, 0.002, 0.03),
                 n_frames: int = 100, fx: float = 0.0, baseline: float = 0.12,
                 z0: float = 8.0):
        from bpvo_tpu.core import se3
        import jax.numpy as jnp
        self._rows, self._cols = rows, cols
        fx = fx or 0.8 * cols
        self._K = np.array([[fx, 0, cols / 2.0], [0, fx, rows / 2.0],
                            [0, 0, 1]], np.float64)
        self._baseline = baseline
        self._n = n_frames
        n_pl = np.array([0.12, 0.22, 1.0])
        self._n_pl = n_pl / np.linalg.norm(n_pl)
        self._d_pl = z0 * self._n_pl[2]
        self._step = np.asarray(
            se3.exp(jnp.asarray(twist_per_frame, jnp.float32)), dtype=np.float64)
        uu, vv = np.meshgrid(np.arange(cols, dtype=np.float64),
                             np.arange(rows, dtype=np.float64))
        self._uu, self._vv = uu, vv
        K = self._K
        self._rays = np.stack([(uu - K[0, 2]) / K[0, 0],
                               (vv - K[1, 2]) / K[1, 1],
                               np.ones_like(uu)], -1)

    @classmethod
    def from_config(cls, cf: ConfigFile) -> "SyntheticPlaneDataset":
        return cls(rows=cf.get("SyntheticRows", 240, int),
                   cols=cf.get("SyntheticCols", 320, int),
                   n_frames=cf.get("SyntheticNumFrames", 100, int))

    @staticmethod
    def _texture(x, y):
        return (128 + 60 * np.sin(x / 7.0) * np.cos(y / 9.0)
                + 40 * np.sin((x + 2 * y) / 13.0))

    def pose_at(self, i: int) -> np.ndarray:
        """Ground-truth warp pose of frame i wrt frame 0 (X_i = T X_0)."""
        return np.linalg.matrix_power(self._step, i)

    def gt_world_pose(self, i: int) -> np.ndarray:
        """Camera-to-world pose (trajectory convention: inverse of pose_at)."""
        return np.linalg.inv(self.pose_at(i))

    def get_frame(self, i: int) -> Optional[DatasetFrame]:
        if i >= self._n:
            return None
        T = self.pose_at(i)
        K, uu, vv = self._K, self._uu, self._vv
        R, t = T[:3, :3], T[:3, 3]
        Hm = K @ (R + np.outer(t, self._n_pl) / self._d_pl) @ np.linalg.inv(K)
        Hinv = np.linalg.inv(Hm)
        w = Hinv[2, 0] * uu + Hinv[2, 1] * vv + Hinv[2, 2]
        x0 = (Hinv[0, 0] * uu + Hinv[0, 1] * vv + Hinv[0, 2]) / w
        y0 = (Hinv[1, 0] * uu + Hinv[1, 1] * vv + Hinv[1, 2]) / w
        I = self._texture(x0, y0).astype(np.float32)
        n1 = R @ self._n_pl
        d1 = self._d_pl + n1 @ t
        Z = d1 / (self._rays @ n1)
        D = (self._K[0, 0] * self._baseline / Z).astype(np.float32)
        return DatasetFrame(image=I, disparity=D, filename=f"synthetic/{i:06d}")

    @property
    def calibration(self) -> StereoCalibration:
        return StereoCalibration(K=self._K.astype(np.float32),
                                 baseline=self._baseline)

    @property
    def image_size(self):
        return (self._rows, self._cols)

    @property
    def name(self):
        return "synthetic-plane"
