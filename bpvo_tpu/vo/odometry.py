"""VisualOdometry: the public frame-to-frame API.

Counterpart of the reference's pImpl facade ``bpvo/vo.{h,cc}``
(``addFrame`` flow at vo.cc:125-197, ``shouldKeyFrame`` at :199-224, point-cloud
extraction at :260-281, auto pyramid levels at :101-105) and of
``bpvo/vo_frame.{h,cc}`` (per-level descriptor pyramid + templates,
per-level K/baseline scaling at vo_frame.cc:13-29).

Keyframe bookkeeping is inherently sequential/stateful, so it lives in host
Python; all dense compute (descriptors, templates, GN) dispatches to per-level
jitted functions.
"""
from __future__ import annotations


from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bpvo_tpu.config import AlgorithmParameters
from bpvo_tpu.ops import descriptors, imgproc, pyramid, selection
from bpvo_tpu.types import KeyFramingReason, Result
from bpvo_tpu.vo import template_data as td_mod
from bpvo_tpu.vo import warp as warp_mod
from bpvo_tpu.vo.point_cloud import PointCloud
from bpvo_tpu.vo.pose_estimator import PoseEstimator
from bpvo_tpu.vo.trajectory import Trajectory


@partial(jax.jit, static_argnames=("p", "n_levels"))
def _process_frame(image, p: AlgorithmParameters, n_levels: int):
    """Image -> descriptor-channel pyramid, one fused dispatch
    (reference builds this per level with parallel_for, vo_frame.cc:48-59)."""
    out = []
    img = image
    for level in range(n_levels):
        out.append(descriptors.compute(img, p))
        if level + 1 < n_levels:
            img = imgproc.pyr_down(img)
    return tuple(out)


@partial(jax.jit, static_argnames=("p", "capacities"))
def _set_templates_all(channels_pyr, disparity, cams, p, capacities):
    """All levels' templates in one dispatch (reference vo_frame.cc:61-93)."""
    out = []
    for level, ch in enumerate(channels_pyr):
        d_level = imgproc.disparity_at_level(disparity, level)
        d_level = d_level[:ch.shape[1], :ch.shape[2]]
        out.append(td_mod.set_data(ch, d_level, cams[level], p,
                                   capacities[level], level))
    return tuple(out)


class _Frame:
    """One frame's pyramid of descriptor channels (+ templates when keyframe).

    Counterpart of VisualOdometryFrame (vo_frame.{h,cc})."""

    def __init__(self):
        self.channels: List[jnp.ndarray] = []
        self.disparity: Optional[jnp.ndarray] = None
        self.image: Optional[np.ndarray] = None
        self.templates: Optional[List] = None

    def set_data(self, image: np.ndarray, disparity: np.ndarray,
                 n_levels: int, p: AlgorithmParameters):
        self.image = image
        self.disparity = jnp.asarray(disparity, jnp.float32)
        self.templates = None
        self.channels = _process_frame(jnp.asarray(image, jnp.float32), p,
                                       n_levels)

    @property
    def has_template(self) -> bool:
        return self.templates is not None

    def set_template(self, cams, p: AlgorithmParameters, capacities):
        self.templates = _set_templates_all(
            tuple(self.channels), self.disparity, tuple(cams), p,
            tuple(capacities))

    def clear(self):
        self.channels = []
        self.templates = None
        self.disparity = None

    @property
    def empty(self) -> bool:
        return not self.channels


class VisualOdometry:
    """``VisualOdometry(K, baseline, image_size, params)`` then
    ``add_frame(image, disparity) -> Result`` (reference vo.h:31-105)."""

    def __init__(self, K, baseline: float, image_size, params: Optional[AlgorithmParameters] = None):
        p = params or AlgorithmParameters()
        rows, cols = image_size
        if p.numPyramidLevels <= 0:
            p = p.replace(numPyramidLevels=p.num_pyramid_levels_for(rows, cols))
        self._p = p
        self._rows, self._cols = rows, cols
        base_cam = warp_mod.CameraModel.from_K(K, baseline)
        self._cams = [base_cam.at_level(l) for l in range(p.numPyramidLevels)]
        shapes = pyramid.level_shapes(rows, cols, p.numPyramidLevels)
        self._capacities = [
            selection.capacity_for_level(p, r, c, l)
            for l, (r, c) in enumerate(shapes)]

        self._pose_estimator = PoseEstimator(p)
        self._trajectory = Trajectory()
        self._T_kf = np.eye(4, dtype=np.float32)

        self._ref = _Frame()
        self._cur = _Frame()
        self._prev = _Frame()

        self._ba_window = None  # enabled via enable_bundle_adjustment()

    # ------------------------------------------------------------------
    @property
    def params(self) -> AlgorithmParameters:
        return self._p

    @property
    def trajectory(self) -> Trajectory:
        return self._trajectory

    def num_points_at_level(self, level: int = -1) -> int:
        if level < 0:
            level = self._p.maxTestLevel
        if not self._ref.has_template:
            return 0
        return int(self._ref.templates[level].num_valid)

    # ------------------------------------------------------------------
    def enable_bundle_adjustment(self, window_size: int = 8, mesh=None,
                                 ba_options=None):
        """Refine the last ``window_size`` keyframe poses with windowed
        photometric BA after every new keyframe (capability beyond the
        reference — see bpvo_tpu/parallel/bundle_adjustment.py).  Pass a
        device mesh to distribute the reductions."""
        from bpvo_tpu.parallel.bundle_adjustment import (BAOptions,
                                                         KeyframeWindow)
        self._ba_window = KeyframeWindow(
            window_size, self._cams[self._p.maxTestLevel],
            ba_options or BAOptions(), mesh=mesh)
        self._kf_world_poses = []

    def refined_keyframe_poses(self):
        """(N_kf, 4, 4) camera-to-world poses of the keyframes in the current
        BA window, after the latest optimization."""
        if self._ba_window is None or len(self._ba_window) == 0:
            return np.zeros((0, 4, 4))
        return np.stack([np.linalg.inv(T) for T in self._ba_window._poses])

    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        """Checkpoint the VO state (no reference analogue — SURVEY.md §5).

        Templates are a pure function of (image, disparity), so only the raw
        keyframe/candidate frames plus the scalar state need storing; ``load``
        rebuilds the device state deterministically."""
        payload = {
            "T_kf": self._T_kf,
            "trajectory": (np.stack(self._trajectory.poses)
                           if len(self._trajectory) else np.zeros((0, 4, 4))),
        }
        if self._ref.image is not None:
            payload["ref_image"] = np.asarray(self._ref.image)
            payload["ref_disparity"] = np.asarray(self._ref.disparity)
        if not self._prev.empty and self._prev.image is not None:
            payload["prev_image"] = np.asarray(self._prev.image)
            payload["prev_disparity"] = np.asarray(self._prev.disparity)
        np.savez_compressed(path, **payload)

    def load(self, path: str) -> None:
        """Restore state written by ``save`` (same camera/params/size)."""
        if not path.endswith(".npz"):
            path = path + ".npz"
        data = np.load(path)
        p = self._p
        self._T_kf = data["T_kf"].astype(np.float32)
        self._trajectory = Trajectory()
        for T in data["trajectory"]:
            # re-push raw world poses directly
            self._trajectory._poses.append(T)
        if "ref_image" in data:
            self._ref = _Frame()
            self._ref.set_data(data["ref_image"], data["ref_disparity"],
                               p.numPyramidLevels, p)
            self._ref.set_template(self._cams, p, self._capacities)
        if "prev_image" in data:
            self._prev = _Frame()
            self._prev.set_data(data["prev_image"], data["prev_disparity"],
                                p.numPyramidLevels, p)

    def _ba_on_keyframe(self, T_world: np.ndarray):
        if self._ba_window is None or not self._ref.has_template:
            return
        lvl = self._p.maxTestLevel
        # warp pose of this keyframe: camera-from-world = inv(camera-to-world)
        self._ba_window.push(self._ref.templates[lvl],
                             self._ref.channels[lvl],
                             np.linalg.inv(T_world).astype(np.float32))
        if len(self._ba_window) >= 2:
            self._ba_window.optimize()

    # ------------------------------------------------------------------
    def add_frame(self, image: np.ndarray, disparity: np.ndarray) -> Result:
        """Estimate the motion of ``image`` wrt the current keyframe
        (reference vo.cc:125-197)."""
        p = self._p
        assert image.shape == (self._rows, self._cols), \
            f"image size {image.shape} != {(self._rows, self._cols)}"

        self._cur.set_data(image, disparity, p.numPyramidLevels, p)

        if not self._ref.has_template:
            # first frame (vo.cc:133-139)
            self._ref, self._cur = self._cur, self._ref
            self._ref.set_template(self._cams, p, self._capacities)
            self._trajectory.push(self._T_kf)
            return Result(pose=np.eye(4), covariance=np.eye(6),
                          is_keyframe=True,
                          keyframing_reason=KeyFramingReason.FIRST_FRAME,
                          optimizer_statistics=[])

        T_est, stats = self._pose_estimator.estimate(
            self._ref.templates, self._cur.channels, self._cams, self._T_kf,
            multistart_px=p.coarseInitOffsetPx)

        reason = self._should_keyframe(T_est)
        is_kf = reason != KeyFramingReason.NO_KEYFRAMING

        point_cloud = None
        used_candidate = False
        if not is_kf:
            # keep cur as a future keyframe candidate (vo.cc:148-153)
            self._prev, self._cur = self._cur, self._prev
            pose = T_est @ np.linalg.inv(self._T_kf)
            self._T_kf = T_est
        else:
            point_cloud = self._extract_point_cloud()
            if self._prev.empty:
                # no intermediate frame: current frame becomes keyframe (vo.cc:166-177)
                self._ref, self._cur = self._cur, self._ref
                self._ref.set_template(self._cams, p, self._capacities)
                pose = T_est @ np.linalg.inv(self._T_kf)
                self._T_kf = np.eye(4, dtype=np.float32)
            else:
                # previous frame becomes the keyframe and we re-estimate:
                # the estimate that triggered keyframing is suspect (vo.cc:178-188)
                used_candidate = True
                self._prev, self._ref = self._ref, self._prev
                self._prev.clear()
                self._ref.set_template(self._cams, p, self._capacities)
                # the re-estimate solves single-frame (candidate->current)
                # motion: skip the coarse levels and warm-start from the
                # measured T_est @ inv(T_kf) behind the acceptance gate
                # (keyframeReestimateStartLevel; -1 = reference-exact)
                if p.keyframeReestimateStartLevel >= 0:
                    n_levels = len(self._cur.channels)
                    start2 = min(max(p.keyframeReestimateStartLevel,
                                     p.maxTestLevel), n_levels - 1)
                    alt = (T_est @ np.linalg.inv(self._T_kf)).astype(
                        np.float32)
                else:
                    start2, alt = -1, None
                T_est, stats = self._pose_estimator.estimate(
                    self._ref.templates, self._cur.channels, self._cams,
                    np.eye(4, dtype=np.float32), start_level=start2,
                    alt_init=alt)
                pose = T_est
                self._T_kf = T_est

        self._trajectory.push(pose)
        if point_cloud is not None:
            point_cloud.pose = self._trajectory.back()

        if is_kf and self._ba_window is not None:
            # world pose of the new keyframe: the current frame's pose, or the
            # candidate's (one step back) when the candidate became keyframe
            idx = len(self._trajectory) - (2 if used_candidate else 1)
            self._ba_on_keyframe(self._trajectory[max(idx, 0)])

        return Result(pose=np.asarray(pose),
                      covariance=self._pose_estimator.last_covariance(),
                      is_keyframe=is_kf, keyframing_reason=reason,
                      optimizer_statistics=stats, point_cloud=point_cloud)

    # ------------------------------------------------------------------
    def _should_keyframe(self, T_est: np.ndarray) -> KeyFramingReason:
        """(reference vo.cc:199-224)"""
        p = self._p
        t_sq = float(np.sum(T_est[:3, 3] ** 2))
        if t_sq > p.minTranslationMagToKeyFrame ** 2:
            return KeyFramingReason.LARGE_TRANSLATION

        # Host-side Euler magnitude in DEGREES, per the reference's documented
        # contract (types.h:313-320 "Units: degrees").  NOTE the reference
        # IMPLEMENTATION compares radian Euler angles against the degree
        # threshold (math_utils.h RotationMatrixToEulerAngles returns asin
        # values, vo.cc:208-213), so its rotation test effectively never fires
        # for typical thresholds; we follow the documented semantics instead.
        R = np.asarray(T_est)[:3, :3]
        sy = np.sqrt(R[0, 0] ** 2 + R[1, 0] ** 2)
        euler = np.array([np.arctan2(R[2, 1], R[2, 2]),
                          np.arctan2(-R[2, 0], max(sy, 1e-12)),
                          np.arctan2(R[1, 0], R[0, 0])])
        if p.rotationKeyframeInDegrees:
            euler = np.degrees(euler)
        if float(np.sum(euler ** 2)) > p.minRotationMagToKeyFrame ** 2:
            return KeyFramingReason.LARGE_ROTATION

        frac = self._pose_estimator.fraction_of_good_points(p.goodPointThreshold)
        if frac < p.maxFractionOfGoodPointsToKeyFrame:
            return KeyFramingReason.SMALL_FRAC_OF_GOOD_POINTS

        return KeyFramingReason.NO_KEYFRAMING

    def _extract_point_cloud(self) -> Optional[PointCloud]:
        """(reference vo.cc:260-281): ref-frame template points at maxTestLevel,
        colored from the ref image, weighted by the last IRLS weights."""
        p = self._p
        if not self._ref.has_template:
            return None
        td = self._ref.templates[p.maxTestLevel]
        w = self._pose_estimator.last_weights()
        valid = np.asarray(td.valid)
        pts = np.asarray(td.points)[valid]
        if p.warpType == "DisparitySpace":
            # template stores (x-cx, y-cy, d); convert to 3D for the cloud
            cam = self._cams[p.maxTestLevel]
            import jax.numpy as jnp
            from bpvo_tpu.vo import warp as warp_mod
            pts = np.asarray(warp_mod.make_points(
                cam, jnp.asarray(pts[:, 0] + float(cam.cx)),
                jnp.asarray(pts[:, 1] + float(cam.cy)),
                jnp.asarray(np.maximum(pts[:, 2], 1e-3))))
        if w is not None and w.shape[1] == td.capacity:
            weights = np.asarray(w[0])[valid]
        else:
            weights = np.ones(len(pts), np.float32)
        scale = 1 << p.maxTestLevel
        ys = np.clip(np.asarray(td.rows)[valid] * scale, 0, self._rows - 1)
        xs = np.clip(np.asarray(td.cols)[valid] * scale, 0, self._cols - 1)
        img = self._ref.image
        c = (img[ys, xs] if img is not None
             else np.zeros(len(pts), np.float32)).astype(np.uint8)
        colors = np.stack([c, c, c, np.full_like(c, 255)], axis=1)
        return PointCloud(points=pts.astype(np.float32), colors=colors,
                          weights=weights.astype(np.float32))
