"""VoApp: end-to-end driver — async loader -> VO -> trajectory/point-cloud/timing
outputs.

Counterpart of the reference's ``apps/vo_app.{h,cc}`` (loader thread + bounded
buffer + VO main loop at vo_app.cc:291-388; per-frame Hz/iteration logging at
:333-336; weight/depth-filtered PLY dumps at :258-274; trajectory/pose/timing
file outputs at :364-385).  The OpenCV display window is optional.
"""
from __future__ import annotations

import dataclasses
import time
from typing import List, Optional

import numpy as np

from bpvo_tpu.config import AlgorithmParameters, ConfigFile
from bpvo_tpu.data.dataset import Dataset
from bpvo_tpu.data.loader import DatasetLoaderThread
from bpvo_tpu.utils import debug
from bpvo_tpu.vo.odometry import VisualOdometry
from bpvo_tpu.vo.point_cloud import write_ply


@dataclasses.dataclass
class VoAppOptions:
    """(reference vo_app.h Options)"""
    trajectory_prefix: str = ""     # write <prefix>_path.txt / _kitti.txt
    points_prefix: str = ""         # write <prefix>_NNNN.ply per keyframe
    data_buffer_size: int = 16
    max_num_frames: int = -1
    store_iteration_time: bool = True
    min_point_weight: float = 0.75  # conf 'minPointWeight'
    max_point_depth: float = 10.0   # conf 'maxDepth'
    viewer: bool = False            # display loop (vo_app.cc:42-124); GUI
                                    # when available, else PNG dumps under
                                    # <trajectory_prefix>_frames/
    viewer_dump_every: int = 25


@dataclasses.dataclass
class VoAppResult:
    num_frames: int
    total_time_s: float
    frame_times_ms: List[float]
    iterations: List[int]
    vo: VisualOdometry

    @property
    def mean_hz(self) -> float:
        return self.num_frames / self.total_time_s if self.total_time_s else 0.0


class VoApp:
    def __init__(self, dataset: Dataset, params: AlgorithmParameters,
                 options: Optional[VoAppOptions] = None):
        self._dataset = dataset
        self._options = options or VoAppOptions()
        calib = dataset.calibration
        self._vo = VisualOdometry(calib.K, calib.baseline, dataset.image_size,
                                  params)

    @classmethod
    def from_config(cls, conf_file: str, **option_overrides) -> "VoApp":
        from bpvo_tpu.data.dataset import create_dataset
        cf = ConfigFile(conf_file)
        params = AlgorithmParameters.from_config(cf)
        opts = VoAppOptions(
            min_point_weight=cf.get("minPointWeight", 0.75, float),
            max_point_depth=cf.get("maxDepth", 10.0, float),
            **option_overrides)
        return cls(create_dataset(cf), params, opts)

    @property
    def vo(self) -> VisualOdometry:
        return self._vo

    def run(self, log_every: int = 25) -> VoAppResult:
        """(reference vo_app.cc:291-388 mainLoop)"""
        o = self._options
        frame_times: List[float] = []
        iterations: List[int] = []
        kf_index = 0
        n = 0
        t_start = time.perf_counter()

        viewer = None
        if o.viewer:
            from bpvo_tpu.utils.viz import Viewer
            dump = (o.trajectory_prefix + "_frames"
                    if o.trajectory_prefix else "vo_frames")
            viewer = Viewer(dump_dir=dump, dump_every=o.viewer_dump_every)

        max_frames = o.max_num_frames if o.max_num_frames > 0 else None
        with DatasetLoaderThread(self._dataset, o.data_buffer_size,
                                 max_frames=max_frames) as loader:
            for frame in loader:
                t0 = time.perf_counter()
                result = self._vo.add_frame(frame.image, frame.disparity)
                dt_ms = (time.perf_counter() - t0) * 1000.0
                frame_times.append(dt_ms)
                iterations.append(sum(
                    s.num_iterations for s in result.optimizer_statistics))
                n += 1

                if viewer is not None and not viewer.show(
                        frame.image, frame.disparity, hz=1000.0 / max(
                            dt_ms, 1e-9), is_keyframe=result.is_keyframe):
                    debug.info("viewer quit at frame %d", n)
                    break

                if result.point_cloud is not None and o.points_prefix:
                    pc = result.point_cloud.filtered(o.min_point_weight,
                                                     o.max_point_depth)
                    if len(pc):
                        write_ply(f"{o.points_prefix}_{kf_index:05d}.ply", pc)
                        kf_index += 1

                if log_every and n % log_every == 0:
                    hz = 1000.0 / max(np.mean(frame_times[-log_every:]), 1e-9)
                    debug.info("frame %d @ %.1f Hz [iters %d]%s", n, hz,
                               iterations[-1],
                               " KF" if result.is_keyframe else "")

        total = time.perf_counter() - t_start
        if viewer is not None:
            viewer.close()
        self._write_outputs(frame_times, iterations)
        return VoAppResult(num_frames=n, total_time_s=total,
                           frame_times_ms=frame_times, iterations=iterations,
                           vo=self._vo)

    def _write_outputs(self, frame_times, iterations):
        """(reference vo_app.cc:364-385)"""
        o = self._options
        if not o.trajectory_prefix:
            return
        traj = self._vo.trajectory
        traj.write_camera_path(o.trajectory_prefix + "_path.txt")
        traj.write(o.trajectory_prefix + "_poses.txt")
        traj.write_kitti_format(o.trajectory_prefix + "_kitti.txt")
        if o.store_iteration_time:
            np.savetxt(o.trajectory_prefix + "_time.txt",
                       np.asarray(frame_times))
            np.savetxt(o.trajectory_prefix + "_iterations.txt",
                       np.asarray(iterations, np.int32), fmt="%d")
