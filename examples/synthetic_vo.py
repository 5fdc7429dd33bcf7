"""Minimal embedding example (counterpart of reference apps/vo_example.cc:44-90):
run VO on the synthetic plane dataset using raw arrays and print per-frame poses.

    python examples/synthetic_vo.py [n_frames]
"""
import sys

import numpy as np

from bpvo_tpu import AlgorithmParameters, VisualOdometry
from bpvo_tpu.data.synthetic import SyntheticPlaneDataset


def main(n_frames: int = 10):
    ds = SyntheticPlaneDataset(rows=240, cols=320, n_frames=n_frames)
    calib = ds.calibration
    params = AlgorithmParameters(minSaliency=2.0, numPyramidLevels=3,
                                 functionTolerance=1e-4,
                                 parameterTolerance=1e-6)
    vo = VisualOdometry(calib.K, calib.baseline, ds.image_size, params)

    for i, frame in enumerate(ds):
        result = vo.add_frame(frame.image, frame.disparity)
        t = result.pose[:3, 3]
        iters = sum(s.num_iterations for s in result.optimizer_statistics)
        print(f"frame {i:3d}  t = [{t[0]:+.4f} {t[1]:+.4f} {t[2]:+.4f}]  "
              f"iters = {iters:3d}  kf = {result.is_keyframe}")

    # ground-truth comparison
    est = vo.trajectory.back()
    gt = ds.gt_world_pose(n_frames - 1)
    err = np.linalg.norm(est[:3, 3] - gt[:3, 3])
    print(f"final position error vs ground truth: {err * 100:.2f} cm")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
