"""Tunnel dataset (reference ``utils/tunnel_dataset.{h,cc}``): a stereo PNG
sequence with calibration supplied in the config file."""
from __future__ import annotations

import numpy as np

from bpvo_tpu.config import ConfigFile
from bpvo_tpu.data.dataset import (FileSequence, StereoCalibration,
                                   StereoDataset, _expand)
from bpvo_tpu.data.stereo import create_stereo_algorithm


class TunnelDataset(StereoDataset):
    def __init__(self, conf):
        cf = conf if isinstance(conf, ConfigFile) else ConfigFile(conf)
        root = _expand(cf.get("DataSetRootDirectory", "", str))
        left_fmt = cf.get("LeftImageFormat", "left/%06d.png", str)
        right_fmt = cf.get("RightImageFormat", "right/%06d.png", str)
        first = cf.get("FirstFrameNumber", 0, int)
        fx = cf.get("fx", 0.0, float)
        fy = cf.get("fy", fx, float)
        cx = cf.get("cx", 0.0, float)
        cy = cf.get("cy", 0.0, float)
        baseline = cf.get("baseline", 0.0, float)
        K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
        super().__init__(FileSequence(root, left_fmt, first),
                         FileSequence(root, right_fmt, first),
                         StereoCalibration(K=K, baseline=baseline),
                         create_stereo_algorithm(cf),
                         scale_by=cf.get("ScaleBy", 1, int))

    @property
    def name(self):
        return "tunnel"
