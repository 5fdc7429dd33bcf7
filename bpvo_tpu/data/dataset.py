"""Dataset abstraction: frames of (grayscale image, float disparity) + calibration.

Counterpart of the reference's ``utils/dataset.{h,cc}`` (``Dataset`` interface,
``DisparityDataset`` with precomputed disparity at dataset.cc:39-92,
``StereoDataset`` running a stereo matcher per frame at dataset.cc:103-135) and
the factory ``Dataset::Create`` keyed on the ``Dataset`` config entry
(utils/dataset_create.cc:11-28).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import numpy as np

from bpvo_tpu.config import ConfigFile


@dataclasses.dataclass
class StereoCalibration:
    """(reference utils/stereo_calibration.h:17-35)"""
    K: np.ndarray       # (3, 3) intrinsics
    baseline: float     # stereo baseline in meters

    def scaled(self, s: float) -> "StereoCalibration":
        K = self.K.copy() * s
        K[2, 2] = 1.0
        return StereoCalibration(K=K, baseline=self.baseline / s)


@dataclasses.dataclass
class DatasetFrame:
    image: np.ndarray            # (H, W) uint8/float32 grayscale
    disparity: np.ndarray        # (H, W) float32
    original: Optional[np.ndarray] = None   # original (possibly color) image
    filename: str = ""


def _to_gray(img: np.ndarray) -> np.ndarray:
    if img.ndim == 3:
        import cv2
        code = cv2.COLOR_BGRA2GRAY if img.shape[2] == 4 else cv2.COLOR_BGR2GRAY
        return cv2.cvtColor(img, code)
    return img


def _expand(path: str) -> str:
    return os.path.expanduser(path)


class FileSequence:
    """printf-style or glob file-sequence enumeration (reference
    utils/file_loader.h:12-42 + utils/glob.{h,cc}).

    A format containing ``%`` is treated printf-style (lazy, unbounded); one
    containing ``*``/``?`` is globbed eagerly and sorted."""

    def __init__(self, root_dir: str, fmt: str, first_frame: int = 0):
        self._root = _expand(root_dir)
        self._fmt = fmt
        self._first = first_frame
        self._globbed = None
        if "%" not in fmt and any(ch in fmt for ch in "*?["):
            import glob as _glob
            self._globbed = sorted(
                _glob.glob(os.path.join(self._root, fmt)))[first_frame:]

    def __getitem__(self, i: int) -> str:
        if self._globbed is not None:
            return self._globbed[i] if i < len(self._globbed) else ""
        return os.path.join(self._root, self._fmt % (self._first + i))

    def exists(self, i: int) -> bool:
        return bool(self[i]) and os.path.exists(self[i])


class Dataset:
    """Interface: get_frame(i) -> DatasetFrame | None, plus calibration/size."""

    def get_frame(self, i: int) -> Optional[DatasetFrame]:
        raise NotImplementedError

    @property
    def calibration(self) -> StereoCalibration:
        raise NotImplementedError

    @property
    def image_size(self) -> Tuple[int, int]:
        raise NotImplementedError

    @property
    def name(self) -> str:
        return type(self).__name__

    def __iter__(self):
        i = 0
        while True:
            f = self.get_frame(i)
            if f is None:
                return
            yield f
            i += 1


class DisparityDataset(Dataset):
    """Frames with precomputed disparity maps (reference dataset.cc:39-92).

    uint16/uint8 disparity images are scaled by ``DisparityScale``
    (default 1/16, KITTI convention)."""

    def __init__(self, images: FileSequence, disparities: FileSequence,
                 calib: StereoCalibration, disparity_scale: float = 1.0 / 16.0):
        self._images = images
        self._disparities = disparities
        self._calib = calib
        self._scale = disparity_scale
        f0 = self.get_frame(0)
        if f0 is None:
            raise FileNotFoundError(
                f"cannot read first frame: {images[0]} / {disparities[0]}")
        self._size = f0.image.shape[:2]

    def get_frame(self, i: int) -> Optional[DatasetFrame]:
        import cv2
        img = cv2.imread(self._images[i], cv2.IMREAD_UNCHANGED)
        dsp = cv2.imread(self._disparities[i], cv2.IMREAD_UNCHANGED)
        if img is None or dsp is None:
            return None
        gray = _to_gray(img)
        if dsp.dtype != np.float32:
            dsp = dsp.astype(np.float32) * self._scale
        return DatasetFrame(image=gray, disparity=dsp, original=img,
                            filename=self._images[i])

    @property
    def calibration(self) -> StereoCalibration:
        return self._calib

    @property
    def image_size(self):
        return self._size


class StereoDataset(Dataset):
    """Left/right image pairs run through a stereo matcher per frame
    (reference dataset.cc:103-135)."""

    def __init__(self, left: FileSequence, right: FileSequence,
                 calib: StereoCalibration, stereo_algorithm,
                 scale_by: int = 1):
        self._left = left
        self._right = right
        self._stereo = stereo_algorithm
        self._scale_by = scale_by
        self._calib = calib.scaled(1.0 / scale_by) if scale_by > 1 else calib
        f0 = self.get_frame(0)
        if f0 is None:
            raise FileNotFoundError(f"cannot read first frame: {left[0]}")
        self._size = f0.image.shape[:2]

    def get_frame(self, i: int) -> Optional[DatasetFrame]:
        import cv2
        L = cv2.imread(self._left[i], cv2.IMREAD_UNCHANGED)
        R = cv2.imread(self._right[i], cv2.IMREAD_UNCHANGED)
        if L is None or R is None:
            return None
        original = L
        L, R = _to_gray(L), _to_gray(R)
        if self._scale_by > 1:
            s = 1.0 / self._scale_by
            L = cv2.resize(L, None, fx=s, fy=s)
            R = cv2.resize(R, None, fx=s, fy=s)
        D = self._stereo.run(L, R)
        return DatasetFrame(image=L, disparity=D, original=original,
                            filename=self._left[i])

    @property
    def calibration(self) -> StereoCalibration:
        return self._calib

    @property
    def image_size(self):
        return self._size


def create_dataset(conf) -> Dataset:
    """Factory keyed on the ``Dataset`` config entry
    (reference utils/dataset_create.cc:11-28).  Accepts a ConfigFile or path."""
    cf = conf if isinstance(conf, ConfigFile) else ConfigFile(conf)
    name = cf.get("Dataset", "", str).lower()
    if name in ("tsukuba", "tsukuba_synthetic"):
        from bpvo_tpu.data.tsukuba import TsukubaSyntheticDataset
        return TsukubaSyntheticDataset(cf)
    if name == "tsukuba_stereo":
        from bpvo_tpu.data.tsukuba import TsukubaStereoDataset
        return TsukubaStereoDataset(cf)
    if name == "kitti":
        from bpvo_tpu.data.kitti import KittiDataset
        return KittiDataset(cf)
    if name == "tunnel":
        from bpvo_tpu.data.tunnel import TunnelDataset
        return TunnelDataset(cf)
    if name == "synthetic":
        from bpvo_tpu.data.synthetic import SyntheticPlaneDataset
        return SyntheticPlaneDataset.from_config(cf)
    if name == "synthetic_corridor":
        from bpvo_tpu.data.synthetic import SyntheticCorridorDataset
        return SyntheticCorridorDataset.from_config(cf)
    if name == "synthetic_occluder":
        from bpvo_tpu.data.synthetic import SyntheticOccluderDataset
        return SyntheticOccluderDataset.from_config(cf)
    if name == "synthetic_stereo":
        from bpvo_tpu.data.synthetic import SyntheticStereoPlaneDataset
        return SyntheticStereoPlaneDataset.from_config(cf)
    if name == "stereo":
        # generic file-based stereo sequence (reference StereoDataset,
        # dataset.cc:103-135): LeftImageFormat/RightImageFormat printf or
        # glob patterns + StereoAlgorithm config keys
        from bpvo_tpu.data.stereo import create_stereo_algorithm
        from bpvo_tpu.data.tunnel import load_calibration_file
        root = _expand(cf.get("DataSetRootDirectory", "", str))
        calib_fn = cf.get("CalibrationFile", "", str)
        if calib_fn:
            calib = load_calibration_file(calib_fn)
        else:
            fx = cf.get("fx", 0.0, float)
            K = np.array([[fx, 0, cf.get("cx", 0.0, float)],
                          [0, cf.get("fy", fx, float),
                           cf.get("cy", 0.0, float)],
                          [0, 0, 1]], np.float32)
            calib = StereoCalibration(K=K, baseline=cf.get("baseline", 0.0,
                                                           float))
        first = cf.get("FirstFrameNumber", 0, int)
        return StereoDataset(
            FileSequence(root, cf.get("LeftImageFormat", "left/%06d.png",
                                      str), first),
            FileSequence(root, cf.get("RightImageFormat", "right/%06d.png",
                                      str), first),
            calib, create_stereo_algorithm(cf),
            scale_by=cf.get("ScaleBy", 1, int))
    if name == "disparity":
        # generic precomputed-disparity sequence (reference DisparityDataset,
        # dataset.cc:39-92): LeftImageFormat/DisparityMapFormat printf
        # patterns + CalibrationFile (fx fy cx cy baseline) or inline keys
        from bpvo_tpu.data.tunnel import load_calibration_file
        root = _expand(cf.get("DataSetRootDirectory", "", str))
        calib_fn = cf.get("CalibrationFile", "", str)
        if calib_fn:
            calib = load_calibration_file(calib_fn)
        else:
            fx = cf.get("fx", 0.0, float)
            K = np.array([[fx, 0, cf.get("cx", 0.0, float)],
                          [0, cf.get("fy", fx, float), cf.get("cy", 0.0, float)],
                          [0, 0, 1]], np.float32)
            calib = StereoCalibration(K=K, baseline=cf.get("baseline", 0.0,
                                                           float))
        return DisparityDataset(
            FileSequence(root, cf.get("LeftImageFormat", "left/%06d.png", str),
                         cf.get("FirstFrameNumber", 0, int)),
            FileSequence(root, cf.get("DisparityMapFormat", "disp/%06d.pfm",
                                      str),
                         cf.get("FirstFrameNumber", 0, int)),
            calib, disparity_scale=cf.get("DisparityScale", 1.0 / 16.0, float))
    raise ValueError(f"unknown dataset {name!r}")
