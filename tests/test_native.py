"""Tests for the C++ native runtime (decode pipeline + PLY writer)."""
import os

import cv2
import numpy as np
import pytest

from bpvo_tpu.data import native_loader
from bpvo_tpu.vo.point_cloud import read_ply

pytestmark = pytest.mark.skipif(not native_loader.is_available(),
                                reason="native library not built")


@pytest.fixture
def frame_files(tmp_path):
    rows, cols, n = 48, 64, 6
    imgs, dsps = [], []
    r = np.random.default_rng(0)
    for i in range(n):
        img = r.integers(0, 255, (rows, cols), dtype=np.uint8)
        # disparity stored as uint16 with x16 scale (KITTI convention)
        dsp = (r.uniform(1, 60, (rows, cols)) * 16).astype(np.uint16)
        ip = str(tmp_path / f"img_{i:04d}.png")
        dp = str(tmp_path / f"dsp_{i:04d}.png")
        cv2.imwrite(ip, img)
        cv2.imwrite(dp, dsp)
        imgs.append(ip)
        dsps.append(dp)
    return rows, cols, imgs, dsps


def test_loader_in_order(frame_files):
    rows, cols, imgs, dsps = frame_files
    with native_loader.NativeFrameLoader(imgs, dsps, rows, cols,
                                         capacity=3, workers=2) as loader:
        out = list(loader)
    assert [idx for idx, _, _ in out] == list(range(6))
    # content parity with cv2 direct read
    for idx, img, dsp in out:
        want_img = cv2.imread(imgs[idx], cv2.IMREAD_UNCHANGED)
        want_dsp = cv2.imread(dsps[idx], cv2.IMREAD_UNCHANGED).astype(
            np.float32) / 16.0
        np.testing.assert_array_equal(img, want_img)
        np.testing.assert_allclose(dsp, want_dsp, rtol=1e-6)


def test_loader_many_workers(frame_files):
    rows, cols, imgs, dsps = frame_files
    with native_loader.NativeFrameLoader(imgs, dsps, rows, cols,
                                         capacity=2, workers=4) as loader:
        assert len(list(loader)) == 6


def test_ply_writer(tmp_path):
    r = np.random.default_rng(1)
    pts = r.standard_normal((40, 3)).astype(np.float32)
    rgb = r.integers(0, 255, (40, 3)).astype(np.uint8)
    f = str(tmp_path / "native.ply")
    native_loader.write_ply_native(f, pts, rgb)
    back = read_ply(f)
    np.testing.assert_allclose(back.points, pts, atol=1e-6)
    np.testing.assert_array_equal(back.colors[:, :3], rgb)
