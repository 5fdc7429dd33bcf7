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


CAPI_SO = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native", "libbpvo_vo_capi.so")
C_EXAMPLE = os.path.join(os.path.dirname(CAPI_SO), "vo_c_example")


@pytest.mark.skipif(not os.path.exists(CAPI_SO),
                    reason="C API library not built (make -C native capi)")
def test_c_api_drives_vo_in_process():
    """The C-callable VO entry (the MATLAB-mex-analogue binding,
    native/bpvo_vo_capi.cc) loaded via ctypes into this interpreter: the
    embedding short-circuits onto the live interpreter and must recover a
    known translation."""
    import ctypes

    lib = ctypes.CDLL(CAPI_SO)
    lib.bpvo_vo_create.restype = ctypes.c_void_p
    lib.bpvo_vo_create.argtypes = [ctypes.POINTER(ctypes.c_float),
                                   ctypes.c_float, ctypes.c_int, ctypes.c_int,
                                   ctypes.c_char_p]
    lib.bpvo_vo_add_frame.restype = ctypes.c_int
    lib.bpvo_vo_add_frame.argtypes = [ctypes.c_void_p] + \
        [ctypes.POINTER(ctypes.c_float)] * 3 + \
        [ctypes.POINTER(ctypes.c_int)]
    lib.bpvo_vo_trajectory_size.restype = ctypes.c_int
    lib.bpvo_vo_trajectory_size.argtypes = [ctypes.c_void_p]
    lib.bpvo_vo_destroy.argtypes = [ctypes.c_void_p]
    lib.bpvo_vo_last_error.restype = ctypes.c_char_p

    rows, cols = 120, 160
    fx = 0.8 * cols
    K = np.array([fx, 0, cols / 2, 0, fx, rows / 2, 0, 0, 1], np.float32)
    z, tx = 8.0, 0.02
    h = lib.bpvo_vo_create(K.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                           0.12, rows, cols, None)
    assert h, lib.bpvo_vo_last_error()
    yy, xx = np.mgrid[0:rows, 0:cols].astype(np.float64)
    pose = np.zeros(16, np.float32)
    kf = ctypes.c_int(0)
    try:
        for f in range(3):
            shift = fx * (f * tx) / z
            img = (128 + 60 * np.sin((xx + shift) / 7.0) * np.cos(yy / 9.0)
                   + 40 * np.sin((xx + shift + 2 * yy) / 13.0)
                   ).astype(np.float32)
            dsp = np.full((rows, cols), fx * 0.12 / z, np.float32)
            rc = lib.bpvo_vo_add_frame(
                h, img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                dsp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                pose.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                ctypes.byref(kf))
            assert rc == 0, lib.bpvo_vo_last_error()
            if f > 0:
                assert abs(pose[3] + tx) < 5e-3, pose.reshape(4, 4)
        assert lib.bpvo_vo_trajectory_size(h) == 3
    finally:
        lib.bpvo_vo_destroy(h)


@pytest.mark.skipif(not os.path.exists(C_EXAMPLE),
                    reason="C example not built (make -C native vo_c_example)")
def test_c_example_standalone_embedding():
    """The pure-C host (native/vo_c_example.c) embedding its OWN interpreter
    must track the synthetic motion end-to-end."""
    import site
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = (site.getsitepackages()[0] + os.pathsep
                         + os.path.dirname(os.path.dirname(CAPI_SO)))
    out = subprocess.run([C_EXAMPLE], capture_output=True, text=True,
                         env=env, timeout=300)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "C-API example: OK" in out.stdout
