"""Degenerate-input robustness: the library must fail soft (finite outputs,
sane statuses), mirroring the reference's solver fallbacks + THROW_ERROR
boundaries (SURVEY.md §5 failure handling)."""
import jax.numpy as jnp
import numpy as np
import pytest

from bpvo_tpu import AlgorithmParameters, VisualOdometry
from bpvo_tpu.solver import gauss_newton as gn
from bpvo_tpu.vo import template_data as td_mod
from bpvo_tpu.vo import warp as warp_mod
from test_gn import H_IMG, W_IMG, make_cam
from test_odometry import make_sequence


def test_textureless_image_no_nan():
    """A flat image selects no points; GN must return the init pose, finite."""
    cam = make_cam()
    p = AlgorithmParameters(minSaliency=2.0)
    I = np.full((H_IMG, W_IMG), 128.0, np.float32)
    D = np.full((H_IMG, W_IMG), 7.0, np.float32)
    td = td_mod.set_data(jnp.asarray(I)[None], jnp.asarray(D), cam, p, 512, 0)
    assert int(td.num_valid) == 0
    st = gn.run(td, jnp.asarray(I)[None], cam, jnp.eye(4), gn.GNOptions())
    assert np.all(np.isfinite(np.asarray(st.T)))


def test_all_invalid_disparity():
    cam = make_cam()
    p = AlgorithmParameters(minSaliency=2.0)
    I, D = make_sequence([0, 0, 0, 0.01, 0, 0], 1)[0]
    D = np.zeros_like(D)  # below minValidDisparity
    td = td_mod.set_data(jnp.asarray(I)[None], jnp.asarray(D), cam, p, 512, 0)
    assert int(td.num_valid) == 0
    st = gn.run(td, jnp.asarray(I)[None], cam, jnp.eye(4), gn.GNOptions())
    assert np.all(np.isfinite(np.asarray(st.T)))


def test_vo_survives_black_frame():
    """A dropout (all-black) frame mid-sequence must not produce NaNs or
    crash; tracking resumes on the following good frame."""
    frames = make_sequence([0, 0, 0, 0.004, 0, 0.008], 5)
    p = AlgorithmParameters(minSaliency=2.0, numPyramidLevels=2,
                            functionTolerance=1e-4, parameterTolerance=1e-6)
    cam = make_cam()
    vo = VisualOdometry(np.asarray(cam.K()), float(cam.baseline),
                        (H_IMG, W_IMG), p)
    for i, (I, D) in enumerate(frames):
        if i == 2:
            I = np.zeros_like(I)
        res = vo.add_frame(I, D)
        assert np.all(np.isfinite(res.pose)), i
    assert np.all(np.isfinite(vo.trajectory.back()))


def test_points_behind_camera_masked():
    """Points that land behind the camera after warping are masked out."""
    cam = make_cam()
    p = AlgorithmParameters(minSaliency=2.0)
    I, D = make_sequence([0, 0, 0, 0.01, 0, 0], 1)[0]
    td = td_mod.set_data(jnp.asarray(I)[None], jnp.asarray(D), cam, p, 1024, 0)
    # extreme pose: 180-degree flip puts everything behind the camera
    T = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
    r, ok = td_mod.compute_residuals(td, jnp.asarray(I)[None], cam,
                                     jnp.asarray(T), p.interp)
    assert not bool(jnp.any(ok))
    assert np.all(np.isfinite(np.asarray(r)))


def test_huge_initialization_recovers_or_fails_finite():
    frames = make_sequence([0, 0, 0, 0.004, 0, 0.008], 2)
    cam = make_cam()
    p = AlgorithmParameters(minSaliency=2.0)
    I0, D0 = frames[0]
    I1, _ = frames[1]
    td = td_mod.set_data(jnp.asarray(I0)[None], jnp.asarray(D0), cam, p,
                         2048, 0)
    from bpvo_tpu.core import se3
    T_bad = np.asarray(se3.exp(jnp.asarray([0.5, 0.5, 0.5, 2, 2, 2],
                                           jnp.float32)))
    st = gn.run(td, jnp.asarray(I1)[None], cam, jnp.asarray(T_bad),
                gn.GNOptions())
    assert np.all(np.isfinite(np.asarray(st.T)))


def test_mismatched_image_size_raises():
    cam = make_cam()
    vo = VisualOdometry(np.asarray(cam.K()), float(cam.baseline),
                        (H_IMG, W_IMG), AlgorithmParameters())
    with pytest.raises(AssertionError):
        vo.add_frame(np.zeros((10, 10), np.float32),
                     np.zeros((10, 10), np.float32))
