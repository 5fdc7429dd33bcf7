"""Gauss-Newton synthetic-warp recovery: a known SE(3) perturbation of a textured
fronto-parallel plane must be recovered by the optimizer (the reference has no
such test — its correctness evidence was end-to-end trajectories only)."""
import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bpvo_tpu.config import AlgorithmParameters
from bpvo_tpu.core import se3
from bpvo_tpu.ops import imgproc
from bpvo_tpu.solver import gauss_newton as gn
from bpvo_tpu.solver import linear_system, mestimator
from bpvo_tpu.types import InterpolationType, LossFunctionType
from bpvo_tpu.vo import template_data as td_mod
from bpvo_tpu.vo import warp
from conftest import synthetic_image

H_IMG, W_IMG = 120, 160
Z0 = 5.0


def make_cam():
    K = np.array([[300.0, 0, W_IMG / 2], [0, 300.0, H_IMG / 2], [0, 0, 1]],
                 np.float32)
    return warp.CameraModel.from_K(K, 0.12)


# slanted scene plane n^T X = d breaks the translation/rotation ambiguity a
# fronto-parallel plane would have under a narrow field of view
PLANE_N = np.array([0.15, 0.25, 1.0]) / np.linalg.norm([0.15, 0.25, 1.0])
PLANE_D = Z0 * PLANE_N[2]  # depth ~Z0 at the optical axis


def plane_homography(K, T, n, d):
    """Image-0 -> image-1 homography for the plane n^T X = d under X1 = T X0:
    H = K (R + t n^T / d) K^{-1}."""
    R = T[:3, :3]
    t = T[:3, 3]
    Hm = R + np.outer(t, n) / d
    return K @ Hm @ np.linalg.inv(K)


def _texture(x, y):
    """Analytic scene texture evaluated at image-0 pixel coordinates."""
    return (128 + 60 * np.sin(x / 7.0) * np.cos(y / 9.0)
            + 40 * np.sin((x + 2 * y) / 13.0))


def render_pair(twist):
    """I0 and I1 where I1 is I0 seen after camera perturbation exp(twist).

    Both frames are rendered *analytically* from the texture function (I1 via the
    inverse plane homography in float64), so the photometric minimum sits exactly
    at the ground-truth pose — no resampling bias in the oracle.
    """
    cam = make_cam()
    K = np.asarray(cam.K()).astype(np.float64)
    uu, vv = np.meshgrid(np.arange(W_IMG, dtype=np.float64),
                         np.arange(H_IMG, dtype=np.float64))
    I0 = _texture(uu, vv).astype(np.float32)

    T = np.asarray(se3.exp(jnp.asarray(twist, jnp.float32))).astype(np.float64)
    Hm = plane_homography(K, T, PLANE_N, PLANE_D)
    Hinv = np.linalg.inv(Hm)
    w = Hinv[2, 0] * uu + Hinv[2, 1] * vv + Hinv[2, 2]
    x0 = (Hinv[0, 0] * uu + Hinv[0, 1] * vv + Hinv[0, 2]) / w
    y0 = (Hinv[1, 0] * uu + Hinv[1, 1] * vv + Hinv[1, 2]) / w
    I1 = _texture(x0, y0).astype(np.float32)

    # per-pixel depth of the slanted plane: Z = d / (n^T K^{-1} p)
    rays = np.stack([(uu - K[0, 2]) / K[0, 0], (vv - K[1, 2]) / K[1, 1],
                     np.ones_like(uu, np.float64)], -1)
    Z = PLANE_D / (rays @ PLANE_N)
    D = (float(cam.fx) * float(cam.baseline) / Z).astype(np.float32)
    return I0, I1, D, cam, T.astype(np.float32)


def build_template(I0, D, cam, p=None, capacity=2048):
    p = p or AlgorithmParameters(minSaliency=2.0)
    ch = jnp.asarray(I0)[None]
    return td_mod.set_data(ch, jnp.asarray(D), cam, p, capacity, 0), p


@pytest.mark.parametrize("twist", [
    [0.0, 0.0, 0.0, 0.02, 0.0, 0.0],        # small x translation
    [0.0, 0.0, 0.0, 0.0, 0.015, 0.03],      # y + z translation
    [0.0, 0.0, 0.004, 0.0, 0.0, 0.0],       # small roll
    [0.002, -0.003, 0.002, 0.01, -0.01, 0.02],  # general motion
])
def test_recover_synthetic_motion(twist):
    I0, I1, D, cam, T_true = render_pair(twist)
    tdata, p = build_template(I0, D, cam)
    assert int(tdata.num_valid) > 200

    # tolerances as the reference ships them in conf/*.cfg
    opts = gn.GNOptions(loss=LossFunctionType.HUBER,
                        function_tolerance=1e-4, parameter_tolerance=1e-6)
    st = gn.run(tdata, jnp.asarray(I1)[None], cam, jnp.eye(4), opts)

    assert bool(st.solver_ok)
    assert int(st.num_iters) < 50, "should converge well before max iterations"
    T_est = np.asarray(st.T)
    err_twist = np.asarray(se3.log(jnp.asarray(
        T_est @ np.linalg.inv(T_true), jnp.float32)))
    # rotation error < ~0.03 deg, translation error < 3 mm (floor set by the
    # bilinear warpPerspective rendering of the target frame)
    assert np.abs(err_twist[:3]).max() < 5e-4, (err_twist, int(st.num_iters))
    assert np.abs(err_twist[3:]).max() < 3e-3, (err_twist, int(st.num_iters))


def test_identity_converges_immediately():
    I0, _, D, cam, _ = render_pair([0, 0, 0, 0, 0, 0])
    tdata, p = build_template(I0, D, cam)
    st = gn.run(tdata, jnp.asarray(I0)[None], cam, jnp.eye(4), gn.GNOptions())
    # zero residuals -> immediate convergence in a couple of iterations
    assert int(st.num_iters) <= 3
    np.testing.assert_allclose(np.asarray(st.T), np.eye(4), atol=1e-4)


def test_convergence_with_tukey_and_outliers():
    twist = [0.0, 0.0, 0.0, 0.015, 0.0, 0.01]
    I0, I1, D, cam, T_true = render_pair(twist)
    # corrupt a block of I1 (synthetic occlusion)
    I1 = I1.copy()
    I1[40:70, 50:90] = 255.0
    tdata, p = build_template(I0, D, cam)
    st = gn.run(tdata, jnp.asarray(I1)[None], cam, jnp.eye(4),
                gn.GNOptions(loss=LossFunctionType.TUKEY))
    T_est = np.asarray(st.T)
    err = np.asarray(se3.log(jnp.asarray(T_est @ np.linalg.inv(T_true),
                                         jnp.float32)))
    assert np.abs(err[3:]).max() < 5e-3, err


def test_weights_and_fraction():
    I0, I1, D, cam, _ = render_pair([0, 0, 0, 0.01, 0, 0])
    tdata, p = build_template(I0, D, cam)
    st = gn.run(tdata, jnp.asarray(I1)[None], cam, jnp.eye(4), gn.GNOptions())
    frac = gn.fraction_of_good_points(
        st.weights, tdata.num_channels, tdata.num_valid, 0.85)
    assert 0.5 < float(frac) <= 1.0


def test_jit_and_gradients_consistent():
    """Jitted run must equal eager run (control-flow correctness)."""
    twist = [0.0, 0.0, 0.002, 0.01, 0.0, 0.0]
    I0, I1, D, cam, T_true = render_pair(twist)
    tdata, p = build_template(I0, D, cam)
    opts = gn.GNOptions()
    run_jit = jax.jit(gn.run, static_argnames=("opts",))
    st1 = gn.run(tdata, jnp.asarray(I1)[None], cam, jnp.eye(4), opts)
    st2 = run_jit(tdata, jnp.asarray(I1)[None], cam, jnp.eye(4), opts)
    st3 = run_jit(tdata, jnp.asarray(I1)[None], cam, jnp.eye(4), opts)
    # jit is deterministic call-to-call
    np.testing.assert_array_equal(np.asarray(st2.T), np.asarray(st3.T))
    assert int(st2.num_iters) == int(st3.num_iters)
    # eager and fused execution round differently in f32; poses must still agree
    np.testing.assert_allclose(np.asarray(st1.T), np.asarray(st2.T), atol=1e-4)


class TestMEstimator:
    def test_huber_weights(self):
        u = jnp.asarray(np.array([0.0, 1.0, 1.345, 2.69], np.float32))
        w = np.asarray(mestimator.huber_weight(u))
        np.testing.assert_allclose(w, [1.0, 1.0, 1.0, 0.5], rtol=1e-4)

    def test_tukey_weights(self):
        w = np.asarray(mestimator.tukey_weight(
            jnp.asarray(np.array([0.0, 4.685, 10.0], np.float32))))
        np.testing.assert_allclose(w, [1.0, 0.0, 0.0], atol=1e-6)

    def test_masked_median_exact(self):
        r = np.random.default_rng(0)
        x = r.uniform(0, 100, 1001).astype(np.float32)
        valid = r.uniform(size=1001) < 0.7
        got = float(mestimator.masked_median_sort(jnp.asarray(x), jnp.asarray(valid)))
        want = np.median(x[valid])
        assert abs(got - want) < 0.2  # lower-median vs interpolated

    def test_histogram_median_close_to_exact(self):
        r = np.random.default_rng(1)
        x = np.abs(r.standard_normal(4096) * 20).astype(np.float32)
        valid = np.ones(4096, bool)
        exact = float(np.median(x))
        approx = float(mestimator.masked_median_histogram(
            jnp.asarray(x), jnp.asarray(valid)))
        assert abs(approx - exact) < 0.1

    def test_scale_estimator_on_gaussian(self):
        """sigma estimate should approach the true std (reference test_sigma.cc)."""
        r = np.random.default_rng(2)
        true_sigma = 7.5
        res = (true_sigma * r.standard_normal(8192)).astype(np.float32)
        valid = np.ones(8192, bool)
        # median(|r|) = 0.6745 sigma -> 1.4826 * median = sigma
        est = float(mestimator.estimate_scale(jnp.asarray(res), jnp.asarray(valid)))
        assert abs(est - true_sigma) / true_sigma < 0.05

    def test_degenerate_scale_is_one(self):
        res = jnp.zeros(128)
        valid = jnp.ones(128, bool)
        assert float(mestimator.estimate_scale(res, valid)) == 1.0


class TestLinearSystem:
    def test_build_matches_naive(self):
        r_ = np.random.default_rng(3)
        J = r_.standard_normal((2, 64, 6)).astype(np.float32)
        r = r_.standard_normal((2, 64)).astype(np.float32)
        w = r_.uniform(0, 1, (2, 64)).astype(np.float32)
        H, g, f_sq = linear_system.build(jnp.asarray(J), jnp.asarray(r), jnp.asarray(w))
        Jf = J.reshape(-1, 6)
        rf = r.reshape(-1)
        wf = w.reshape(-1)
        np.testing.assert_allclose(np.asarray(H), (Jf * wf[:, None]).T @ Jf, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(g), (Jf * wf[:, None]).T @ rf, rtol=1e-4)
        np.testing.assert_allclose(float(f_sq), (wf * rf * rf).sum(), rtol=1e-4)

    def test_solve_wellposed(self):
        r_ = np.random.default_rng(4)
        A = r_.standard_normal((6, 6)).astype(np.float32)
        H = A @ A.T + 6 * np.eye(6, dtype=np.float32)
        x_true = r_.standard_normal(6).astype(np.float32)
        g = H @ x_true
        dp, ok = linear_system.solve(jnp.asarray(H), jnp.asarray(g))
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(dp), x_true, rtol=1e-3, atol=1e-4)

    def test_solve_singular_falls_back(self):
        H = jnp.zeros((6, 6))
        g = jnp.ones(6)
        dp, ok = linear_system.solve(H, g)
        assert np.all(np.isfinite(np.asarray(dp)))


def test_recover_synthetic_motion_disparity_space_warp():
    """GN with warpType=DisparitySpace recovers the same motion as rigid-body
    (reference WITH_DISPARITY_SPACE_WARP build, disparity_space_warp.h)."""
    twist = [0.002, -0.003, 0.002, 0.01, -0.01, 0.02]
    I0, I1, D, cam, T_true = render_pair(twist)
    p = AlgorithmParameters(minSaliency=2.0, warpType="DisparitySpace")
    tdata, p = build_template(I0, D, cam, p=p)
    assert int(tdata.num_valid) > 200
    # DSW uses no normalization: identity s, c
    assert float(tdata.norm_scale) == 1.0

    opts = gn.GNOptions(loss=LossFunctionType.HUBER,
                        function_tolerance=1e-4, parameter_tolerance=1e-6,
                        warp="DisparitySpace")
    st = gn.run(tdata, jnp.asarray(I1)[None], cam, jnp.eye(4), opts)

    assert bool(st.solver_ok)
    T_est = np.asarray(st.T)
    err_twist = np.asarray(se3.log(jnp.asarray(
        T_est @ np.linalg.inv(T_true), jnp.float32)))
    assert np.abs(err_twist[:3]).max() < 5e-4, (err_twist, int(st.num_iters))
    assert np.abs(err_twist[3:]).max() < 3e-3, (err_twist, int(st.num_iters))


def test_disparity_space_warp_end_to_end_vo():
    """warpType=DisparitySpace through the full VisualOdometry pipeline."""
    from bpvo_tpu.data.synthetic import SyntheticPlaneDataset
    from bpvo_tpu.vo.odometry import VisualOdometry
    ds = SyntheticPlaneDataset(rows=120, cols=160, n_frames=5)
    p = AlgorithmParameters(minSaliency=2.0, numPyramidLevels=3,
                            functionTolerance=1e-4,
                            warpType="DisparitySpace")
    vo = VisualOdometry(ds.calibration.K, ds.calibration.baseline,
                        ds.image_size, p)
    for i in range(5):
        f = ds.get_frame(i)
        r = vo.add_frame(f.image, f.disparity)
    gt = ds.gt_world_pose(4)
    est = vo.trajectory.back()
    err = np.linalg.norm(np.asarray(est)[:3, 3] - gt[:3, 3])
    assert err < 0.005, err
