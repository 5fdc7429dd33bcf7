import jax
import jax.numpy as jnp
import numpy as np

from bpvo_tpu.vo import warp


def make_cam():
    K = np.array([[500.0, 0, 80], [0, 500.0, 60], [0, 0, 1]], np.float32)
    return warp.CameraModel.from_K(K, 0.12)


def test_make_points_roundtrip():
    cam = make_cam()
    x = jnp.asarray(np.array([10.0, 50.0, 100.0], np.float32))
    y = jnp.asarray(np.array([20.0, 60.0, 90.0], np.float32))
    d = jnp.asarray(np.array([5.0, 10.0, 20.0], np.float32))
    pts = warp.make_points(cam, x, y, d)
    # Z = fx b / d
    np.testing.assert_allclose(np.asarray(pts[:, 2]), 500.0 * 0.12 / np.asarray(d),
                               rtol=1e-6)
    # project back at identity recovers pixels
    u, v, Z = warp.project(cam, jnp.eye(4), pts)
    np.testing.assert_allclose(np.asarray(u), np.asarray(x), atol=1e-3)
    np.testing.assert_allclose(np.asarray(v), np.asarray(y), atol=1e-3)


def test_level_scaling():
    cam = make_cam()
    cam1 = cam.at_level(1)
    # same pixel at level 1 maps to the same 3D point (disparity stays full-res)
    pts0 = warp.make_points(cam, jnp.asarray([100.0]), jnp.asarray([60.0]),
                            jnp.asarray([10.0]))
    pts1 = warp.make_points(cam1, jnp.asarray([50.0]), jnp.asarray([30.0]),
                            jnp.asarray([10.0]))
    np.testing.assert_allclose(np.asarray(pts0), np.asarray(pts1), rtol=1e-5)


def test_params_to_pose_identity():
    T = warp.params_to_pose(jnp.zeros(6), jnp.asarray(2.0), jnp.asarray([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-6)


def test_params_to_pose_conjugation():
    # for s=1, c=0 it is plain se3.exp
    from bpvo_tpu.core import se3
    p = jnp.asarray(np.array([0.01, -0.02, 0.03, 0.1, 0.2, -0.1], np.float32))
    T = warp.params_to_pose(p, *warp.identity_normalization())
    np.testing.assert_allclose(np.asarray(T), np.asarray(se3.exp(p)), atol=1e-6)


def test_hartley_normalization():
    r = np.random.default_rng(0)
    pts = jnp.asarray((r.standard_normal((100, 3)) * 3 + [1, 2, 10]).astype(np.float32))
    valid = jnp.ones(100, bool)
    s, c = warp.hartley_normalization(pts, valid)
    Xn = float(s) * (np.asarray(pts) - np.asarray(c))
    np.testing.assert_allclose(Xn.mean(0), np.zeros(3), atol=1e-4)
    np.testing.assert_allclose(np.linalg.norm(Xn, axis=1).mean(), np.sqrt(3.0),
                               rtol=1e-4)


def test_hartley_normalization_masked():
    pts = np.zeros((10, 3), np.float32)
    pts[:5] = np.arange(15).reshape(5, 3)
    valid = np.arange(10) < 5
    s, c = warp.hartley_normalization(jnp.asarray(pts), jnp.asarray(valid))
    # padding zeros must not influence the center
    np.testing.assert_allclose(np.asarray(c), pts[:5].mean(0), rtol=1e-5)


def test_jacobian_vs_autodiff():
    """The analytic Jacobian must equal d/dp [gx*u(p) + gy*v(p)] at p=0,
    where the pose acts as Tn^{-1} exp(p) Tn (Hartley-normalized)."""
    cam = make_cam()
    r = np.random.default_rng(1)
    pts = jnp.asarray(
        np.stack([r.uniform(-2, 2, 16), r.uniform(-2, 2, 16),
                  r.uniform(3, 12, 16)], -1).astype(np.float32))
    gx = jnp.asarray(r.standard_normal(16).astype(np.float32))
    gy = jnp.asarray(r.standard_normal(16).astype(np.float32))
    s = jnp.asarray(1.7, jnp.float32)
    c = jnp.asarray([0.3, -0.5, 7.0], jnp.float32)

    J = warp.jacobian(cam, pts, gx, gy, s, c)  # (16, 6)

    def warped_intensity_lin(p):
        T = warp.params_to_pose(p, s, c)
        u, v, _ = warp.project(cam, T, pts)
        return gx * u + gy * v

    J_auto = jax.jacobian(warped_intensity_lin)(jnp.zeros(6, jnp.float32))
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_auto), rtol=2e-2,
                               atol=2e-2)


def test_disparity_space_warp_consistency():
    cam = make_cam()
    r = np.random.default_rng(2)
    xyd = jnp.asarray(np.stack([
        r.uniform(10, 150, 8), r.uniform(10, 110, 8), r.uniform(2, 30, 8),
    ], -1).astype(np.float32))
    from bpvo_tpu.core import se3
    T = se3.exp(jnp.asarray([0.01, 0.02, -0.01, 0.05, 0.0, 0.1], jnp.float32))
    out = warp.disparity_space_warp_points(cam, T, xyd)
    # round trip: warp by T then T^{-1} returns the original (x, y, d)
    back = warp.disparity_space_warp_points(cam, se3.inverse(T), out)
    np.testing.assert_allclose(np.asarray(back), np.asarray(xyd), rtol=1e-3,
                               atol=1e-2)


def test_disparity_space_project_matches_rigid():
    """G T G^{-1} on (x-cx, y-cy, d, 1) must land on the same image point as
    back-project -> T -> project (they parameterize the same warp)."""
    cam = make_cam()
    r = np.random.default_rng(3)
    x = r.uniform(10, 150, 12).astype(np.float32)
    y = r.uniform(10, 110, 12).astype(np.float32)
    d = r.uniform(2, 30, 12).astype(np.float32)
    from bpvo_tpu.core import se3
    T = se3.exp(jnp.asarray([0.02, -0.01, 0.03, 0.1, -0.05, 0.2], jnp.float32))

    pts3d = warp.make_points(cam, jnp.asarray(x), jnp.asarray(y), jnp.asarray(d))
    u_r, v_r, Z = warp.project(cam, T, pts3d)

    pts_ds = warp.disparity_space_make_points(
        cam, jnp.asarray(x), jnp.asarray(y), jnp.asarray(d))
    u_d, v_d, w = warp.disparity_space_project(cam, T, pts_ds)

    np.testing.assert_allclose(np.asarray(u_d), np.asarray(u_r), rtol=1e-4,
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(v_d), np.asarray(v_r), rtol=1e-4,
                               atol=5e-3)
    assert np.all((np.asarray(w) > 0) == (np.asarray(Z) > 0))


def test_disparity_space_jacobian_vs_autodiff():
    """Analytic DSW Jacobian == d/dp [gx*u(p) + gy*v(p)] at p=0 with
    u, v from disparity_space_project and plain exp updates (no
    normalization, reference disparity_space_warp.h:79-89)."""
    cam = make_cam()
    r = np.random.default_rng(4)
    x = r.uniform(10, 150, 16).astype(np.float32)
    y = r.uniform(10, 110, 16).astype(np.float32)
    d = r.uniform(2, 30, 16).astype(np.float32)
    pts = warp.disparity_space_make_points(
        cam, jnp.asarray(x), jnp.asarray(y), jnp.asarray(d))
    gx = jnp.asarray(r.standard_normal(16).astype(np.float32))
    gy = jnp.asarray(r.standard_normal(16).astype(np.float32))

    J = warp.disparity_space_jacobian(cam, pts, gx, gy)

    from bpvo_tpu.core import se3

    def warped_intensity_lin(p):
        u, v, _ = warp.disparity_space_project(cam, se3.exp(p), pts)
        return gx * u + gy * v

    J_auto = jax.jacobian(warped_intensity_lin)(jnp.zeros(6, jnp.float32))
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_auto), rtol=2e-2,
                               atol=2e-2)
