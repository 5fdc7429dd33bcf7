"""Windowed photometric bundle adjustment: perturbed keyframe poses must be
pulled back to ground truth, single-device and on the 8-device mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bpvo_tpu.config import AlgorithmParameters
from bpvo_tpu.core import se3
from bpvo_tpu.parallel import bundle_adjustment as ba
from bpvo_tpu.parallel import sharded
from bpvo_tpu.vo import template_data as td_mod
from bpvo_tpu.vo import warp as warp_mod
from test_gn import H_IMG, W_IMG, make_cam
from test_odometry import render_at

M = 4
CAPACITY = 1024


def build_window(seed=0):
    """M keyframes along a small trajectory over the plane scene."""
    cam = make_cam()
    step = np.asarray(se3.exp(jnp.asarray(
        [0.001, -0.001, 0.002, 0.01, 0.005, 0.02], jnp.float32)),
        dtype=np.float64)
    p = AlgorithmParameters(minSaliency=2.0)
    poses_gt, templates, channels = [], [], []
    T = np.eye(4)
    for k in range(M):
        I, D = render_at(T)
        ch = jnp.asarray(I)[None]
        td = td_mod.set_data(ch, jnp.asarray(D), cam, p, CAPACITY, 0)
        poses_gt.append(T.astype(np.float32))
        templates.append(td)
        channels.append(ch)
        T = step @ T
    return cam, poses_gt, templates, channels


def perturb(poses_gt, scale=0.004, seed=1):
    r = np.random.default_rng(seed)
    out = [poses_gt[0]]  # gauge frame stays
    for T in poses_gt[1:]:
        tw = (scale * r.standard_normal(6)).astype(np.float32)
        out.append((np.asarray(se3.exp(jnp.asarray(tw))) @ T).astype(np.float32))
    return out


def pose_errors(poses, poses_gt):
    errs = []
    for a, b in zip(poses, poses_gt):
        errs.append(np.abs(np.asarray(se3.log(jnp.asarray(
            a @ np.linalg.inv(b), jnp.float32)))).max())
    return np.asarray(errs)


@pytest.fixture(scope="module")
def window():
    return build_window()


def test_edges():
    assert ba.window_edges(3, 1) == ((0, 1), (1, 0), (1, 2), (2, 1))
    assert len(ba.window_edges(4, 2)) == 10


def test_adjoint_similarity():
    """exp(Ad xi) == G exp(xi) G^{-1} for a similarity G."""
    r = np.random.default_rng(2)
    s = 1.7
    c = r.standard_normal(3).astype(np.float32)
    T = np.asarray(se3.exp(jnp.asarray(
        (0.3 * r.standard_normal(6)).astype(np.float32))))
    G = np.asarray(warp_mod.normalization_matrix(
        jnp.asarray(s, jnp.float32), jnp.asarray(c))) @ T
    A = np.asarray(ba.adjoint_similarity(jnp.asarray(G), jnp.asarray(s)))
    xi = (0.1 * r.standard_normal(6)).astype(np.float32)
    lhs = np.asarray(se3.exp(jnp.asarray(A @ xi)))
    rhs = G @ np.asarray(se3.exp(jnp.asarray(xi))) @ np.linalg.inv(G)
    np.testing.assert_allclose(lhs, rhs, atol=1e-4)


def test_ba_recovers_perturbed_poses(window):
    cam, poses_gt, templates, channels = window
    poses0 = perturb(poses_gt)
    err_before = pose_errors(poses0, poses_gt)
    assert err_before[1:].max() > 2e-3  # perturbation is real

    stacked = ba.stack_templates(templates)
    ch = jnp.stack(channels)
    opts = ba.BAOptions(max_iterations=10)
    poses, cost = jax.jit(lambda t, c, p: ba.ba_solve(t, c, cam, p, opts))(
        stacked, ch, jnp.asarray(np.stack(poses0)))
    err_after = pose_errors(np.asarray(poses), poses_gt)
    assert err_after.max() < err_before[1:].max() * 0.35, (err_before, err_after)
    assert err_after.max() < 2e-3, err_after


def test_ba_gauge_fixed(window):
    cam, poses_gt, templates, channels = window
    poses0 = perturb(poses_gt)
    stacked = ba.stack_templates(templates)
    poses, _ = jax.jit(lambda t, c, p: ba.ba_solve(
        t, c, cam, p, ba.BAOptions(max_iterations=5)))(
        stacked, jnp.stack(channels), jnp.asarray(np.stack(poses0)))
    np.testing.assert_allclose(np.asarray(poses)[0], poses_gt[0], atol=1e-4)


def test_sharded_ba_matches_single(window):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cam, poses_gt, templates, channels = window
    poses0 = jnp.asarray(np.stack(perturb(poses_gt)))
    stacked = ba.stack_templates(templates)
    ch = jnp.stack(channels)
    opts = ba.BAOptions(max_iterations=6)

    single, _ = jax.jit(lambda t, c, p: ba.ba_solve(t, c, cam, p, opts))(
        stacked, ch, poses0)

    mesh = sharded.make_mesh(8)
    runner = ba.make_sharded_ba(mesh, opts, M)
    multi, _ = runner(stacked, ch, cam, poses0)

    np.testing.assert_allclose(np.asarray(multi), np.asarray(single),
                               atol=5e-4)
    err = pose_errors(np.asarray(multi), poses_gt)
    assert err.max() < 2e-3, err


def test_2d_kf_points_mesh_ba_matches_single(window):
    """The keyframe-window axis as a REAL mesh axis: BA on a (kf=2, points=4)
    mesh must match both the 1-D point-sharded runner and single-device
    (VERDICT round-2 item 4; multihost.global_mesh's cross-host layout)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from bpvo_tpu.parallel import multihost
    cam, poses_gt, templates, channels = window
    poses0 = jnp.asarray(np.stack(perturb(poses_gt)))
    stacked = ba.stack_templates(templates)
    ch = jnp.stack(channels)
    opts = ba.BAOptions(max_iterations=6)

    single, cost_single = jax.jit(
        lambda t, c, p: ba.ba_solve(t, c, cam, p, opts))(stacked, ch, poses0)

    mesh2d = multihost.global_mesh(kf_axis_size=2)
    assert mesh2d.shape == {"kf": 2, "points": 4}
    runner2d = ba.make_sharded_ba_2d(mesh2d, opts, M)
    multi2d, cost2d = runner2d(stacked, ch, cam, poses0)

    np.testing.assert_allclose(np.asarray(multi2d), np.asarray(single),
                               atol=5e-4)
    np.testing.assert_allclose(float(cost2d), float(cost_single), rtol=1e-3)
    err = pose_errors(np.asarray(multi2d), poses_gt)
    assert err.max() < 2e-3, err

    # the kf axis must actually carry a collective in the compiled step
    lowered = runner2d.lower(stacked, ch, cam, poses0).as_text()
    assert "kf" in lowered and "all_reduce" in lowered.replace(
        "all-reduce", "all_reduce")


def test_keyframe_window_host_api(window):
    cam, poses_gt, templates, channels = window
    win = ba.KeyframeWindow(max_keyframes=M, cam=cam,
                            opts=ba.BAOptions(max_iterations=6))
    poses0 = perturb(poses_gt)
    for td, ch, pose in zip(templates, channels, poses0):
        win.push(td, ch, pose)
    refined = win.optimize()
    err = pose_errors(refined, poses_gt)
    assert err.max() < 2e-3, err


class TestDepthRefinement:
    def _corrupt_depths(self, templates, scale=0.02, seed=3):
        r = np.random.default_rng(seed)
        out = []
        for td in templates:
            f = (1.0 + scale * r.standard_normal(td.capacity)).astype(np.float32)
            out.append(td._replace(points=td.points * f[:, None]))
        return out

    def test_depth_schur_recovers(self, window):
        cam, poses_gt, templates, channels = window
        bad_templates = self._corrupt_depths(templates)
        poses0 = perturb(poses_gt, scale=0.002)
        stacked = ba.stack_templates(bad_templates)
        ch = jnp.stack(channels)
        opts = ba.BAOptions(max_iterations=8, refine_depth=True)

        poses, refined, cost = jax.jit(
            lambda t, c, p: ba.ba_solve_with_depth(t, c, cam, p, opts))(
            stacked, ch, jnp.asarray(np.stack(poses0)))

        err = pose_errors(np.asarray(poses), poses_gt)
        assert err.max() < 3e-3, err

        # depths should move back toward the ground truth
        gt_Z = np.stack([np.asarray(t.points)[:, 2] for t in templates])
        bad_Z = np.stack([np.asarray(t.points)[:, 2] for t in bad_templates])
        new_Z = np.asarray(refined.points)[..., 2]
        valid = np.stack([np.asarray(t.valid) for t in templates])
        err_before = np.abs(bad_Z - gt_Z)[valid].mean()
        err_after = np.abs(new_Z - gt_Z)[valid].mean()
        assert err_after < err_before * 0.8, (err_before, err_after)

    def test_depth_refinement_doesnt_hurt_clean_data(self, window):
        cam, poses_gt, templates, channels = window
        poses0 = perturb(poses_gt, scale=0.003)
        stacked = ba.stack_templates(templates)
        opts = ba.BAOptions(max_iterations=8, refine_depth=True)
        poses, cost = jax.jit(
            lambda t, c, p: ba.ba_solve(t, c, cam, p, opts))(
            stacked, jnp.stack(channels), jnp.asarray(np.stack(poses0)))
        err = pose_errors(np.asarray(poses), poses_gt)
        # freeing depths with cm-scale inter-keyframe baselines trades a little
        # pose accuracy (gauge-like depth/pose coupling); must stay mm-scale
        assert err.max() < 3.5e-3, err

    def test_sharded_depth_ba_matches_single(self, window):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        cam, poses_gt, templates, channels = window
        bad_templates = self._corrupt_depths(templates)
        poses0 = jnp.asarray(np.stack(perturb(poses_gt, scale=0.002)))
        stacked = ba.stack_templates(bad_templates)
        ch = jnp.stack(channels)
        opts = ba.BAOptions(max_iterations=4, refine_depth=True)

        single, _, _ = jax.jit(
            lambda t, c, p: ba.ba_solve_with_depth(t, c, cam, p, opts))(
            stacked, ch, poses0)

        mesh = sharded.make_mesh(8)
        runner = ba.make_sharded_ba(mesh, opts, M)
        multi, _ = runner(stacked, ch, cam, poses0)
        np.testing.assert_allclose(np.asarray(multi), np.asarray(single),
                                   atol=1e-3)
