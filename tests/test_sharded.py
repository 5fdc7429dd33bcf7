"""Distributed (8-virtual-device mesh) IRLS tests: the sharded GN must agree
with the single-device solver."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bpvo_tpu.config import AlgorithmParameters
from bpvo_tpu.core import se3
from bpvo_tpu.parallel import sharded
from bpvo_tpu.solver import gauss_newton as gn
from bpvo_tpu.types import LossFunctionType
from bpvo_tpu.vo import template_data as td_mod
from test_gn import build_template, render_pair


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return sharded.make_mesh(8)


def test_mesh_has_8_devices(mesh):
    assert mesh.devices.size == 8


def test_sharded_matches_single_device(mesh):
    twist = [0.001, -0.002, 0.001, 0.01, -0.005, 0.015]
    I0, I1, D, cam, T_true = render_pair(twist)
    tdata, p = build_template(I0, D, cam, capacity=2048)
    opts = gn.GNOptions(loss=LossFunctionType.HUBER,
                        function_tolerance=1e-4, parameter_tolerance=1e-6)

    st_single = gn.run(tdata, jnp.asarray(I1)[None], cam, jnp.eye(4), opts)

    tdata_sh = sharded.shard_template(tdata, mesh)
    run_sh = sharded.make_sharded_gn(mesh, opts)
    st_sh = run_sh(tdata_sh, jnp.asarray(I1)[None], cam, jnp.eye(4))

    # both must recover the true motion
    for st in (st_single, st_sh):
        err = np.asarray(se3.log(jnp.asarray(
            np.asarray(st.T) @ np.linalg.inv(T_true), jnp.float32)))
        assert np.abs(err).max() < 5e-3, err
    # and agree closely with each other (float reduction order differs)
    np.testing.assert_allclose(np.asarray(st_sh.T), np.asarray(st_single.T),
                               atol=5e-4)


def test_sharded_padding_is_masked(mesh):
    """Capacity not divisible by mesh size: padded slots must not change H."""
    twist = [0.0, 0.0, 0.0, 0.01, 0.0, 0.0]
    I0, I1, D, cam, T_true = render_pair(twist)
    tdata, p = build_template(I0, D, cam, capacity=1000)  # 1000 % 8 != 0
    tdata_sh = sharded.shard_template(tdata, mesh)
    assert tdata_sh.capacity == 1000 + (-1000) % 8
    opts = gn.GNOptions(function_tolerance=1e-4, parameter_tolerance=1e-6)
    st = sharded.make_sharded_gn(mesh, opts)(
        tdata_sh, jnp.asarray(I1)[None], cam, jnp.eye(4))
    err = np.asarray(se3.log(jnp.asarray(
        np.asarray(st.T) @ np.linalg.inv(T_true), jnp.float32)))
    assert np.abs(err).max() < 5e-3, err


def test_sharded_weights_stay_sharded(mesh):
    twist = [0.0, 0.0, 0.0, 0.005, 0.0, 0.0]
    I0, I1, D, cam, _ = render_pair(twist)
    tdata, p = build_template(I0, D, cam, capacity=2048)
    tdata_sh = sharded.shard_template(tdata, mesh)
    st = sharded.make_sharded_gn(mesh, gn.GNOptions())(
        tdata_sh, jnp.asarray(I1)[None], cam, jnp.eye(4))
    # the weights output is distributed over the point axis
    w_sharding = st.weights.sharding
    assert sharded.POINT_AXIS in str(w_sharding.spec)


# ---------------------------------------------------------------------------
# full VO step under the mesh (parallel/sharded_vo.py)
# ---------------------------------------------------------------------------

def _vo_params(**kw):
    base = dict(minSaliency=2.0, numPyramidLevels=3, pointCapacity=2048,
                pointCapacityMin=256, functionTolerance=1e-4,
                parameterTolerance=1e-6, maxIterations=50)
    base.update(kw)
    return AlgorithmParameters(**base)


def test_sharded_vo_step_matches_single_device(mesh):
    """The whole per-frame pipeline (descriptors -> coarse-to-fine GN ->
    keyframe cond -> template rebuild) under shard_map must track the
    single-device DeviceVO, including across a keyframe event."""
    from test_gn import H_IMG, W_IMG, make_cam
    from test_odometry import make_sequence
    from bpvo_tpu.parallel import sharded_vo
    from bpvo_tpu.vo.device_vo import DeviceVO

    # translation large enough to force a keyframe mid-sequence
    p = _vo_params(minTranslationMagToKeyFrame=0.04)
    step = [0, 0, 0, 0.0, 0.0, 0.011]
    frames = make_sequence(step, 7)
    cam = make_cam()
    K = np.asarray(cam.K())

    vo = DeviceVO(K, float(cam.baseline), (H_IMG, W_IMG), p)
    single = []
    for I, D in frames:
        out = vo.add_frame(I, D)
        if out is not None:
            single.append(out)
    assert any(bool(o.is_keyframe) for o in single), "no keyframe exercised"

    init_fn, step_fn, _ = sharded_vo.make_sharded_vo(
        mesh, K, float(cam.baseline), (H_IMG, W_IMG), p)
    state = init_fn(jnp.asarray(frames[0][0]), jnp.asarray(frames[0][1]))
    for (I, D), ref in zip(frames[1:], single):
        state, out = step_fn(state, jnp.asarray(I), jnp.asarray(D))
        np.testing.assert_allclose(np.asarray(out.pose),
                                   np.asarray(ref.pose), atol=2e-4)
        assert bool(out.is_keyframe) == bool(ref.is_keyframe)
    # templates stay sharded over the point axis
    spec = state.templates[0].pixels.sharding.spec
    assert sharded.POINT_AXIS in str(spec)


def test_sharded_vo_scan_chunk(mesh):
    """Chunk (lax.scan) mode inside shard_map matches per-step calls."""
    from test_gn import H_IMG, W_IMG, make_cam
    from test_odometry import make_sequence
    from bpvo_tpu.parallel import sharded_vo

    p = _vo_params()
    frames = make_sequence([0, 0, 0, 0.003, 0.001, 0.006], 5)
    cam = make_cam()
    K = np.asarray(cam.K())
    init_fn, step_fn, scan_fn = sharded_vo.make_sharded_vo(
        mesh, K, float(cam.baseline), (H_IMG, W_IMG), p)

    state = init_fn(jnp.asarray(frames[0][0]), jnp.asarray(frames[0][1]))
    poses_step = []
    for I, D in frames[1:]:
        state, out = step_fn(state, jnp.asarray(I), jnp.asarray(D))
        poses_step.append(np.asarray(out.pose))

    state2 = init_fn(jnp.asarray(frames[0][0]), jnp.asarray(frames[0][1]))
    images = jnp.asarray(np.stack([f[0] for f in frames[1:]]))
    disps = jnp.asarray(np.stack([f[1] for f in frames[1:]]))
    state2, outs = scan_fn(state2, images, disps)
    poses_scan = np.asarray(outs.pose)
    for a, b in zip(poses_step, poses_scan):
        np.testing.assert_allclose(a, b, atol=1e-5)
