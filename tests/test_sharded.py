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
