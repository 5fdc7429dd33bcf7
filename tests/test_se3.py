import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bpvo_tpu.core import se3


def random_twists(n, scale=1.0, seed=0):
    r = np.random.default_rng(seed)
    return (scale * r.standard_normal((n, 6))).astype(np.float32)


def test_exp_identity():
    T = se3.exp(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-6)


def test_exp_log_roundtrip():
    p = random_twists(64, scale=0.5)
    T = se3.exp(p)
    p2 = se3.log(T)
    np.testing.assert_allclose(np.asarray(p2), p, atol=1e-4)


def test_exp_log_roundtrip_tiny():
    p = random_twists(16, scale=1e-5, seed=1)
    p2 = se3.log(se3.exp(p))
    np.testing.assert_allclose(np.asarray(p2), p, atol=1e-7)


def test_exp_is_rigid():
    p = random_twists(8, scale=1.0, seed=2)
    T = np.asarray(se3.exp(p))
    R = T[:, :3, :3]
    eye = np.broadcast_to(np.eye(3), R.shape)
    np.testing.assert_allclose(R @ np.swapaxes(R, 1, 2), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(8), atol=1e-5)
    np.testing.assert_allclose(T[:, 3], np.tile([0, 0, 0, 1], (8, 1)), atol=0)


def test_inverse():
    p = random_twists(8, scale=0.8, seed=3)
    T = se3.exp(p)
    Ti = se3.inverse(T)
    prod = np.asarray(T @ Ti)
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), prod.shape), atol=1e-5)


def test_exp_matches_expm():
    from scipy.linalg import expm
    p = random_twists(8, scale=0.7, seed=4).astype(np.float64)
    for pi in p:
        xi = np.zeros((4, 4))
        xi[:3, :3] = np.asarray(se3.hat(jnp.asarray(pi[:3])))
        xi[:3, 3] = pi[3:]
        np.testing.assert_allclose(
            np.asarray(se3.exp(jnp.asarray(pi))), expm(xi), atol=1e-5)


def test_hat_cross():
    r = np.random.default_rng(5)
    w = r.standard_normal(3).astype(np.float32)
    x = r.standard_normal(3).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(se3.hat(jnp.asarray(w)) @ x), np.cross(w, x), atol=1e-6)


def test_jit_compatible():
    f = jax.jit(lambda p: se3.log(se3.exp(p)))
    p = jnp.asarray(random_twists(4, 0.3))
    np.testing.assert_allclose(np.asarray(f(p)), np.asarray(p), atol=1e-4)
