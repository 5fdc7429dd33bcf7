"""Pallas kernels vs pure-jnp reference implementations (interpret mode on CPU,
compiled on TPU) — the cross-implementation testing style the reference used
for scalar-vs-SIMD (test_local_max.cc)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bpvo_tpu.ops import census as census_ops
from bpvo_tpu.ops.pallas import census_kernel, irls_kernel, sgm_kernel
from conftest import synthetic_image

INTERPRET = jax.default_backend() == "cpu"


class TestCensusKernel:
    def test_matches_reference_impl(self):
        I = jnp.asarray(synthetic_image(32, 256))
        want = np.asarray(census_ops.census_planes(I))
        got = np.asarray(census_kernel.census_planes_pallas(
            I, interpret=INTERPRET))
        np.testing.assert_array_equal(got, want)


class TestSgmKernel:
    def _naive_direction(self, cost, p1, p2):
        H, W, D = cost.shape
        out = np.zeros_like(cost)
        out[:, 0] = cost[:, 0]
        for x in range(1, W):
            prev = out[:, x - 1]
            m = prev.min(-1, keepdims=True)
            up = np.concatenate([prev[:, :1] + p1, prev[:, :-1] + p1], -1)
            dn = np.concatenate([prev[:, 1:] + p1, prev[:, -1:] + p1], -1)
            best = np.minimum(np.minimum(prev, up), np.minimum(dn, m + p2))
            out[:, x] = cost[:, x] + best - m
        return out

    def test_direction_matches_naive(self):
        r = np.random.default_rng(0)
        cost = r.uniform(0, 8, (16, 20, 128)).astype(np.float32)
        want = self._naive_direction(cost, 1.0, 8.0)
        got = np.asarray(sgm_kernel.aggregate_direction(
            jnp.asarray(cost), 1.0, 8.0, interpret=INTERPRET))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_4dir_symmetry(self):
        r = np.random.default_rng(1)
        cost = r.uniform(0, 8, (16, 16, 128)).astype(np.float32)
        agg = np.asarray(sgm_kernel.aggregate_4dir(
            jnp.asarray(cost), 1.0, 8.0, interpret=INTERPRET))
        # symmetric input -> symmetric aggregation
        cost_t = np.swapaxes(cost, 0, 1)
        agg_t = np.asarray(sgm_kernel.aggregate_4dir(
            jnp.asarray(cost_t), 1.0, 8.0, interpret=INTERPRET))
        np.testing.assert_allclose(agg, np.swapaxes(agg_t, 0, 1), atol=1e-4)


class TestIrlsKernel:
    @pytest.mark.parametrize("loss", ["Tukey", "Huber", "L2"])
    def test_matches_jnp_reference(self, loss):
        from bpvo_tpu.solver import linear_system, mestimator
        from bpvo_tpu.types import LossFunctionType
        r_ = np.random.default_rng(2)
        M = 3000  # not a multiple of the block size: exercises padding
        J = r_.standard_normal((M, 6)).astype(np.float32)
        r = (5.0 * r_.standard_normal(M)).astype(np.float32)
        valid = r_.uniform(size=M) < 0.8
        sigma = jnp.asarray(2.5, jnp.float32)

        H, g, f_sq = irls_kernel.irls_reduce(
            jnp.asarray(J.T), jnp.asarray(r), jnp.asarray(valid), sigma,
            loss=loss, interpret=INTERPRET)

        lt = {"Tukey": LossFunctionType.TUKEY, "Huber": LossFunctionType.HUBER,
              "L2": LossFunctionType.L2}[loss]
        w = mestimator.compute_weights(lt, jnp.asarray(r), jnp.asarray(valid),
                                       sigma)
        H2, g2, f2 = linear_system.build(jnp.asarray(J)[None],
                                         jnp.asarray(r)[None], w[None])
        np.testing.assert_allclose(np.asarray(H), np.asarray(H2), rtol=2e-4,
                                   atol=1e-2)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g2), rtol=2e-4,
                                   atol=1e-2)
        np.testing.assert_allclose(float(f_sq), float(f2), rtol=1e-4)
