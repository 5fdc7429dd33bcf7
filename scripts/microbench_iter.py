"""Decompose one L0 GN iteration into its pieces; true device compute via
in-program repetition. Perf investigation tool."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

import bench as bench_mod
from bpvo_tpu import AlgorithmParameters
from bpvo_tpu.vo.device_vo import DeviceVO, _compute_channels_pyr
from bpvo_tpu.ops import interp as interp_mod
from bpvo_tpu.solver import linear_system, mestimator
from bpvo_tpu.types import InterpolationType, LossFunctionType
from bpvo_tpu.vo import template_data as td_mod
from bpvo_tpu.vo import warp as warp_mod


def loop_time(make_body, x0=0.0, n=100, reps=5, warmup=2):
    f = jax.jit(lambda x: jax.lax.fori_loop(0, n, make_body, x))
    x0 = jnp.asarray(x0, jnp.float32)
    for _ in range(warmup):
        r = f(x0)
    np.asarray(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(x0)
    np.asarray(r)
    return (time.perf_counter() - t0) / reps / n * 1e3


def main():
    K, baseline, frames = bench_mod.synthesize_sequence(3)
    p = AlgorithmParameters(minSaliency=2.0, numPyramidLevels=4,
                            functionTolerance=1e-4, parameterTolerance=1e-6,
                            maxIterations=50)
    vo = DeviceVO(K, baseline, (bench_mod.ROWS, bench_mod.COLS), p)
    img = jax.device_put(jnp.asarray(frames[1][0], jnp.float32))
    dsp = jax.device_put(jnp.asarray(frames[1][1], jnp.float32))
    vo.init(img, dsp)
    td = vo.state.templates[0]
    channels = _compute_channels_pyr(img, p, 4)[0]
    channels = jax.device_put(channels)
    cam = vo._cams[0]
    T0 = jnp.eye(4, dtype=jnp.float32)
    packed = jax.jit(lambda c: interp_mod.pack_taps(
        c, InterpolationType.LINEAR))(channels)
    r0, ok0 = td_mod.compute_residuals(td, channels, cam, T0,
                                       InterpolationType.LINEAR, packed=packed)
    r0, ok0 = jax.device_put(r0), jax.device_put(ok0)
    w0 = jax.device_put(mestimator.compute_weights(
        LossFunctionType.TUKEY, r0, ok0[None], jnp.asarray(5.0)))

    N = td.points.shape[0]
    print(f"K(capacity)={N}  CxK={td.pixels.shape}")

    # a. project
    print(f"project: {loop_time(lambda i, x: warp_mod.project(cam, T0, td.points + x)[2].sum()):.4f} ms")

    # b. full compute_residuals (project + gather + interp + mask)
    def res_body(i, x):
        r, ok = td_mod.compute_residuals(
            td._replace(points=td.points + 0 * x), channels, cam, T0,
            InterpolationType.LINEAR, packed=packed)
        return r.sum()
    print(f"compute_residuals: {loop_time(res_body):.4f} ms")

    # c. scale estimate (histogram)
    print(f"estimate_scale(hist): {loop_time(lambda i, x: mestimator.estimate_scale(r0 + 0 * x, ok0, True)):.4f} ms")

    # d. weights
    def w_body(i, x):
        return mestimator.compute_weights(
            LossFunctionType.TUKEY, r0 + 0 * x, ok0[None], 5.0 + x).sum()
    print(f"weights(tukey): {loop_time(w_body):.4f} ms")

    # e. H/g build
    def build_body(i, x):
        H, g, f = linear_system.build(td.jacobians, r0 + 0 * x, w0)
        return H[0, 0] + g[0] + f
    print(f"build H/g: {loop_time(build_body):.4f} ms")

    # f. solve
    H0, g0, _ = linear_system.build(td.jacobians, r0, w0)
    H0, g0 = jax.device_put(H0), jax.device_put(g0)
    def solve_body(i, x):
        dp, ok = linear_system.solve(H0 + x * jnp.eye(6, dtype=jnp.float32), g0)
        return dp[0]
    print(f"solve 6x6: {loop_time(solve_body):.4f} ms")

    # g. params_to_pose + compose
    s, c = td.norm_scale, td.norm_center
    def pose_body(i, x):
        T = T0 @ warp_mod.params_to_pose(-g0 * (1e-9 + 0 * x), s, c)
        return T[0, 0] + x * 0
    print(f"params_to_pose+compose: {loop_time(pose_body):.4f} ms")


if __name__ == "__main__":
    main()
