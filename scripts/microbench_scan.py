"""Why is lax.scan chunk mode slow? Isolate scan body costs on the device.
Perf investigation tool."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

import bench as bench_mod
from bpvo_tpu import AlgorithmParameters
from bpvo_tpu.vo.device_vo import (DeviceVO, _compute_channels_pyr,
                                   _estimate)


def timeit(fn, fetch, reps=10, warmup=2):
    for _ in range(warmup):
        r = fn()
    fetch(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    fetch(r)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    N = 8
    K, baseline, frames = bench_mod.synthesize_sequence(N + 1)
    p = AlgorithmParameters(minSaliency=2.0, numPyramidLevels=4,
                            functionTolerance=1e-4, parameterTolerance=1e-6,
                            maxIterations=50)
    vo = DeviceVO(K, baseline, (bench_mod.ROWS, bench_mod.COLS), p)
    images = jax.device_put(jnp.asarray(
        np.stack([f[0] for f in frames]), jnp.float32))
    disps = jax.device_put(jnp.asarray(
        np.stack([f[1] for f in frames]), jnp.float32))
    vo.init(images[0], disps[0])
    state0 = vo.state

    # full step scan (no donation, so state can be reused across reps)
    scan_full = jax.jit(lambda s, im, d: jax.lax.scan(
        lambda c, xs: vo._step(c, xs[0], xs[1]), s, (im, d)))
    ms = timeit(lambda: scan_full(state0, images[1:], disps[1:]),
                lambda r: np.asarray(r[1].pose_world))
    print(f"scan full step: {ms / N:.2f} ms/frame")

    # scan over pyramid only
    scan_pyr = jax.jit(lambda im: jax.lax.scan(
        lambda c, x: (c, _compute_channels_pyr(x, p, 4)[3].sum()),
        0.0, im))
    ms = timeit(lambda: scan_pyr(images[1:]), lambda r: np.asarray(r[1]))
    print(f"scan pyramid only: {ms / N:.2f} ms/frame")

    # scan over pyramid + estimate (no keyframe branch, fixed templates)
    tmpl = state0.templates

    def body_est(c, xs):
        ch = _compute_channels_pyr(xs[0], p, 4)
        T, iters, fs, frac, H = _estimate(
            tmpl, ch, vo._cams, c, vo._opts, p.maxTestLevel,
            p.goodPointThreshold, p.minNumPixelsToWork)
        return T, (iters, frac)
    scan_est = jax.jit(lambda im, d: jax.lax.scan(
        body_est, jnp.eye(4, dtype=jnp.float32), (im, d)))
    ms = timeit(lambda: scan_est(images[1:], disps[1:]),
                lambda r: np.asarray(r[0]))
    it = scan_est(images[1:], disps[1:])[1][0]
    print(f"scan pyr+estimate: {ms / N:.2f} ms/frame  iters/frame="
          f"{np.asarray(it).sum(1)}")


if __name__ == "__main__":
    main()
