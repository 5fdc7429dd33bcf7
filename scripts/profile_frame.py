"""Per-stage timing of the device VO step on the live device.

Breaks a frame into its XLA pieces and times each with forced fetches
(block_until_ready is unreliable on the axon backend).  Not a test — a
perf investigation tool (cf. reference test/test_timing.cc).
"""
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
                                   _build_templates, _estimate)
from bpvo_tpu.solver import gauss_newton as gn


def timeit(fn, fetch, reps=20, warmup=3):
    for _ in range(warmup):
        fetch(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    fetch(r)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    K, baseline, frames = bench_mod.synthesize_sequence(8)
    p = AlgorithmParameters(minSaliency=2.0, numPyramidLevels=4,
                            functionTolerance=1e-4, parameterTolerance=1e-6,
                            maxIterations=50)
    vo = DeviceVO(K, baseline, (bench_mod.ROWS, bench_mod.COLS), p)
    images = np.stack([f[0] for f in frames])
    disps = np.stack([f[1] for f in frames])

    # run a few frames, collect iteration counts
    vo.init(images[0], disps[0])
    outs = [vo.add_frame(images[i], disps[i]) for i in range(1, 8)]
    iters = np.stack([np.asarray(o.iters) for o in outs])
    kf = np.asarray([bool(o.is_keyframe) for o in outs])
    print("per-frame GN iters (levels fine->coarse):\n", iters)
    print("keyframe flags:", kf, " total iters/frame:", iters.sum(1))

    state = vo.state
    img = jnp.asarray(images[1], jnp.float32)
    dsp = jnp.asarray(disps[1], jnp.float32)

    # stage 1: descriptor pyramid
    f_pyr = jax.jit(lambda im: _compute_channels_pyr(im, p, p.numPyramidLevels))
    ms = timeit(lambda: f_pyr(img), lambda r: np.asarray(r[0]))
    print(f"descriptor pyramid: {ms:.2f} ms")

    channels = f_pyr(img)

    # stage 2: template build (keyframe cost)
    f_tmpl = jax.jit(lambda ch, d: _build_templates(
        ch, d, vo._cams, p, vo._capacities))
    ms = timeit(lambda: f_tmpl(channels, dsp), lambda r: np.asarray(r[0].points))
    print(f"template build (all levels): {ms:.2f} ms")

    templates = f_tmpl(channels, dsp)

    # stage 3: full coarse-to-fine estimate
    f_est = jax.jit(lambda t, ch, T: _estimate(
        t, ch, vo._cams, T, vo._opts, p.maxTestLevel, p.goodPointThreshold,
        p.minNumPixelsToWork))
    T0 = jnp.eye(4, dtype=jnp.float32)
    ms = timeit(lambda: f_est(templates, channels, T0),
                lambda r: np.asarray(r[0]))
    res = f_est(templates, channels, T0)
    print(f"coarse-to-fine estimate: {ms:.2f} ms  iters={np.asarray(res[1])}")

    # stage 4: single GN level with fixed iteration counts (per-iter cost)
    import dataclasses
    for level in [0, 1, 2, 3]:
        base = None
        for n_it in [1, 5]:
            opts = dataclasses.replace(
                vo._opts[level], max_iterations=n_it, function_tolerance=0.0,
                parameter_tolerance=0.0, gradient_tolerance=0.0)
            f_lvl = jax.jit(lambda T, o=opts, l=level: gn.run(
                templates[l], channels[l], vo._cams[l], T, o))
            ms = timeit(lambda: f_lvl(T0), lambda r: np.asarray(r.T))
            if n_it == 1:
                base = ms
            else:
                print(f"level {level}: 1 iter {base:.2f} ms, "
                      f"5 iters {ms:.2f} ms -> {(ms-base)/4:.2f} ms/iter "
                      f"(cap={templates[level].points.shape[0]})")

    # stage 5: full jitted step (the real per-frame program).  The state is
    # donated, so thread it through and time a run of steps against a
    # repeating frame pair (one forces keyframes, one does not).
    def run_steps(n, img_seq):
        nonlocal state
        for k in range(n):
            state, out = vo._step_jit(state, img_seq[k % len(img_seq)], dsp)
        return out

    imgs_dev = [jnp.asarray(images[i], jnp.float32) for i in range(1, 5)]
    run_steps(3, imgs_dev)
    np.asarray(run_steps(1, imgs_dev).pose)
    t0 = time.perf_counter()
    out = run_steps(20, imgs_dev)
    np.asarray(out.pose)
    print(f"full fused step (mixed kf): {(time.perf_counter()-t0)/20*1e3:.2f} ms")


if __name__ == "__main__":
    main()
