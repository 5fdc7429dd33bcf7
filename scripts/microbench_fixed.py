"""Decompose the FIXED per-level-run GN cost on device (VERDICT r3 item 2).

The round-3 stage table showed each per-level GN run paying 0.29-0.40 ms
before iteration work.  This probe separates, per pyramid level:
  - gn.run at max_iterations = 1 / 2 / 3 / 5 (linear fit -> fixed + per-iter)
  - one bare linearize call (the production fused/jnp closure gn.run builds)
  - estimate_scale at that level's K (histogram median)
  - the 6x6 solve chain
  - params_to_pose + pose compose
Usage: python scripts/microbench_fixed.py [bitplanes]
"""
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

import bench as bench_mod
from bpvo_tpu import AlgorithmParameters
from bpvo_tpu.solver import gauss_newton as gn
from bpvo_tpu.solver import linear_system, mestimator
from bpvo_tpu.vo import warp as warp_mod
from bpvo_tpu.vo.device_vo import DeviceVO, _compute_channels_pyr


def loop_time(make_body, n=50, reps=5, warmup=2):
    def prog(x):
        return jax.lax.fori_loop(0, n, make_body, x)
    f = jax.jit(prog)
    x0 = jnp.asarray(0.0, jnp.float32)
    for _ in range(warmup):
        r = f(x0)
    np.asarray(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(x0)
    np.asarray(r)
    return (time.perf_counter() - t0) / reps / n * 1e3


def main():
    from bpvo_tpu.types import DescriptorType
    desc = (DescriptorType.BITPLANES if "bitplanes" in sys.argv[1:]
            else DescriptorType.INTENSITY)
    print(f"descriptor: {desc.name}, backend: {jax.default_backend()}")
    K, baseline, frames = bench_mod.synthesize_sequence(3)
    p = AlgorithmParameters(minSaliency=2.0, numPyramidLevels=4,
                            descriptor=desc,
                            functionTolerance=1e-4, parameterTolerance=1e-6,
                            maxIterations=50)
    vo = DeviceVO(K, baseline, (bench_mod.ROWS, bench_mod.COLS), p)
    img = jax.device_put(jnp.asarray(frames[1][0], jnp.float32))
    dsp = jax.device_put(jnp.asarray(frames[1][1], jnp.float32))
    vo.init(img, dsp)
    templates = vo.state.templates
    channels = jax.tree.map(jax.device_put, _compute_channels_pyr(img, p, 4))
    T0 = jnp.eye(4, dtype=jnp.float32)

    for level in range(4):
        td = templates[level]
        ch = channels[level]
        cam = vo._cams[level]
        Kn = td.pixels.shape[1]
        times = {}
        for n_it in (1, 2, 3, 5):
            opts = dataclasses.replace(
                vo._opts[level], max_iterations=n_it, function_tolerance=0.0,
                parameter_tolerance=0.0, gradient_tolerance=0.0)

            def body(i, x, o=opts, td=td, ch=ch, cam=cam):
                st = gn.run(td, ch, cam, T0 + 0.0 * x, o)
                return st.f_norm
            times[n_it] = loop_time(body, n=20)
        per_iter = (times[5] - times[1]) / 4
        fixed = times[1] - per_iter
        print(f"L{level} cap={Kn}: 1it={times[1]:.3f} 2it={times[2]:.3f} "
              f"3it={times[3]:.3f} 5it={times[5]:.3f} ms -> "
              f"fixed~{fixed:.3f} + {per_iter*1e3:.0f} us/iter")

        # isolated pieces at this level's shapes
        r = jnp.asarray(np.random.default_rng(0).standard_normal(Kn),
                        jnp.float32)
        v = jnp.asarray(np.ones(Kn, bool))

        def est_body(i, x, r=r, v=v):
            return x + mestimator.estimate_scale(r + x * 0, v, True)
        print(f"   estimate_scale(K={Kn}): {loop_time(est_body):.3f} ms")

        Hm = jnp.eye(6, dtype=jnp.float32) * 100.0
        g6 = jnp.ones(6, jnp.float32)

        def solve_body(i, x, Hm=Hm, g6=g6):
            dp, ok = linear_system.solve(Hm + x * 0, g6)
            return x + dp[0] * 1e-9
        print(f"   solve 6x6 chain:      {loop_time(solve_body):.3f} ms")

        s, c = td.norm_scale, td.norm_center

        def pose_body(i, x, s=s, c=c):
            T = T0 @ warp_mod.params_to_pose(
                jnp.full((6,), 1e-6, jnp.float32) * (1 + x * 0), s, c)
            return x + T[0, 3]
        print(f"   params_to_pose+mul:   {loop_time(pose_body):.3f} ms")


if __name__ == "__main__":
    main()
