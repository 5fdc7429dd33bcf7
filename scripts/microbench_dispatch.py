"""Measure per-dispatch overhead of the axon backend as a function of pytree
size, vs the real VO step. Perf investigation tool."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

import bench as bench_mod
from bpvo_tpu import AlgorithmParameters
from bpvo_tpu.vo.device_vo import DeviceVO


def timeit(fn, fetch, reps=30, warmup=5):
    for _ in range(warmup):
        r = fn()
    fetch(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    fetch(r)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    # 1. trivial scalar jit: pure dispatch floor
    f0 = jax.jit(lambda x: x + 1.0)
    x = jnp.asarray(1.0)
    print(f"scalar jit dispatch: {timeit(lambda: f0(x), lambda r: np.asarray(r)):.3f} ms")

    # 2. many-leaf pytree in/out
    tree = [jnp.zeros((64, 64), jnp.float32) for _ in range(36)]
    f1 = jax.jit(lambda t: [a + 1.0 for a in t])
    print(f"36-leaf pytree jit: {timeit(lambda: f1(tree), lambda r: np.asarray(r[0])):.3f} ms")

    # 2b. donated many-leaf
    f1d = jax.jit(lambda t: [a + 1.0 for a in t], donate_argnums=0)
    def run_donated():
        nonlocal tree
        tree = f1d(tree)
        return tree
    print(f"36-leaf donated jit: {timeit(run_donated, lambda r: np.asarray(r[0])):.3f} ms")

    # 3. the real step, loop without fetch except at end
    K, baseline, frames = bench_mod.synthesize_sequence(8)
    p = AlgorithmParameters(minSaliency=2.0, numPyramidLevels=4,
                            functionTolerance=1e-4, parameterTolerance=1e-6,
                            maxIterations=50)
    vo = DeviceVO(K, baseline, (bench_mod.ROWS, bench_mod.COLS), p)
    imgs = [jax.device_put(jnp.asarray(f[0], jnp.float32)) for f in frames]
    dsps = [jax.device_put(jnp.asarray(f[1], jnp.float32)) for f in frames]
    vo.init(imgs[0], dsps[0])
    outs = [vo.add_frame(imgs[i % 8 or 1], dsps[i % 8 or 1]) for i in range(1, 12)]
    np.asarray(outs[-1].pose)

    def one_step(i=[0]):
        i[0] = i[0] % 7 + 1
        return vo.add_frame(imgs[i[0]], dsps[i[0]])
    print(f"vo step (sequenced): {timeit(one_step, lambda r: np.asarray(r.pose)):.3f} ms")


if __name__ == "__main__":
    main()
