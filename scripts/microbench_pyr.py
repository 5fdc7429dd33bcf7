"""Microbench: separable 5-tap filtering strategies on v5e."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from bpvo_tpu.ops import imgproc, descriptors

H, W = 376, 1241
I = jnp.asarray(np.random.rand(H, W).astype(np.float32) * 255)
K5 = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0


def timeit(fn, *a, reps=50):
    r = fn(*a)
    jax.tree.map(np.asarray, r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*a)
    jax.tree.map(np.asarray, r)
    return (time.perf_counter() - t0) / reps * 1e3


def sep_shift(Ip, k):
    """Separable filter via padded slicing (VPU-friendly)."""
    r = len(k) // 2
    # reflect-101 pad
    x = jnp.pad(Ip, ((r, r), (r, r)), mode="reflect")
    rows = sum(k[i] * x[i:i + Ip.shape[0], :] for i in range(len(k)))
    out = sum(k[i] * rows[:, i:i + Ip.shape[1]] for i in range(len(k)))
    return out


def pyr_down_shift(Ip):
    return sep_shift(Ip, K5)[::2, ::2]


def pyr4_conv(Ip):
    out = [Ip]
    for _ in range(3):
        out.append(imgproc.pyr_down(out[-1]))
    return tuple(out)


def pyr4_shift(Ip):
    out = [Ip]
    for _ in range(3):
        out.append(pyr_down_shift(out[-1]))
    return tuple(out)


print("pyr_down conv one level:", timeit(jax.jit(imgproc.pyr_down), I), "ms")
print("pyr_down shift one level:", timeit(jax.jit(pyr_down_shift), I), "ms")
print("4-level pyramid conv:", timeit(jax.jit(pyr4_conv), I), "ms")
print("4-level pyramid shift:", timeit(jax.jit(pyr4_shift), I), "ms")
print("intensity descriptor:", timeit(jax.jit(descriptors.intensity), I), "ms")

a = np.testing.assert_allclose
a(np.asarray(pyr_down_shift(I)), np.asarray(imgproc.pyr_down(I)),
  rtol=1e-5, atol=1e-3)
print("shift == conv OK")

# gradients used in saliency / template build
print("xgradient:", timeit(jax.jit(imgproc.xgradient), I), "ms")
g = jax.jit(lambda x: imgproc.gradient_absolute_magnitude_acc(x[None]))
print("saliency 1ch:", timeit(g, I), "ms")
