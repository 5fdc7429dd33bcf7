"""Gather layout shootout for the warped-sampling hot path.
K=16384 points from a 376x1241 image (HW=466616), bilinear = 4 taps.
Perf investigation tool."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp


def loop_time(make_body, n=100, reps=5, warmup=2):
    f = jax.jit(lambda x: jax.lax.fori_loop(0, n, make_body, x))
    x0 = jnp.asarray(0, jnp.int32)
    for _ in range(warmup):
        r = f(x0)
    np.asarray(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(x0)
    np.asarray(r)
    return (time.perf_counter() - t0) / reps / n * 1e3


def main():
    H, W, Kp = 376, 1241, 16384
    HW = H * W
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    flat = img.reshape(-1)
    # raster-sorted indices (like the real template)
    idx = jnp.asarray(np.sort(rng.choice(HW - W - 1, Kp, replace=False))
                      .astype(np.int32))

    packed_rows = jnp.stack([flat, jnp.roll(flat, -1), jnp.roll(flat, -W),
                             jnp.roll(flat, -W - 1)], axis=1)   # (HW, 4)
    packed_lanes = packed_rows.T                                 # (4, HW)

    def t(name, body):
        print(f"{name}: {loop_time(body):.4f} ms")

    t("rows (HW,4) take axis0   ", lambda i, x: packed_rows[idx + x].sum().astype(jnp.int32) * 0 + x)
    t("lanes (4,HW) take axis1  ", lambda i, x: jnp.take(packed_lanes, idx + x, axis=1).sum().astype(jnp.int32) * 0 + x)
    t("flat 4 takes             ", lambda i, x: (flat[idx + x] + flat[idx + 1 + x] + flat[idx + W + x] + flat[idx + W + 1 + x]).sum().astype(jnp.int32) * 0 + x)
    t("flat 1 take (idx only)   ", lambda i, x: flat[idx + x].sum().astype(jnp.int32) * 0 + x)
    # single big take of 4K indices from flat
    offs = jnp.asarray([0, 1, W, W + 1], jnp.int32)
    t("flat 1 take of 4K idx    ", lambda i, x: flat[(idx[:, None] + offs[None, :] + x).reshape(-1)].sum().astype(jnp.int32) * 0 + x)
    # bf16 variants
    flat16 = flat.astype(jnp.bfloat16)
    packed_rows16 = packed_rows.astype(jnp.bfloat16)
    t("bf16 rows (HW,4) take    ", lambda i, x: packed_rows16[idx + x].sum().astype(jnp.int32) * 0 + x)
    t("bf16 flat 4 takes        ", lambda i, x: (flat16[idx + x] + flat16[idx + 1 + x] + flat16[idx + W + x] + flat16[idx + W + 1 + x]).sum().astype(jnp.int32) * 0 + x)
    # packed pairs: (HW, 2) rows with (x, x+1); two takes for the two rows
    pair = jnp.stack([flat, jnp.roll(flat, -1)], axis=1)  # (HW,2)
    t("pairs (HW,2) 2 takes     ", lambda i, x: (pair[idx + x].sum() + pair[idx + W + x].sum()).astype(jnp.int32) * 0 + x)
    # one-hot matmul gather (MXU): idx one-hot against image blocks
    t("dynamic_slice loopless 2d", lambda i, x: img[(idx + x) // W, (idx + x) % W].sum().astype(jnp.int32) * 0 + x)


if __name__ == "__main__":
    main()
