"""Decompose TpuSGM's full-frame wall time on device (round-5 finding: the
total is nearly D-INDEPENDENT — 45 vs 47 ms at D=128/64 — so the disparity
axis is the wrong optimization target until this table says which stage
dominates).

Stages, timed separately at KITTI shape for D in {64, 128}:
  census_planes (x2: left + right)
  cost volume (lax.map over D of census hamming)
  aggregation  (Pallas aggregate_4dir vs lax.scan route)
  WTA + sub-pixel parabola

Usage: python scripts/profile_sgm.py [rows cols]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

import bench as bench_mod
from bpvo_tpu.data import stereo as st
from bpvo_tpu.ops.census import census_planes


def timeit(f, *args, reps=10, warmup=2):
    g = jax.jit(f)
    for _ in range(warmup):
        r = g(*args)
    jax.block_until_ready(r)  # sync WITHOUT fetching: multi-MB results
    t0 = time.perf_counter()  # over the ~50 MB/s tunnel would otherwise
    for _ in range(reps):     # dominate every stage time
        r = g(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else bench_mod.ROWS
    cols = int(sys.argv[2]) if len(sys.argv) > 2 else bench_mod.COLS
    print(f"SGM stage profile at {rows}x{cols}, "
          f"backend={jax.default_backend()}")
    ds = None
    K, baseline, frames = bench_mod.synthesize_sequence(1, rows, cols)
    L = jax.device_put(jnp.asarray(frames[0][0], jnp.float32))
    # right view: shifted left (content irrelevant for timing)
    R = jnp.roll(L, 12, axis=1)

    t_census = timeit(lambda a, b: (census_planes(a), census_planes(b)), L, R)
    print(f"census_planes x2:        {t_census:7.2f} ms (D-independent)")

    cL = jax.device_put(census_planes(L))
    cR = jax.device_put(census_planes(R))
    col = jnp.arange(cols)[None, :]

    for D in (64, 128):
        def cost_vol(cl, cr):
            def cost_at(d):
                ham = jnp.sum(jnp.abs(cl - jnp.roll(cr, d, axis=-1)), axis=0)
                return jnp.where(col < d, 8.0, ham)
            return jnp.moveaxis(jax.lax.map(cost_at, jnp.arange(D)), 0, -1)

        t_cost = timeit(cost_vol, cL, cR)
        cost = jax.device_put(cost_vol(cL, cR))

        from bpvo_tpu.ops.pallas import sgm_kernel
        t_agg_pallas = timeit(
            lambda c: sgm_kernel.aggregate_4dir(c, 2.0, 8.0), cost)
        t_agg_scan = timeit(
            lambda c: st._aggregate_4dir_scan(c, 2.0, 8.0), cost)
        agg = jax.device_put(sgm_kernel.aggregate_4dir(cost, 2.0, 8.0))
        t_wta = timeit(lambda a: st._wta_subpixel(a, D), agg)
        total = t_census + t_cost + t_agg_pallas + t_wta
        print(f"D={D:3d}: cost_volume {t_cost:7.2f}  "
              f"aggregate4 pallas {t_agg_pallas:7.2f} (scan "
              f"{t_agg_scan:7.2f})  wta+subpixel {t_wta:6.2f}  "
              f"=> stage sum {total:7.2f} ms")

        t_e2e = timeit(lambda a, b: st._sgm(a, b, D, 2.0, 8.0,
                                            jax.default_backend() == "tpu"),
                       L, R)
        print(f"       end-to-end _sgm: {t_e2e:7.2f} ms")


if __name__ == "__main__":
    main()
