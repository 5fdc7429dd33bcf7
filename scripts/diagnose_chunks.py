"""Why do scan-mode chunks slow down over the sequence, and what is the true
per-frame device time?  Fetches per-frame iteration counts / keyframe flags
per chunk and fits fixed-overhead + per-frame cost from two chunk lengths."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

import bench as bench_mod
from bpvo_tpu.vo.device_vo import DeviceVO


def main():
    K, baseline, frames = bench_mod.synthesize_sequence(301)
    images = jax.device_put(jnp.asarray(
        np.stack([f[0] for f in frames]), jnp.float32))
    disps = jax.device_put(jnp.asarray(
        np.stack([f[1] for f in frames]), jnp.float32))
    del frames

    p = bench_mod._make_params("Intensity")
    vo = DeviceVO(K, baseline, (bench_mod.ROWS, bench_mod.COLS), p)
    c = 60
    # warmup chunk (compile)
    vo.add_frames(images[:c + 1], disps[:c + 1])
    np.asarray(vo.state.pose_world)
    stats = []
    for k in range(1, 5):
        lo, hi = k * c + 1, (k + 1) * c + 1
        t0 = time.perf_counter()
        outs = vo.add_frames(images[lo:hi], disps[lo:hi])
        np.asarray(outs.pose_world)
        dt = time.perf_counter() - t0
        iters = np.asarray(outs.iters)          # (c, L)
        kf = np.asarray(outs.is_keyframe)
        stats.append((dt, iters.sum(), kf.sum()))
        print(f"chunk {k}: {c/dt:7.2f} Hz  iters/frame="
              f"{iters.sum()/c:6.2f}  per-level={iters.sum(0)}  "
              f"keyframes={kf.sum()}")

    # fixed overhead vs per-frame cost: time chunks of 15 frames
    vo2 = DeviceVO(K, baseline, (bench_mod.ROWS, bench_mod.COLS), p)
    c2 = 15
    vo2.add_frames(images[:c2 + 1], disps[:c2 + 1])
    np.asarray(vo2.state.pose_world)
    ts = []
    for k in range(1, 9):
        lo, hi = k * c2 + 1, (k + 1) * c2 + 1
        t0 = time.perf_counter()
        outs = vo2.add_frames(images[lo:hi], disps[lo:hi])
        np.asarray(outs.pose_world)
        ts.append(time.perf_counter() - t0)
    print(f"15-frame chunks ms: {[round(t*1e3,1) for t in ts]}")
    # overhead estimate: chunk60_time - 4*chunk15_time ~ -3*fixed
    print(f"median 15-frame: {np.median(ts)*1e3:.1f} ms "
          f"-> per-frame {np.median(ts)/c2*1e3:.2f} ms")


if __name__ == "__main__":
    main()
