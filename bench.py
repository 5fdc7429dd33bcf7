"""End-to-end VO benchmark on the target device (TPU under the driver).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: effective VO frame rate (Hz) on a synthetic 376x1241 KITTI-sized
sequence with the intensity descriptor — directly comparable to the reference's
``vo_perf`` 100+ Hz claim on a 2011 dual-core i7 (reference README.md:72,
apps/vo_perf.cc).  vs_baseline = achieved_hz / 100.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_HZ = 100.0  # reference vo_perf claim (README.md:72)

# KITTI image size (seq 00)
ROWS, COLS = 376, 1241
N_FRAMES = 200      # 1 init + 3 chunks of CHUNK (warmup x2 + timed)
CHUNK = 60          # scan-mode chunk: amortizes the ~40 ms per-call tunnel RTT
N_WARMUP = 5        # online-mode warmup frames


def synthesize_sequence(n_frames, rows=ROWS, cols=COLS):
    """Plane scene with analytic texture, constant forward+lateral motion."""
    import jax.numpy as jnp
    from bpvo_tpu.core import se3

    fx = 718.856
    K = np.array([[fx, 0, cols / 2.0], [0, fx, rows / 2.0], [0, 0, 1]],
                 np.float64)
    baseline = 0.537
    n_pl = np.array([0.12, 0.22, 1.0])
    n_pl /= np.linalg.norm(n_pl)
    z0 = 8.0
    d_pl = z0 * n_pl[2]

    def texture(x, y):
        return (128 + 60 * np.sin(x / 7.0) * np.cos(y / 9.0)
                + 40 * np.sin((x + 2 * y) / 13.0))

    step = np.asarray(se3.exp(jnp.asarray(
        [0.0005, 0.001, 0.0008, 0.006, 0.002, 0.03], jnp.float32)),
        dtype=np.float64)

    uu, vv = np.meshgrid(np.arange(cols, dtype=np.float64),
                         np.arange(rows, dtype=np.float64))
    rays = np.stack([(uu - K[0, 2]) / K[0, 0], (vv - K[1, 2]) / K[1, 1],
                     np.ones_like(uu)], -1)

    frames = []
    T = np.eye(4)
    for _ in range(n_frames):
        R, t = T[:3, :3], T[:3, 3]
        Hm = K @ (R + np.outer(t, n_pl) / d_pl) @ np.linalg.inv(K)
        Hinv = np.linalg.inv(Hm)
        w = Hinv[2, 0] * uu + Hinv[2, 1] * vv + Hinv[2, 2]
        x0 = (Hinv[0, 0] * uu + Hinv[0, 1] * vv + Hinv[0, 2]) / w
        y0 = (Hinv[1, 0] * uu + Hinv[1, 1] * vv + Hinv[1, 2]) / w
        I = texture(x0, y0).astype(np.float32)
        n1 = R @ n_pl
        d1 = d_pl + n1 @ t
        Z = d1 / (rays @ n1)
        D = (fx * baseline / Z).astype(np.float32)
        frames.append((I, D))
        T = step @ T
    return K.astype(np.float32), baseline, frames


def main():
    import os
    from bpvo_tpu import AlgorithmParameters
    from bpvo_tpu.vo.device_vo import DeviceVO

    # "scan" (default): CHUNK frames per lax.scan dispatch — amortizes the
    #  per-dispatch RTT of the tunneled backend; measures device throughput.
    # "online": one jitted step per frame — the low-latency deployment mode;
    #  on this backend it is dispatch-RTT-bound, not compute-bound.
    mode = os.environ.get("BPVO_BENCH_MODE", "scan")

    n_frames = N_FRAMES if mode == "scan" else 30
    K, baseline, frames = synthesize_sequence(n_frames)
    p = AlgorithmParameters(
        minSaliency=2.0, numPyramidLevels=4,
        functionTolerance=1e-4, parameterTolerance=1e-6, maxIterations=50)
    vo = DeviceVO(K, baseline, (ROWS, COLS), p)

    # Stage the sequence in HBM before the timed region.  The driver's
    # host<->device link is a ~50 MB/s relay tunnel (measured; a real v5e
    # host's PCIe is ~2 orders of magnitude faster), so per-frame uploads
    # would measure the tunnel, not the VO.  In deployment the loader thread
    # (data/loader.py device_prefetch) overlaps this copy with compute,
    # exactly like the reference's DatasetLoaderThread overlaps disk IO
    # (reference apps/vo_app.cc:213-247).
    import jax
    import jax.numpy as jnp
    images = jax.device_put(jnp.asarray(
        np.stack([f[0] for f in frames]), jnp.float32))
    disps = jax.device_put(jnp.asarray(
        np.stack([f[1] for f in frames]), jnp.float32))
    if mode == "scan":
        # Two warmup chunks of the SAME length as the timed chunk: the first
        # pays the XLA compile, the second settles donated-buffer aliasing
        # (the first donated call can trigger a one-off ~0.5 s relayout).
        c = CHUNK
        vo.add_frames(images[:c + 1], disps[:c + 1])       # init + c steps
        np.asarray(vo.state.pose_world)
        vo.add_frames(images[c + 1:2 * c + 1], disps[c + 1:2 * c + 1])
        np.asarray(vo.state.pose_world)
        t0 = time.perf_counter()
        outs = vo.add_frames(images[2 * c + 1:3 * c + 1],
                             disps[2 * c + 1:3 * c + 1])
        poses = np.asarray(outs.pose_world)
        dt = time.perf_counter() - t0
        n = c
    else:
        # Per-frame device arrays: indexing the stacked array inside the loop
        # would launch one extra slice dispatch per frame (~1.7 ms on this
        # backend — comparable to the whole VO step).
        frame_list = [(jax.device_put(images[i]), jax.device_put(disps[i]))
                      for i in range(n_frames)]
        for i in range(N_WARMUP):
            out = vo.add_frame(*frame_list[i])
        if out is not None:
            np.asarray(out.pose)
        t0 = time.perf_counter()
        n = 0
        poses = None
        for i in range(N_WARMUP, n_frames):
            out = vo.add_frame(*frame_list[i])
            n += 1
        poses = np.asarray(out.pose_world)
        dt = time.perf_counter() - t0
    assert np.all(np.isfinite(poses)), "non-finite trajectory"

    hz = n / dt
    print(json.dumps({
        "metric": "vo_frame_rate_synth_kitti_intensity",
        "value": round(hz, 2),
        "unit": "Hz",
        "vs_baseline": round(hz / BASELINE_HZ, 3),
    }))


if __name__ == "__main__":
    main()
