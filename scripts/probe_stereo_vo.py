"""Measure stereo INSIDE the VO loop on device (VERDICT r4 item 2).

Runs the DeviceVO scan at KITTI shape with disparity computed ON DEVICE by
TpuSGM/TpuBM at keyframe (template) rate — the matcher lives inside the
keyframe lax.cond branch (bpvo_tpu/vo/device_vo.py stereo_fn) — and reports
the combined stereo+VO Hz next to the precomputed-disparity baseline.  This
turns docs/SGM_CALIBRATION.md's "stereo is not the VO bottleneck" claim into
a measured number.

The sequence is the bench's value-noise plane with an exactly-rendered right
view (SyntheticPlaneDataset.right_image), so matcher disparity error and its
effect on pose accuracy are measurable against GT.

Usage: python scripts/probe_stereo_vo.py [bm|sgm] [D] [rows cols]
Writes docs/STEREO_VO.json.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

import bench as bench_mod
from bpvo_tpu import AlgorithmParameters
from bpvo_tpu.core import se3
from bpvo_tpu.data.stereo import TpuBlockMatching, TpuSGM
from bpvo_tpu.data.synthetic import SyntheticPlaneDataset
from bpvo_tpu.vo.device_vo import DeviceVO

CHUNK = 30
N_CHUNKS = 4  # 2 warmup (compile + donation relayout) + 2 timed


def run(vo, images, auxs, tag):
    c = CHUNK
    vo.add_frames(images[:c + 1], auxs[:c + 1])
    np.asarray(vo.state.pose_world)
    vo.add_frames(images[c + 1:2 * c + 1], auxs[c + 1:2 * c + 1])
    np.asarray(vo.state.pose_world)
    hz = []
    outs = None
    for k in range(2, N_CHUNKS):
        lo, hi = k * c + 1, (k + 1) * c + 1
        t0 = time.perf_counter()
        outs = vo.add_frames(images[lo:hi], auxs[lo:hi])
        np.asarray(outs.pose_world)
        hz.append(c / (time.perf_counter() - t0))
    kf = int(np.sum(np.asarray(outs.is_keyframe)))
    print(f"[{tag}] chunks: {[round(h, 1) for h in hz]} Hz, "
          f"keyframes last chunk: {kf}/{c}")
    return float(np.median(hz)), outs


def main():
    alg = sys.argv[1] if len(sys.argv) > 1 else "sgm"
    D = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    rows = int(sys.argv[3]) if len(sys.argv) > 3 else bench_mod.ROWS
    cols = int(sys.argv[4]) if len(sys.argv) > 4 else bench_mod.COLS
    print(f"stereo-in-the-loop probe: {alg} D={D} {rows}x{cols} "
          f"backend={jax.default_backend()}")

    # value-noise plane + exact right view; baseline scaled so disparities
    # land well inside [1, D)
    n_frames = 1 + N_CHUNKS * CHUNK
    ds = SyntheticPlaneDataset(
        rows=rows, cols=cols, n_frames=n_frames, texture="noise",
        fx=718.856, baseline=0.537 * D / 128.0, z0=8.0)
    K = ds.calibration.K
    print("rendering frames (host, analytic)...")
    lefts, rights, gt_disp = [], [], []
    for i in range(n_frames):
        f = ds.get_frame(i)
        lefts.append(f.image)
        rights.append(ds.right_image(i))
        gt_disp.append(f.disparity)
    T_step = np.asarray(ds._step, np.float64)

    images = jax.device_put(jnp.asarray(np.stack(lefts), jnp.float32))
    rimgs = jax.device_put(jnp.asarray(np.stack(rights), jnp.float32))
    gt_d = jax.device_put(jnp.asarray(np.stack(gt_disp), jnp.float32))
    del lefts, rights, gt_disp

    p = AlgorithmParameters(minSaliency=2.0, numPyramidLevels=4,
                            functionTolerance=1e-4, parameterTolerance=1e-6,
                            maxIterations=50, minValidDisparity=1.0,
                            maxValidDisparity=float(D))
    matcher = (TpuSGM(num_disparities=D) if alg == "sgm"
               else TpuBlockMatching(num_disparities=D))

    out = {"alg": alg, "D": D, "rows": rows, "cols": cols,
           "backend": jax.default_backend()}

    def errs_of(outs):
        poses = np.asarray(outs.pose)
        e = [np.abs(np.asarray(se3.log(jnp.asarray(
            P @ np.linalg.inv(T_step).astype(np.float32),
            jnp.float32)))).max() for P in poses]
        return float(np.mean(e)), float(np.max(e))

    # baseline: GT disparity (no stereo anywhere)
    vo = DeviceVO(K, ds.calibration.baseline, (rows, cols), p)
    hz_gt, outs = run(vo, images, gt_d, "VO only, GT disparity")
    out["vo_only_hz"] = round(hz_gt, 2)
    out["vo_only_err_mean"], out["vo_only_err_max"] = errs_of(outs)
    del vo

    # combined: stereo at keyframe rate inside the loop
    vo = DeviceVO(K, ds.calibration.baseline, (rows, cols), p,
                  stereo_fn=matcher.as_fn())
    hz_st, outs = run(vo, images, rimgs, f"VO + {alg} at keyframe rate")
    out["stereo_vo_hz"] = round(hz_st, 2)
    out["stereo_vo_err_mean"], out["stereo_vo_err_max"] = errs_of(outs)
    out["overhead_pct"] = round(100.0 * (hz_gt / max(hz_st, 1e-9) - 1.0), 1)
    del vo

    # context: the matcher's own full-frame rate (per-frame stereo cost)
    L0, R0 = images[0], rimgs[0]
    fn = jax.jit(matcher.as_fn())
    np.asarray(fn(L0, R0))
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        d = fn(L0, R0)
    np.asarray(d)
    ms = (time.perf_counter() - t0) / reps * 1e3
    out["matcher_full_frame_ms"] = round(ms, 2)
    valid = np.asarray(d) > 0
    gt0 = np.asarray(gt_d[0])
    out["matcher_median_abs_err_px"] = round(float(np.median(
        np.abs(np.asarray(d) - gt0)[valid])), 3)

    print(json.dumps(out, indent=1))
    path = Path(__file__).resolve().parents[1] / "docs" / "STEREO_VO.json"
    path.write_text(json.dumps(out, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
