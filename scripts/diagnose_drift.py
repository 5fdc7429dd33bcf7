"""Frame-by-frame instrumentation of the bench sequence around the point where
the relative-pose estimate leaves the true one-step motion (|t|=0.0307):
prints has_prev, T_kf, T_est magnitudes per frame to localize the fault."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax.numpy as jnp

import bench as bench_mod
from bpvo_tpu.vo.device_vo import DeviceVO

N = 26


def tmag(T):
    return float(np.linalg.norm(np.asarray(T)[:3, 3]))


def main():
    K, baseline, frames = bench_mod.synthesize_sequence(N)
    p = bench_mod._make_params("Intensity")
    vo = DeviceVO(K, baseline, (bench_mod.ROWS, bench_mod.COLS), p)
    gt_step = 0.030672  # |t| of the synthetic per-frame twist

    for i, (I, D) in enumerate(frames):
        pre_kf = tmag(vo.state.T_kf) if vo.state is not None else 0.0
        pre_prev = bool(vo.state.has_prev) if vo.state is not None else False
        out = vo.add_frame(jnp.asarray(I), jnp.asarray(D))
        if out is None:
            continue
        print(f"f{i:3d} pre(has_prev={int(pre_prev)} |T_kf|={pre_kf:7.4f}) "
              f"kf={int(out.is_keyframe)} r={int(out.reason)} "
              f"|pose|={tmag(out.pose):7.4f} (gt {gt_step:.4f}) "
              f"frac={float(out.frac_good):.3f} "
              f"iters={np.asarray(out.iters)}", flush=True)


if __name__ == "__main__":
    main()
