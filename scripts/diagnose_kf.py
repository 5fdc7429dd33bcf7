"""Why does the bench sequence keyframe every frame, and why do coarse-level
iterations grow?  Prints per-frame keyframe reason / frac_good / iters."""
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
    K, baseline, frames = bench_mod.synthesize_sequence(121)
    images = jax.device_put(jnp.asarray(
        np.stack([f[0] for f in frames]), jnp.float32))
    disps = jax.device_put(jnp.asarray(
        np.stack([f[1] for f in frames]), jnp.float32))
    del frames

    p = bench_mod._make_params("Intensity")
    print("kf thresholds: t>", p.minTranslationMagToKeyFrame,
          " r>", p.minRotationMagToKeyFrame,
          " frac<", p.maxFractionOfGoodPointsToKeyFrame,
          " goodThresh", p.goodPointThreshold)
    vo = DeviceVO(K, baseline, (bench_mod.ROWS, bench_mod.COLS), p)
    c = 60
    for k in range(2):
        lo, hi = k * c + 1, (k + 1) * c + 1
        outs = vo.add_frames(images[lo:hi], disps[lo:hi])
        reason = np.asarray(outs.reason)
        frac = np.asarray(outs.frac_good)
        iters = np.asarray(outs.iters)
        pose = np.asarray(outs.pose)
        tmag = np.linalg.norm(pose[:, :3, 3], axis=1)
        for i in range(0, c, 6):
            print(f"f{lo+i:3d} reason={reason[i]} frac={frac[i]:.3f} "
                  f"|t|={tmag[i]:.4f} iters={iters[i]}")
        print(f"chunk {k}: reasons bincount={np.bincount(reason, minlength=4)}"
              f" frac min/med={frac.min():.3f}/{np.median(frac):.3f}")


if __name__ == "__main__":
    main()
