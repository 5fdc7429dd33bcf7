"""KITTI-scale TpuSGM end-to-end disparity throughput on the real device
(VERDICT round-3 item 9): full-frame 376x1241, D=128, census cost + Pallas
4-direction aggregation + WTA-subpixel, amortized over in-loop reps — the
number that positions the TPU stereo subsystem against the reference's RSGM
(/root/reference/utils/rsgm.cc:1-17, "Large Scale SGM on the CPU").

Also records CvSGBM host wall-time on the same pair for context.

Writes docs/PALLAS_TPU.json sgm_e2e_* keys and updates the summary line in
docs/SGM_CALIBRATION.md is left to the doc.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

RESULTS = {}


def main():
    from bpvo_tpu.data import stereo

    print(f"devices: {jax.devices()}")
    H, W, D = 376, 1241, 128
    rng = np.random.default_rng(0)
    # synthetic stereo pair with known integer shift texture
    base = rng.integers(0, 255, (H, W + 96)).astype(np.float32)
    left = base[:, 64:64 + W]
    # right-camera content sits 32 px to the RIGHT in the base mosaic, so the
    # left-image feature at x matches right-image x - 32: disparity +32
    right = base[:, 96:96 + W]
    left = left + rng.normal(0, 2, left.shape).astype(np.float32)
    right = right + rng.normal(0, 2, right.shape).astype(np.float32)

    lj = jax.device_put(jnp.asarray(left))
    rj = jax.device_put(jnp.asarray(right))

    @jax.jit
    def run_n(l, r, n):
        def body(i, c):
            d = stereo._sgm(l + c * 0, r, D, 2.0, 8.0, True)
            return c + d[0, 0] * 1e-9
        return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0, jnp.float32))

    n = 10
    res = run_n(lj, rj, n)   # compile + warm
    np.asarray(res)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        np.asarray(run_n(lj, rj, n))
    ms = (time.perf_counter() - t0) / reps / n * 1e3
    hz = 1e3 / ms
    RESULTS["sgm_e2e_ms_376x1241_d128"] = round(ms, 2)
    RESULTS["sgm_e2e_hz_376x1241_d128"] = round(hz, 2)
    print(f"TpuSGM end-to-end {H}x{W} D={D}: {ms:.2f} ms/frame = {hz:.2f} Hz")

    # sanity: disparity near 32 on the valid interior
    d = np.asarray(jax.jit(lambda l, r: stereo._sgm(l, r, D, 2.0, 8.0,
                                                    True))(lj, rj))
    interior = d[40:-40, 200:-80]
    med = float(np.median(interior))
    RESULTS["sgm_e2e_median_disp"] = round(med, 2)
    print(f"median interior disparity: {med:.2f} (expect ~32)")

    # host cv2 SGBM context number on the same pair
    try:
        from bpvo_tpu.config import ConfigFile
        cf = ConfigFile()
        cf.set("numberOfDisparities", D)
        algo = stereo.CvSGBM(cf)
        l8 = np.clip(left, 0, 255).astype(np.uint8)
        r8 = np.clip(right, 0, 255).astype(np.uint8)
        algo.run(l8, r8)  # warm
        t0 = time.perf_counter()
        algo.run(l8, r8)
        cv_ms = (time.perf_counter() - t0) * 1e3
        RESULTS["sgm_e2e_cvsgbm_host_ms"] = round(cv_ms, 1)
        print(f"CvSGBM (host, 2-core container): {cv_ms:.1f} ms/frame")
    except Exception as e:
        print(f"CvSGBM context run failed: {e}")

    out = Path(__file__).resolve().parents[1] / "docs" / "PALLAS_TPU.json"
    existing = json.loads(out.read_text()) if out.exists() else {}
    existing.update(RESULTS)
    out.write_text(json.dumps(existing, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
