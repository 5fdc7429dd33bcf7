"""Decompose the stacked fused-GN kernel's on-device cost (round 4).

Times, at KITTI L0 BitPlanes shape (C=8, K=16384, 376x1241):
  - full runner (projection + pack prep + kernel) for f32 and bf16 column mix
  - the raw pallas_call alone (pre-built operands) for both
  - the C=1 intensity runner for comparison

Writes results into docs/PALLAS_TPU.json under stacked_probe_*.
"""
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

RESULTS = {}


def loop_time(body, n=100, reps=3, warmup=1):
    f = jax.jit(lambda x: jax.lax.fori_loop(0, n, lambda i, c: body(c), x))
    x0 = jnp.asarray(0.0, jnp.float32)
    for _ in range(warmup):
        r = f(x0)
    np.asarray(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(x0)
        np.asarray(r)
    return (time.perf_counter() - t0) / reps / n * 1e3


def record(name, ms, note=""):
    RESULTS[name] = round(ms, 4)
    print(f"{name:44s} {ms:9.4f} ms  {note}")


def main():
    import bench as bench_mod
    from bpvo_tpu import AlgorithmParameters
    from bpvo_tpu.ops import interp as interp_mod
    from bpvo_tpu.ops.pallas import gn_kernel
    from bpvo_tpu.types import DescriptorType, LossFunctionType
    from bpvo_tpu.vo import warp as warp_mod
    from bpvo_tpu.vo.device_vo import DeviceVO, _compute_channels_pyr

    print(f"devices: {jax.devices()}")
    K, baseline, frames = bench_mod.synthesize_sequence(3)
    p = AlgorithmParameters(minSaliency=2.0, numPyramidLevels=4,
                            descriptor=DescriptorType.BITPLANES,
                            maxIterations=50, functionTolerance=1e-4,
                            parameterTolerance=1e-6)
    vo = DeviceVO(K, baseline, (bench_mod.ROWS, bench_mod.COLS), p)
    img = jax.device_put(jnp.asarray(frames[1][0], jnp.float32))
    dsp = jax.device_put(jnp.asarray(frames[1][1], jnp.float32))
    vo.init(img, dsp)
    td = vo.state.templates[0]
    channels = jax.device_put(_compute_channels_pyr(img, p, 4)[0])
    cam = vo._cams[0]
    opts = vo._opts[0]
    rows_, cols_ = channels.shape[1], channels.shape[2]
    C_, K_ = td.pixels.shape
    T0 = jnp.eye(4, dtype=jnp.float32)
    sigma = jnp.asarray(1.7, jnp.float32)
    jps = gn_kernel.pack_template_stacked(td.pixels, td.jacobians)
    ch_pad = gn_kernel.pad_channels(channels, rows_, cols_)

    # full runners (projection + prep + kernel)
    for tag, bf16 in (("f32", False), ("bf16", True)):
        runner = gn_kernel.make_fused_linearize_stacked(
            rows_, cols_, C_, K_, opts.loss, opts.interp, mxu_bf16=bf16)

        def body(c, runner=runner):
            T = T0.at[0, 3].add(c * 1e-6)
            u, v, Z = warp_mod.project(cam, T, td.points)
            ok = td.valid & (Z > 1e-6) & interp_mod.valid_mask(
                u, v, rows_, cols_, opts.interp)
            H6, g, f_sq, r0, w, bok = runner(u, v, ok, ch_pad, jps, sigma)
            return c + f_sq * 1e-9

        record(f"stacked_probe_full_{tag}_C8", loop_time(body))

    # raw kernel call: pre-build u/v/ok once outside the loop
    u, v, Z = warp_mod.project(cam, T0, td.points)
    ok = td.valid & (Z > 1e-6) & interp_mod.valid_mask(
        u, v, rows_, cols_, opts.interp)
    u, v, ok = jax.device_put(u), jax.device_put(v), jax.device_put(ok)
    for tag, bf16 in (("f32", False), ("bf16", True)):
        runner = gn_kernel.make_fused_linearize_stacked(
            rows_, cols_, C_, K_, opts.loss, opts.interp, mxu_bf16=bf16)

        def body_raw(c, runner=runner):
            H6, g, f_sq, r0, w, bok = runner(u + c * 1e-9, v, ok, ch_pad,
                                             jps, sigma)
            return c + f_sq * 1e-9

        record(f"stacked_probe_raw_{tag}_C8", loop_time(body_raw))

    # numeric sanity of bf16 vs f32 column mix
    rf = gn_kernel.make_fused_linearize_stacked(
        rows_, cols_, C_, K_, opts.loss, opts.interp, mxu_bf16=False)
    rb = gn_kernel.make_fused_linearize_stacked(
        rows_, cols_, C_, K_, opts.loss, opts.interp, mxu_bf16=True)
    Hf, gf, ff, r0f, wf, _ = jax.jit(rf)(u, v, ok, ch_pad, jps, sigma)
    Hb, gb, fb, r0b, wb, _ = jax.jit(rb)(u, v, ok, ch_pad, jps, sigma)
    dH = float(jnp.max(jnp.abs(Hb - Hf)) / jnp.max(jnp.abs(Hf)))
    dg = float(jnp.max(jnp.abs(gb - gf)) /
               jnp.maximum(jnp.max(jnp.abs(gf)), 1e-20))
    dr = float(jnp.max(jnp.abs(r0b - r0f)))
    RESULTS["stacked_bf16_vs_f32"] = {"H": round(dH, 6), "g": round(dg, 6),
                                      "r0_absmax": round(dr, 6)}
    print(f"bf16 vs f32: H {dH:.2e} g {dg:.2e} r0 absmax {dr:.2e}")

    out = Path(__file__).resolve().parents[1] / "docs" / "PALLAS_TPU.json"
    existing = json.loads(out.read_text()) if out.exists() else {}
    existing.update(RESULTS)
    out.write_text(json.dumps(existing, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
