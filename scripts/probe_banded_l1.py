"""Device probe for the round-5 BANDED whole-level GN kernel at the
production L1 shapes (K=4096; BitPlanes C=8 and intensity C=1).

Checks, on real TPU:
  1. the banded kernel COMPILES (the dynamic row-band slice needs Mosaic to
     accept the bases*8 sublane-alignment proof);
  2. parity vs gauss_newton.run (pose + sigma), band_overflow == 0;
  3. per-run ms vs the XLA-loop route at the same opts (the go/no-go for
     shipping it as the L1 production route).

Usage: python scripts/probe_banded_l1.py [bitplanes|intensity|both]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

import bench as bench_mod
from bpvo_tpu import AlgorithmParameters
from bpvo_tpu.ops import descriptors, imgproc
from bpvo_tpu.ops.pallas import level_gn_kernel as lk
from bpvo_tpu.solver import gauss_newton as gn
from bpvo_tpu.types import DescriptorType
from bpvo_tpu.vo import template_data as td_mod
from bpvo_tpu.vo import warp as warp_mod


def loop_time(make_body, n=20, reps=5, warmup=2):
    def prog(x):
        return jax.lax.fori_loop(0, n, make_body, x)
    f = jax.jit(prog)
    x0 = jnp.asarray(0.0, jnp.float32)
    for _ in range(warmup):
        r = f(x0)
    np.asarray(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(x0)
    np.asarray(r)
    return (time.perf_counter() - t0) / reps / n * 1e3


def probe(desc_name: str, level: int = 1):
    desc = (DescriptorType.BITPLANES if desc_name == "bitplanes"
            else DescriptorType.INTENSITY)
    # L1 of the KITTI bench: 188x621, K=4096
    K, baseline, frames = bench_mod.synthesize_sequence(2)
    p = AlgorithmParameters(minSaliency=2.0, numPyramidLevels=4,
                            descriptor=desc, functionTolerance=1e-4,
                            parameterTolerance=1e-6, maxIterations=50)
    cam = warp_mod.CameraModel.from_K(K, baseline).at_level(level)
    I0 = jnp.asarray(frames[0][0], jnp.float32)
    I1 = jnp.asarray(frames[1][0], jnp.float32)
    D = jnp.asarray(frames[0][1], jnp.float32)
    I0l, I1l = I0, I1
    for _ in range(level):
        I0l = imgproc.pyr_down(I0l)
        I1l = imgproc.pyr_down(I1l)
    ch0 = descriptors.compute(I0l, p)
    ch1 = jax.device_put(descriptors.compute(I1l, p))
    dl = imgproc.disparity_at_level(D, level)[:ch0.shape[1], :ch0.shape[2]]
    cap = 16384 >> (2 * level)
    td = td_mod.set_data(ch0, dl, cam, p, cap, level)
    td = jax.tree.map(jax.device_put, td)
    C, rows, cols = ch1.shape
    opts = gn.GNOptions.from_params(p, coarse=(level > 0))
    variant = lk._variant(rows, cols, C, cap, lk._bf16_img(C, opts))
    assert variant in ("banded", "hbm"), (rows, cols, C, variant)
    print(f"[{desc_name}] L{level} {rows}x{cols} C={C} K={cap} "
          f"band={lk._band_for(rows, max(cap // 512, 1))} variant={variant}")

    T0 = jnp.eye(4, dtype=jnp.float32)
    runner = lk.make_level_gn(rows, cols, C, cap, opts,
                              interpret=jax.default_backend() == "cpu")
    t0 = time.perf_counter()
    Tk, stats, H6, g6, w, bo = jax.jit(runner)(
        cam, td.points, td.valid, td.pixels, td.jacobians, ch1, T0,
        jnp.asarray(1.0, jnp.float32), jnp.asarray(1e10, jnp.float32),
        td.norm_scale, td.norm_center)
    np.asarray(Tk)
    print(f"[{desc_name}] banded kernel compiled+ran in "
          f"{time.perf_counter() - t0:.1f} s")

    st = gn.run(td, ch1, cam, T0, opts)
    dT = np.abs(np.asarray(Tk) - np.asarray(st.T)).max()
    print(f"[{desc_name}] parity |dT|={dT:.2e} "
          f"iters kernel={int(stats[0])} xla={int(st.num_iters)} "
          f"sigma {float(stats[4]):.4f} vs {float(st.scale):.4f} "
          f"band_overflow={int(bo)}")
    assert dT < 5e-3, dT

    def kern_body(i, x):
        T, s8, *_ = runner(cam, td.points, td.valid, td.pixels,
                           td.jacobians, ch1, T0 + 0.0 * x,
                           jnp.asarray(1.0, jnp.float32),
                           jnp.asarray(1e10, jnp.float32),
                           td.norm_scale, td.norm_center)
        return x + T[0, 3] * 1e-12
    ms_k = loop_time(kern_body)

    def xla_body(i, x):
        st = gn.run(td, ch1, cam, T0 + 0.0 * x, opts)
        return x + st.T[0, 3] * 1e-12
    ms_x = loop_time(xla_body)
    print(f"[{desc_name}] per-run: banded kernel {ms_k:.3f} ms "
          f"vs XLA loop {ms_x:.3f} ms -> "
          f"{'KERNEL WINS' if ms_k < ms_x else 'xla wins'} "
          f"({ms_x / ms_k:.2f}x)")
    return {"desc": desc_name, "kernel_ms": round(ms_k, 4),
            "xla_ms": round(ms_x, 4), "parity_dT": float(dT),
            "band_overflow": int(bo)}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    level = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    out = []
    if which in ("bitplanes", "both"):
        out.append(probe("bitplanes", level))
    if which in ("intensity", "both"):
        out.append(probe("intensity", level))
    import json
    print(json.dumps(out))


if __name__ == "__main__":
    main()
