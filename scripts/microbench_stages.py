"""True device-compute cost per VO stage: repeat each stage N times inside one
XLA program (fori_loop) so the ~1 ms client dispatch floor is amortized away.
Perf investigation tool."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

import bench as bench_mod
from bpvo_tpu import AlgorithmParameters
from bpvo_tpu.vo.device_vo import DeviceVO, _compute_channels_pyr, _build_templates
from bpvo_tpu.ops import descriptors, imgproc, selection
from bpvo_tpu.solver import gauss_newton as gn
from bpvo_tpu.vo import template_data as td_mod


def loop_time(make_body, n=50, reps=5, warmup=2):
    """Time one XLA program that runs body n times (data-dependent chaining)."""
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


def main():
    from bpvo_tpu.types import DescriptorType
    desc = (DescriptorType.BITPLANES if "bitplanes" in sys.argv[1:]
            else DescriptorType.INTENSITY)
    print(f"descriptor: {desc.name}")
    K, baseline, frames = bench_mod.synthesize_sequence(3)
    p = AlgorithmParameters(minSaliency=2.0, numPyramidLevels=4,
                            descriptor=desc,
                            functionTolerance=1e-4, parameterTolerance=1e-6,
                            maxIterations=50)
    vo = DeviceVO(K, baseline, (bench_mod.ROWS, bench_mod.COLS), p)
    img = jax.device_put(jnp.asarray(frames[1][0], jnp.float32))
    dsp = jax.device_put(jnp.asarray(frames[1][1], jnp.float32))
    vo.init(img, dsp)
    templates = vo.state.templates
    channels = _compute_channels_pyr(img, p, 4)
    channels = jax.tree.map(jax.device_put, channels)

    # pyramid
    ms = loop_time(lambda i, x: _compute_channels_pyr(img + x, p, 4)[3].sum())
    print(f"pyramid+descriptors: {ms:.3f} ms")

    # saliency + selection (finest level)
    sal = descriptors.saliency(channels[0])
    def sel_body(i, x):
        s = selection.select_pixels(
            sal + x, dsp, 16384, min_saliency=2.0, nms_radius=1,
            use_nms=True, min_disparity=p.minValidDisparity,
            max_disparity=p.maxValidDisparity, border=3)
        return s.disparity.sum()
    print(f"selection L0 (topk+argsort): {loop_time(sel_body):.3f} ms")

    # full template build, all levels
    def tb_body(i, x):
        t = _build_templates(jax.tree.map(lambda c: c + x, channels), dsp,
                             vo._cams, p, vo._capacities)
        return t[0].points.sum()
    print(f"template build all levels: {loop_time(tb_body, n=20):.3f} ms")

    # GN fixed-iteration per level — BOTH routes (VERDICT r4 item 7: the
    # stage table must reflect the shipped configuration, which runs coarse
    # levels through the whole-level Pallas kernel when BPVO_LEVEL_KERNEL
    # resolves on).  The xla_loop rows use fixed-iteration programs for the
    # fixed/per-iter decomposition; the level_kernel rows time the EXACT
    # production program (production opts, natural convergence) — a fixed-
    # iteration variant would be a different kernel program and hence a
    # fresh tens-of-minutes remote compile per row on this container.
    import dataclasses
    T0 = jnp.eye(4, dtype=jnp.float32)
    kernel_on = gn.level_kernel_enabled()
    print(f"production route: level kernel "
          f"{'ON (bench default on TPU)' if kernel_on else 'OFF'} "
          f"for supported coarse levels")
    for level in range(4):
        per_iter = {}
        for n_it in (1, 5):
            opts = dataclasses.replace(
                vo._opts[level], max_iterations=n_it, function_tolerance=0.0,
                parameter_tolerance=0.0, gradient_tolerance=0.0)
            def gn_body(i, x, l=level, o=opts):
                st = gn.run(templates[l], channels[l], vo._cams[l],
                            T0 + 0.0 * x, o)
                return st.f_norm
            per_iter[n_it] = loop_time(gn_body, n=20)
        ch_l = channels[level]
        K_l = templates[level].pixels.shape[1]
        supported = (level > p.maxTestLevel and gn.level_kernel_supported(
            vo._opts[level], ch_l.shape[0], ch_l.shape[1], ch_l.shape[2],
            K_l))
        row = (f"GN level {level}: xla_loop 1it={per_iter[1]:.3f} ms "
               f"5it={per_iter[5]:.3f} ms -> "
               f"{(per_iter[5]-per_iter[1])/4*1e3:.0f} us/iter "
               f"(cap={templates[level].points.shape[0]})")
        if supported and kernel_on:
            def lk_body(i, x, l=level):
                st = gn.run_level_fused(templates[l], channels[l],
                                        vo._cams[l], T0 + 0.0 * x,
                                        vo._opts[l])
                return st.f_norm
            ms_k = loop_time(lk_body, n=20)
            st = gn.run_level_fused(templates[level], channels[level],
                                    vo._cams[level], T0, vo._opts[level])
            row += (f" | level_kernel {ms_k:.3f} ms/run at "
                    f"{int(st.num_iters)} iters [PRODUCTION]")
        elif supported:
            row += " | level_kernel: supported, disabled by env"
        else:
            row += " | level_kernel: n/a (finest level or outside envelope)"
        print(row)


if __name__ == "__main__":
    main()
