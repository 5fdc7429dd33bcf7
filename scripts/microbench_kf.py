"""Decompose the KEYFRAME/template-build path on device (VERDICT r4 item 1).

Round 4 ended with GN levels at ~419 Hz-equivalent cost and named the
amortized keyframe branch (template build + candidate re-estimate, every ~4
frames) as the dominant remaining share — without per-stage numbers.  This
probe applies the microbench_fixed discipline to that branch, per pyramid
level and per descriptor:

  - saliency (gradient-magnitude accumulation over channels)
  - select_pixels (threshold+NMS+top-k+block-balance) given a saliency map
  - back-projection + Hartley normalization
  - stage-2 descriptor/gradient gathers (pixels + CD3/CD5)
  - analytic Jacobian build
  - set_data per level (the whole build) and _build_templates (all levels)
  - the candidate re-estimate (_estimate, production route) at identity init
    vs a measured-motion init (the round-5 warm-start lever)
  - _compute_channels_pyr (per-frame descriptor cost, for context)

Usage: python scripts/microbench_kf.py [bitplanes] [json]
Writes docs/KF_PROFILE.json when "json" is passed.
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
from bpvo_tpu.ops import descriptors, imgproc, selection
from bpvo_tpu.solver import gauss_newton as gn
from bpvo_tpu.vo import template_data as td_mod
from bpvo_tpu.vo import warp as warp_mod
from bpvo_tpu.vo.device_vo import (DeviceVO, _build_templates,
                                   _compute_channels_pyr, _estimate)


def loop_time(make_body, n=20, reps=5, warmup=2):
    """ms per call of make_body(i, x)->x, amortized over a fori_loop."""
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
    write_json = "json" in sys.argv[1:]
    print(f"descriptor: {desc.name}, backend: {jax.default_backend()}")
    import os
    rows = int(os.environ.get("BPVO_KF_ROWS", bench_mod.ROWS))
    cols = int(os.environ.get("BPVO_KF_COLS", bench_mod.COLS))
    K, baseline, frames = bench_mod.synthesize_sequence(3, rows, cols)
    p = AlgorithmParameters(minSaliency=2.0, numPyramidLevels=4,
                            descriptor=desc,
                            functionTolerance=1e-4, parameterTolerance=1e-6,
                            maxIterations=50)
    vo = DeviceVO(K, baseline, (rows, cols), p)
    img = jax.device_put(jnp.asarray(frames[1][0], jnp.float32))
    dsp = jax.device_put(jnp.asarray(frames[1][1], jnp.float32))
    vo.init(img, dsp)
    templates = vo.state.templates
    channels = jax.tree.map(jax.device_put, _compute_channels_pyr(img, p, 4))
    cams = vo._cams
    caps = vo._capacities
    out = {"descriptor": desc.name, "levels": {}}

    # per-frame descriptor pyramid (context: paid on EVERY frame)
    def chan_body(i, x):
        ch = _compute_channels_pyr(img + x * 0, p, 4)
        return x + ch[0][0, 0, 0] * 1e-12
    t_chan = loop_time(chan_body)
    print(f"_compute_channels_pyr (per frame): {t_chan:.3f} ms")
    out["channels_pyr_ms"] = round(t_chan, 4)

    # elementwise-pass baseline: the x-dependency threading adds one image
    # add per stage; subtract this when comparing tiny stages
    def ident_body(i, x):
        return x + jnp.sum(channels[0] + x * 0) * 1e-20
    t_ident = loop_time(ident_body)
    print(f"(x-threading baseline, L0 image add+sum: {t_ident:.3f} ms)")
    out["thread_baseline_ms"] = round(t_ident, 4)

    for level in range(4):
        ch = channels[level]
        cam = cams[level]
        cap = caps[level]
        d_level = imgproc.disparity_at_level(dsp, level)
        d_level = jax.device_put(d_level[:ch.shape[1], :ch.shape[2]])
        C, H, W = ch.shape
        use_nms = H * W >= p.minNumPixelsForNonMaximaSuppression
        border = max(p.nonMaxSuppRadius, 3)
        sal = jax.device_put(descriptors.saliency(ch))
        lv = {}

        def sal_body(i, x):
            return x + descriptors.saliency(ch + x * 0)[0, 0] * 1e-12
        lv["saliency"] = loop_time(sal_body)

        def sel_body(i, x):
            s = selection.select_pixels(
                sal + x * 0, d_level, cap, min_saliency=p.minSaliency,
                nms_radius=p.nonMaxSuppRadius, use_nms=use_nms,
                min_disparity=p.minValidDisparity,
                max_disparity=p.maxValidDisparity, border=border)
            return x + s.num_valid.astype(jnp.float32) * 1e-12
        lv["select_pixels"] = loop_time(sel_body)

        sel = jax.tree.map(jax.device_put, selection.select_pixels(
            sal, d_level, cap, min_saliency=p.minSaliency,
            nms_radius=p.nonMaxSuppRadius, use_nms=use_nms,
            min_disparity=p.minValidDisparity,
            max_disparity=p.maxValidDisparity, border=border))

        def backproj_body(i, x):
            d_safe = jnp.where(sel.valid, sel.disparity + x * 0, 1.0)
            pts = warp_mod.make_points(cam, sel.cols.astype(jnp.float32),
                                       sel.rows.astype(jnp.float32), d_safe)
            dummy = jnp.array([0.0, 0.0, 1.0], pts.dtype)
            pts = jnp.where(sel.valid[:, None], pts, dummy)
            s, c = warp_mod.hartley_normalization(pts, sel.valid)
            return x + s * 1e-12 + pts[0, 0] * 1e-12
        lv["backproject_norm"] = loop_time(backproj_body)

        td = templates[level]
        pts_d = jax.device_put(td.points)
        s_d, c_d = td.norm_scale, td.norm_center

        def gather_body(i, x):
            px = td_mod._gather_at(ch + x * 0, sel.rows, sel.cols)
            gx, gy = td_mod._channel_gradients(ch, sel.rows, sel.cols,
                                               p.gradientEstimation)
            return x + (px[0, 0] + gx[0, 0] + gy[0, 0]) * 1e-12
        lv["desc_gradient_gathers"] = loop_time(gather_body)

        gx0, gy0 = td_mod._channel_gradients(ch, sel.rows, sel.cols,
                                             p.gradientEstimation)
        gx0, gy0 = jax.device_put(gx0), jax.device_put(gy0)

        def jac_body(i, x):
            J = warp_mod.jacobian(cam, pts_d, gx0 + x * 0, gy0, s_d, c_d)
            return x + J[0, 0, 0] * 1e-12
        lv["jacobian_build"] = loop_time(jac_body)

        def setdata_body(i, x):
            t = td_mod.set_data(ch + x * 0, d_level, cam, p, cap, level)
            return x + t.num_valid.astype(jnp.float32) * 1e-12
        lv["set_data_total"] = loop_time(setdata_body)

        print(f"L{level} cap={cap} C={C} {H}x{W}: "
              + " ".join(f"{k}={v:.3f}" for k, v in lv.items()) + " ms")
        out["levels"][level] = {k: round(v, 4) for k, v in lv.items()}

    def build_all_body(i, x):
        ts = _build_templates(jax.tree.map(lambda a: a + x * 0, channels),
                              dsp, cams, p, caps)
        return x + ts[0].num_valid.astype(jnp.float32) * 1e-12
    t_build = loop_time(build_all_body)
    print(f"_build_templates (all levels): {t_build:.3f} ms")
    out["build_templates_ms"] = round(t_build, 4)

    # ---- the candidate re-estimate (production route) ----------------
    # identity init (what round 4 ships) vs the measured-motion init
    # T_est ~ one-frame step (the round-5 warm-start lever: at the keyframe
    # event, candidate->current = T_est @ inv(T_kf) is already computed)
    from bpvo_tpu.core import se3
    step_twist = jnp.asarray([0.0005, 0.001, 0.0008, 0.006, 0.002, 0.03],
                             jnp.float32)
    T_step = jax.device_put(se3.exp(step_twist))
    ch1 = jax.tree.map(jax.device_put,
                       _compute_channels_pyr(
                           jax.device_put(jnp.asarray(frames[2][0],
                                                      jnp.float32)), p, 4))

    for name, T_init in (("identity", jnp.eye(4, dtype=jnp.float32)),
                         ("warm", T_step)):
        def est_body(i, x, T_init=T_init):
            T, iters, fs, frac, H6, w, bo = _estimate(
                templates, jax.tree.map(lambda a: a + x * 0, ch1), cams,
                T_init, vo._opts, p.maxTestLevel, p.goodPointThreshold,
                p.minNumPixelsToWork)
            return x + T[0, 3] * 1e-12
        t_est = loop_time(est_body, n=10)
        T, iters, fs, frac, H6, w, bo = _estimate(
            templates, ch1, cams, T_init, vo._opts, p.maxTestLevel,
            p.goodPointThreshold, p.minNumPixelsToWork)
        its = np.asarray(iters).tolist()
        print(f"re-estimate [{name} init]: {t_est:.3f} ms, iters={its}")
        out[f"reestimate_{name}"] = {"ms": round(t_est, 4), "iters": its}

    if write_json:
        path = Path(__file__).resolve().parents[1] / "docs" / \
            f"KF_PROFILE_{desc.name}.json"
        path.write_text(json.dumps(out, indent=1))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
