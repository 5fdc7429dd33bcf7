"""Probe real-TPU viability + speed of the Pallas kernels vs their jnp paths.

VERDICT.md item 3 step 1: compile (not interpret) the Pallas kernels on the
actual device and record ms against the XLA/jnp equivalents, so production
defaults are measured rather than assumed.  Also answers the key fused-kernel
design question: how fast is an *in-kernel* gather from VMEM-resident
channels vs XLA's HBM gather (reference hot path: photo_error.cc:336-459 +
linear_system_builder.cc:140-205).

Writes results to docs/PALLAS_TPU.json and prints a table.

Usage:  python scripts/tpu_kernel_probe.py            # on the real device
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RESULTS = {}


def loop_time(body, n=100, reps=3, warmup=1):
    """ms per call of ``body(carry)->carry`` amortized inside one fori_loop
    dispatch (this backend's per-dispatch RTT is ~40 ms; block_until_ready
    does not block, so completion is forced by fetching)."""
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
    print(f"{name:42s} {ms:9.4f} ms  {note}")


# ---------------------------------------------------------------------------
# 1. gather probes: XLA take vs in-Pallas-kernel gather from VMEM
# ---------------------------------------------------------------------------

H, W = 376, 1241
HW = H * W
N = 16384
rng = np.random.default_rng(0)
IDX = jnp.asarray(rng.integers(0, HW - W - 2, N, dtype=np.int32))


def xla_take_probes():
    for tc in (4, 32):
        data = jnp.asarray(rng.standard_normal((HW, tc)), jnp.float32)

        def body(c, data=data):
            i0 = (IDX + c.astype(jnp.int32) % 7).astype(jnp.int32)
            g = jnp.take(data, i0, axis=0)
            return c + g[0, 0]

        record(f"xla_take_rows_{tc}f32", loop_time(body),
               f"{N} rows of {tc} f32 from ({HW},{tc})")


def _gather_kernel(idx_ref, data_ref, out_ref):
    # data (8, HW) resident in VMEM; idx (8, N/8) int32; out (8, N/8)
    out_ref[:, :] = jnp.take_along_axis(data_ref[:, :], idx_ref[:, :], axis=1)


def pallas_inkernel_gather():
    """Gather N values from an (8, HW) VMEM-resident array inside one kernel.
    take_along_axis on the lane axis is the Mosaic-supported dynamic gather."""
    C8 = 8
    data = jnp.asarray(rng.standard_normal((C8, HW)), jnp.float32)
    idx2 = IDX.reshape(C8, N // C8)

    fn = pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((C8, N // C8), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    jitted = jax.jit(fn)

    def body(c):
        i0 = (idx2 + c.astype(jnp.int32) % 7).astype(jnp.int32)
        g = jitted(i0, data)
        return c + g[0, 0]

    record("pallas_vmem_gather_16k", loop_time(body),
           f"{N} f32 from VMEM-resident ({C8},{HW})")


# ---------------------------------------------------------------------------
# 2. existing Pallas kernels, compiled
# ---------------------------------------------------------------------------

def probe_irls():
    from bpvo_tpu.ops.pallas.irls_kernel import irls_reduce
    from bpvo_tpu.solver import linear_system, mestimator
    from bpvo_tpu.types import LossFunctionType

    M = 8 * N  # bitplanes-scale reduction
    J6 = jnp.asarray(rng.standard_normal((6, M)), jnp.float32)
    r = jnp.asarray(rng.standard_normal(M), jnp.float32)
    valid = jnp.asarray(rng.random(M) > 0.1)
    sigma = jnp.asarray(1.3, jnp.float32)

    def body_pallas(c):
        Hm, g, f = irls_reduce(J6, r + c, valid, sigma, "Tukey")
        return c + Hm[0, 0] * 1e-9

    def body_jnp(c):
        w = mestimator.compute_weights(
            LossFunctionType.TUKEY, (r + c)[None, :], valid[None, :], sigma)
        Hm, g, f = linear_system.build(
            J6.T[None], (r + c)[None, :], w)
        return c + Hm[0, 0] * 1e-9

    record("irls_reduce_pallas_131k", loop_time(body_pallas))
    record("irls_reduce_jnp_131k", loop_time(body_jnp))


def probe_census():
    from bpvo_tpu.ops.pallas.census_kernel import census_planes_pallas as pl_census
    from bpvo_tpu.ops import census as census_mod

    img = jnp.asarray(rng.integers(0, 255, (H, W)), jnp.float32)

    def body_pallas(c):
        planes = pl_census(img + c * 0)
        return c + planes[0, 0, 0].astype(jnp.float32) * 1e-9

    def body_jnp(c):
        planes = census_mod.census_planes(img + c * 0)
        return c + planes[0, 0, 0].astype(jnp.float32) * 1e-9

    record("census_planes_pallas", loop_time(body_pallas))
    record("census_planes_jnp", loop_time(body_jnp))


# ---------------------------------------------------------------------------
# 3. fused GN-iteration kernel vs the jnp linearize path
# ---------------------------------------------------------------------------

def probe_fused_iteration():
    import bench as bench_mod
    from bpvo_tpu import AlgorithmParameters
    from bpvo_tpu.ops import interp as interp_mod
    from bpvo_tpu.solver import gauss_newton as gn
    from bpvo_tpu.types import DescriptorType
    from bpvo_tpu.vo.device_vo import DeviceVO, _compute_channels_pyr

    K, baseline, frames = bench_mod.synthesize_sequence(3)
    for desc, name in ((DescriptorType.INTENSITY, "intensity"),
                       (DescriptorType.BITPLANES, "bitplanes")):
        p = AlgorithmParameters(minSaliency=2.0, numPyramidLevels=4,
                                descriptor=desc, maxIterations=50,
                                functionTolerance=1e-4,
                                parameterTolerance=1e-6)
        vo = DeviceVO(K, baseline, (bench_mod.ROWS, bench_mod.COLS), p)
        img = jax.device_put(jnp.asarray(frames[1][0], jnp.float32))
        dsp = jax.device_put(jnp.asarray(frames[1][1], jnp.float32))
        vo.init(img, dsp)
        td = vo.state.templates[0]
        channels = jax.device_put(
            _compute_channels_pyr(img, p, 4)[0])
        cam = vo._cams[0]
        opts = vo._opts[0]
        packed = jax.jit(partial(interp_mod.pack_taps,
                                 method=opts.interp))(channels)
        T0 = jnp.eye(4, dtype=jnp.float32)
        sigma = jnp.asarray(1.0, jnp.float32)
        dscale = jnp.asarray(1e10, jnp.float32)

        def body_jnp(c, td=td, channels=channels, cam=cam, packed=packed,
                     opts=opts):
            T = T0.at[0, 3].add(c * 1e-6)
            H_, g, f, s, d, w, _oob = gn._linearize(
                td, channels, cam, T, sigma, dscale, opts, packed=packed)
            return c + f * 1e-9

        record(f"linearize_jnp_L0_{name}", loop_time(body_jnp))

        try:
            from bpvo_tpu.ops.pallas import gn_kernel

            jp = gn_kernel.pack_template(td.pixels, td.jacobians)
            jps = gn_kernel.pack_template_stacked(td.pixels, td.jacobians)

            def body_fused(c, td=td, channels=channels, cam=cam, opts=opts,
                           jp=jp):
                T = T0.at[0, 3].add(c * 1e-6)
                H_, g, f_sq, r0, w, ok = gn_kernel.fused_linearize(
                    td, channels, cam, T, sigma, loss=opts.loss, jp=jp,
                    stacked=False)
                return c + f_sq * 1e-9

            record(f"linearize_fused_L0_{name}", loop_time(body_fused))

            def body_stacked(c, td=td, channels=channels, cam=cam, opts=opts,
                             jps=jps):
                T = T0.at[0, 3].add(c * 1e-6)
                H_, g, f_sq, r0, w, ok = gn_kernel.fused_linearize(
                    td, channels, cam, T, sigma, loss=opts.loss, jp=jps,
                    stacked=True)
                return c + f_sq * 1e-9

            record(f"linearize_stacked_L0_{name}", loop_time(body_stacked))

            # compiled-on-device numeric parity vs the jnp path at the same
            # pose/sigma (the interpret-mode tests cover CPU; this covers the
            # actual Mosaic lowering)
            T = T0
            # delta_scale=0 -> both paths use the SAME given sigma (no
            # in-call re-estimation), so outputs are directly comparable
            Hj, gj, fj, _s, _d, wj, _o = jax.jit(
                lambda td_, ch_, cam_, T_, s_: gn._linearize(
                    td_, ch_, cam_, T_, s_, jnp.asarray(0.0, jnp.float32),
                    opts, packed=packed))(td, channels, cam, T, sigma)
            for label, stk, jpv in (("fused", False, jp),
                                    ("stacked", True, jps)):
                Hf, gf, ff_sq, _r0, wf, _ok = jax.jit(
                    partial(gn_kernel.fused_linearize, loss=opts.loss,
                            stacked=stk))(td, channels, cam, T, sigma, jp=jpv)
                dH = float(jnp.max(jnp.abs(Hf - Hj)) / jnp.max(jnp.abs(Hj)))
                dg = float(jnp.max(jnp.abs(gf - gj)) /
                           jnp.maximum(jnp.max(jnp.abs(gj)), 1e-20))
                df = (abs(float(jnp.sqrt(ff_sq) - fj))
                      / max(abs(float(fj)), 1e-20))
                RESULTS[f"{label}_vs_jnp_reldiff_{name}"] = {
                    "H": round(dH, 7), "g": round(dg, 7), "f": round(df, 7)}
                print(f"{label}-vs-jnp rel diff ({name}): H {dH:.2e} "
                      f"g {dg:.2e} f {df:.2e}")
        except Exception as e:  # kernel may not exist/compile yet
            print(f"fused kernel ({name}): {type(e).__name__}: {e}")
        del vo


def probe_sgm():
    """SGM 4-direction aggregation: Pallas whole-direction kernel vs the
    lax.scan-per-step lowering, at KITTI-ish stereo shape."""
    from bpvo_tpu.data import stereo
    from bpvo_tpu.ops.pallas.sgm_kernel import aggregate_4dir

    Hs, Ws, D = 376, 640, 64
    cost = jnp.asarray(rng.random((Hs, Ws, D)) * 8, jnp.float32)

    def body_pallas(c):
        a = aggregate_4dir(cost + c * 0, 1.0, 8.0)
        return c + a[0, 0, 0] * 1e-9

    def body_scan(c):
        a = stereo._aggregate_4dir_scan(cost + c * 0, 1.0, 8.0)
        return c + a[0, 0, 0] * 1e-9

    record("sgm_aggregate4_pallas", loop_time(body_pallas, n=20))
    record("sgm_aggregate4_scan", loop_time(body_scan, n=20))


def main():
    print(f"devices: {jax.devices()}")
    steps = [("xla_take", xla_take_probes),
             ("pallas_gather", pallas_inkernel_gather),
             ("irls", probe_irls),
             ("census", probe_census),
             ("sgm", probe_sgm),
             ("fused_iter", probe_fused_iteration)]
    only = sys.argv[1:] or None
    for name, fn in steps:
        if only and name not in only:
            continue
        try:
            fn()
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}")
            RESULTS[name + "_error"] = f"{type(e).__name__}: {e}"
    out = Path(__file__).resolve().parents[1] / "docs" / "PALLAS_TPU.json"
    existing = {}
    if out.exists():
        existing = json.loads(out.read_text())
    existing.update(RESULTS)
    out.write_text(json.dumps(existing, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
