"""Probe every viable TPU strategy for the warped-sampling gather — the one
irregular memory access in the VO hot loop (reference photo_error.cc:336-459).

Candidates measured against the production XLA packed-taps gather:
  1. xla packed-taps jnp.take (production today, f32 and bf16 rows)
  2. Pallas in-kernel ``jnp.take_along_axis`` along lanes from a VMEM-resident
     array, at several lane extents (Mosaic DynamicGatherOp support probe)
  3. Pallas band + one-hot bilinear: per point-block, dynamic-slice a row band
     of the VMEM image, then row-mix via 2-hot MXU matmul and column-mix via
     2-hot VPU masked reduce — no gather primitive at all.

Writes results into docs/PALLAS_TPU.json (merged).
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

H, W = 384, 1280          # KITTI frame padded to tiles
HW = H * W
N = 16384                  # L0 template point count
BAND = 32                  # rows per point-block band
BLOCK = 1024               # points per block

rng = np.random.default_rng(0)


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
    RESULTS[name] = round(float(ms), 4)
    print(f"{name:44s} {ms:9.4f} ms  {note}", flush=True)


def fail(name, e):
    msg = f"{type(e).__name__}: {str(e)[:200]}"
    RESULTS[name + "_error"] = msg
    print(f"{name:44s} FAILED {msg}", flush=True)


# deterministic "warped" coordinates: raster-ordered points + smooth flow
_base_rows = np.sort(rng.integers(2, H - 4, N)).astype(np.int32)
_base_cols = rng.integers(2, W - 4, N).astype(np.int32)
U = jnp.asarray(_base_cols + rng.uniform(-3, 3, N), jnp.float32)
V = jnp.asarray(_base_rows + rng.uniform(-3, 3, N), jnp.float32)
IMG = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)


# ---------------------------------------------------------------------------
# 1. XLA packed-taps baseline (what production uses today)
# ---------------------------------------------------------------------------

def xla_packed_taps(dtype, tag):
    flat = IMG.reshape(-1)
    taps = jnp.stack([jnp.roll(flat, -(dy * W + dx))
                      for dy in (0, 1) for dx in (0, 1)], 1).astype(dtype)

    def body(c):
        u = U + c * 1e-6
        v = V + c * 1e-6
        xi = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, W - 2)
        yi = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, H - 2)
        xf = (u - xi.astype(jnp.float32))
        yf = (v - yi.astype(jnp.float32))
        g = jnp.take(taps, yi * W + xi, axis=0).astype(jnp.float32)  # (N,4)
        out = ((1 - yf) * ((1 - xf) * g[:, 0] + xf * g[:, 1])
               + yf * ((1 - xf) * g[:, 2] + xf * g[:, 3]))
        return c + out[0] * 1e-9

    record(f"xla_packed_taps_{tag}", loop_time(body), f"N={N} bilinear")


# ---------------------------------------------------------------------------
# 2. Pallas take_along_axis lane-gather probes
# ---------------------------------------------------------------------------

def _taa_kernel(idx_ref, data_ref, out_ref):
    out_ref[:, :] = jnp.take_along_axis(data_ref[:, :], idx_ref[:, :], axis=1)


def pallas_taa(lanes, rows=8):
    """Gather rows x (N/rows) values from a (rows, lanes) VMEM array."""
    name = f"pallas_taa_lanes{lanes}"
    try:
        data = jnp.asarray(rng.standard_normal((rows, lanes)), jnp.float32)
        npts = N // rows
        idx0 = jnp.asarray(rng.integers(0, lanes, (rows, npts)), jnp.int32)
        fn = pl.pallas_call(
            _taa_kernel,
            out_shape=jax.ShapeDtypeStruct((rows, npts), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        jitted = jax.jit(fn)

        def body(c):
            i0 = (idx0 + c.astype(jnp.int32) % 3)
            g = jitted(i0, data)
            return c + g[0, 0] * 1e-9

        record(name, loop_time(body), f"{N} f32 from ({rows},{lanes}) VMEM")
    except Exception as e:  # noqa: BLE001
        fail(name, e)


# ---------------------------------------------------------------------------
# 3. Pallas band + one-hot bilinear sampler (gather-free)
# ---------------------------------------------------------------------------

def _band_kernel(u_ref, v_ref, img_ref, out_ref):
    """One point-block per grid step, points kept on LANES throughout:
      1. dynamic-slice a BAND-row window of the VMEM-resident image around the
         block's min warped row;
      2. bilinear in x: 2-hot one-hot matrix (W, BLOCK) from iota compares,
         band @ onehot on the MXU -> (BAND, BLOCK) column mix;
      3. bilinear in y: 2-hot row weights from a sublane iota compare, VPU
         multiply + sublane reduce -> (BLOCK,).
    No gather primitive anywhere."""
    u = u_ref[0, 0, :]                     # (BLOCK,) lanes
    v = v_ref[0, 0, :]
    xi = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, W - 2)
    yi = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, H - 2)
    xf = u - xi.astype(jnp.float32)
    yf = v - yi.astype(jnp.float32)

    base = jnp.minimum(jnp.min(yi), H - BAND)
    band = img_ref[pl.ds(base, BAND), :]           # (BAND, W)

    # x selection + x interpolation on the MXU
    cid = jax.lax.broadcasted_iota(jnp.int32, (W, BLOCK), 0)
    onehot_x = (jnp.where(cid == xi[None, :], 1.0 - xf[None, :], 0.0)
                + jnp.where(cid == xi[None, :] + 1, xf[None, :], 0.0))
    colmix = jnp.dot(band, onehot_x,
                     preferred_element_type=jnp.float32)  # (BAND, BLOCK)

    # y selection + y interpolation on the VPU (sublane iota compare + reduce)
    rel = jnp.clip(yi - base, 0, BAND - 2)
    rid = jax.lax.broadcasted_iota(jnp.int32, (BAND, BLOCK), 0)
    row_w = (jnp.where(rid == rel[None, :], 1.0 - yf[None, :], 0.0)
             + jnp.where(rid == rel[None, :] + 1, yf[None, :], 0.0))
    out_ref[0, 0, :] = jnp.sum(colmix * row_w, axis=0)


def pallas_band_onehot():
    name = "pallas_band_onehot_bilinear"
    try:
        nb = N // BLOCK
        fn = pl.pallas_call(
            _band_kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, 8, BLOCK), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, BLOCK), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),   # whole image resident
            ],
            out_specs=pl.BlockSpec((1, 8, BLOCK), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nb, 8, BLOCK), jnp.float32),
        )
        jitted = jax.jit(fn)
        u2 = jnp.broadcast_to(U.reshape(nb, 1, BLOCK), (nb, 8, BLOCK))
        v2 = jnp.broadcast_to(V.reshape(nb, 1, BLOCK), (nb, 8, BLOCK))

        def body(c):
            g = jitted(u2 + c * 1e-6, v2 + c * 1e-6, IMG)
            return c + g[0, 0, 0] * 1e-9

        ms = loop_time(body)
        record(name, ms, f"N={N} block={BLOCK} band={BAND}")

        # correctness vs the XLA path
        g = np.asarray(jitted(u2, v2, IMG))[:, 0, :].reshape(-1)
        xi = np.clip(np.floor(np.asarray(U)).astype(np.int64), 0, W - 2)
        yi = np.clip(np.floor(np.asarray(V)).astype(np.int64), 0, H - 2)
        xf = np.asarray(U) - xi
        yf = np.asarray(V) - yi
        im = np.asarray(IMG)
        ref = ((1 - yf) * ((1 - xf) * im[yi, xi] + xf * im[yi, xi + 1])
               + yf * ((1 - xf) * im[yi + 1, xi] + xf * im[yi + 1, xi + 1]))
        err = float(np.max(np.abs(g - ref)))
        RESULTS[name + "_maxerr"] = err
        print(f"    max err vs scalar bilinear: {err:.2e}")
    except Exception as e:  # noqa: BLE001
        fail(name, e)


def main():
    print(f"devices: {jax.devices()}")
    steps = [
        ("xla_f32", lambda: xla_packed_taps(jnp.float32, "f32")),
        ("xla_bf16", lambda: xla_packed_taps(jnp.bfloat16, "bf16")),
        ("taa_1k", lambda: pallas_taa(1024)),
        ("taa_16k", lambda: pallas_taa(16384)),
        ("taa_flat", lambda: pallas_taa(HW)),
        ("band", pallas_band_onehot),
    ]
    only = sys.argv[1:] or None
    for name, fn in steps:
        if only and name not in only:
            continue
        try:
            fn()
        except Exception as e:  # noqa: BLE001
            fail(name, e)
    out = Path(__file__).resolve().parents[1] / "docs" / "PALLAS_TPU.json"
    existing = json.loads(out.read_text()) if out.exists() else {}
    existing.update(RESULTS)
    out.write_text(json.dumps(existing, indent=1) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
