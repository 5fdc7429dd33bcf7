"""Bisect the Mosaic crash in the band+one-hot sampling kernel: compile each
sub-construct separately on the device and record which one dies."""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RESULTS = {}
H, W = 384, 1280
BLOCK = 1024
BAND = 32
rng = np.random.default_rng(0)
IMG = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
U = jnp.asarray(rng.uniform(2, W - 4, BLOCK), jnp.float32)
V = jnp.asarray(np.sort(rng.uniform(2, 30, BLOCK)), jnp.float32)
U8 = jnp.broadcast_to(U[None, :], (8, BLOCK))
V8 = jnp.broadcast_to(V[None, :], (8, BLOCK))


def run_one(name, kernel, out_shape, *args):
    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                      for _ in range(len(args))],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        r = jax.jit(fn)(*args)
        val = float(np.asarray(r).ravel()[0])
        RESULTS[name] = "ok"
        print(f"{name:36s} OK  first={val:.4f}", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = f"{type(e).__name__}: {str(e)[:600]}"
        RESULTS[name + "_error"] = msg
        print(f"{name:36s} FAILED {msg}\n", flush=True)
        return False


# v1: static band slice read + sum
def k_static_slice(img_ref, o_ref):
    band = img_ref[0:BAND, :]
    o_ref[:, :] = jnp.broadcast_to(jnp.sum(band), (8, 128))


# v2: dynamic band slice from a lane-vector min
def k_dyn_slice(v_ref, img_ref, o_ref):
    yi = jnp.floor(v_ref[0, :]).astype(jnp.int32)
    base = jnp.minimum(jnp.min(yi), H - BAND)
    band = img_ref[pl.ds(base, BAND), :]
    o_ref[:, :] = jnp.broadcast_to(jnp.sum(band), (8, 128))


# v3: one-hot build only (W-sublane iota) + reduce
def k_onehot(u_ref, o_ref):
    u = u_ref[0, :]
    xi = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, W - 2)
    xf = u - xi.astype(jnp.float32)
    cid = jax.lax.broadcasted_iota(jnp.int32, (W, BLOCK), 0)
    oh = (jnp.where(cid == xi[None, :], 1.0 - xf[None, :], 0.0)
          + jnp.where(cid == xi[None, :] + 1, xf[None, :], 0.0))
    o_ref[:, :] = oh[:8, :128]


# v4: one-hot + matmul with static band
def k_onehot_matmul(u_ref, img_ref, o_ref):
    u = u_ref[0, :]
    xi = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, W - 2)
    xf = u - xi.astype(jnp.float32)
    cid = jax.lax.broadcasted_iota(jnp.int32, (W, BLOCK), 0)
    oh = (jnp.where(cid == xi[None, :], 1.0 - xf[None, :], 0.0)
          + jnp.where(cid == xi[None, :] + 1, xf[None, :], 0.0))
    band = img_ref[0:BAND, :]
    colmix = jnp.dot(band, oh, preferred_element_type=jnp.float32)
    o_ref[:, :] = colmix[:8, :128]


# v5: row-weight reduce with static rel
def k_rowweight(v_ref, img_ref, o_ref):
    v = v_ref[0, :]
    yi = jnp.floor(v).astype(jnp.int32)
    yf = v - yi.astype(jnp.float32)
    rel = jnp.clip(yi, 0, BAND - 2)
    rid = jax.lax.broadcasted_iota(jnp.int32, (BAND, BLOCK), 0)
    row_w = (jnp.where(rid == rel[None, :], 1.0 - yf[None, :], 0.0)
             + jnp.where(rid == rel[None, :] + 1, yf[None, :], 0.0))
    colmix = jnp.broadcast_to(img_ref[0:BAND, 0:1], (BAND, BLOCK))
    s = jnp.sum(colmix * row_w, axis=0)
    o_ref[:, :] = jnp.broadcast_to(s[None, :128], (8, 128))


def main():
    print(f"devices: {jax.devices()}")
    run_one("v1_static_slice", k_static_slice, (8, 128), IMG)
    run_one("v2_dyn_slice", k_dyn_slice, (8, 128), V8, IMG)
    run_one("v3_onehot", k_onehot, (8, 128), U8)
    run_one("v4_onehot_matmul", k_onehot_matmul, (8, 128), U8, IMG)
    run_one("v5_rowweight", k_rowweight, (8, 128), V8, IMG)
    out = Path(__file__).resolve().parents[1] / "docs" / "PALLAS_TPU.json"
    existing = json.loads(out.read_text()) if out.exists() else {}
    existing["band_bisect"] = RESULTS
    out.write_text(json.dumps(existing, indent=1) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
