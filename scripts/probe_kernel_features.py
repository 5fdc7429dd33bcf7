"""Probe Mosaic support for the primitives the in-kernel coarse-GN loop
needs (round 4): lax.while_loop with scalar carry, scalar sqrt/divide
chains (the 6x6 Cholesky), and a small dependent matmul chain inside one
kernel.  Each probe compiles standalone so a failure names the missing
primitive rather than killing a big kernel build."""
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


def run(name, fn, *args):
    try:
        t0 = time.perf_counter()
        out = np.asarray(jax.jit(fn)(*args))
        dt = time.perf_counter() - t0
        RESULTS[name] = "ok"
        print(f"{name}: ok ({dt:.1f}s incl compile) sample={out.ravel()[:3]}")
        return out
    except Exception as e:
        msg = " ".join(str(e).split())[:140]
        RESULTS[name] = f"FAIL {msg}"
        print(f"{name}: FAIL {msg}")
        return None


# 1. while_loop with (scalar, vector) carry inside a kernel
def k_while(x_ref, o_ref):
    def cond(c):
        i, v = c
        return i < 7

    def body(c):
        i, v = c
        return i + 1, v * 1.5 + 1.0

    i, v = jax.lax.while_loop(cond, body, (jnp.asarray(0, jnp.int32),
                                           x_ref[:, :]))
    o_ref[:, :] = v + i.astype(jnp.float32)


# 2. scalar chain: unrolled 3x3 Cholesky-ish with sqrt/div on SMEM scalars
def k_scalar_chain(h_ref, o_ref):
    a, b, c = h_ref[0], h_ref[1], h_ref[2]
    l0 = jnp.sqrt(jnp.maximum(a, 1e-20))
    l1 = b / l0
    l2 = jnp.sqrt(jnp.maximum(c - l1 * l1, 1e-20))
    o_ref[0] = l0
    o_ref[1] = l1
    o_ref[2] = l2


# 3. dependent matmul chain: 5 sequential (8,128)@(128,128) in one kernel
def k_matmul_chain(a_ref, b_ref, o_ref):
    x = a_ref[:, :]
    for _ in range(5):
        x = jax.lax.dot_general(x, b_ref[:, :],
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        x = x * 1e-2
    o_ref[:, :] = x


def main():
    print(f"devices: {jax.devices()}")
    x = jnp.ones((8, 128), jnp.float32)
    run("pallas_while_loop", lambda x: pl.pallas_call(
        k_while, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x), x)

    h = jnp.asarray([4.0, 2.0, 5.0], jnp.float32)
    run("pallas_scalar_chain", lambda h: pl.pallas_call(
        k_scalar_chain, out_shape=jax.ShapeDtypeStruct((3,), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM))(h), h)

    a = jnp.ones((8, 128), jnp.float32)
    b = jnp.ones((128, 128), jnp.float32) * 0.1
    run("pallas_matmul_chain", lambda a, b: pl.pallas_call(
        k_matmul_chain, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(a, b), a, b)

    import json
    out = Path(__file__).resolve().parents[1] / "docs" / "PALLAS_TPU.json"
    existing = json.loads(out.read_text()) if out.exists() else {}
    existing["kernel_feature_probes"] = RESULTS
    out.write_text(json.dumps(existing, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
