"""Pallas TPU kernel: fused IRLS weighting + normal-equation reduction.

Fuses the reference's three separate passes — M-estimator weights
(mestimator.cc:242-385), the SSE rank-update of the packed upper-triangular
Hessian (linear_system_builder.cc:140-205) and the weighted residual norm —
into one streaming kernel: residuals and Jacobians flow HBM -> VMEM once,
weights are computed on the VPU, and the 6x6 / 6-vector reductions run on the
MXU per block with a VMEM scratch accumulator across sequential grid steps.

Layout: Jacobians arrive as (6, M) — lanes along the point axis — which is the
transpose of the template storage; the caller reshapes once per keyframe.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bpvo_tpu.solver.mestimator import HUBER_K, TUKEY_T

_BLOCK = 2048


def _weight(u, loss: str):
    if loss == "Tukey":
        x = u / TUKEY_T
        w = (1.0 - x * x)
        return jnp.where(jnp.abs(u) < TUKEY_T, w * w, 0.0)
    if loss == "Huber":
        au = jnp.abs(u)
        return jnp.where(au < HUBER_K, 1.0, HUBER_K / jnp.maximum(au, 1e-20))
    return jnp.ones_like(u)


def _irls_kernel(sigma_ref, J_ref, r_ref, valid_ref, out_ref, acc_ref, *,
                 loss: str):
    k = pl.program_id(0)
    nk = pl.num_programs(0)

    @pl.when(k == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    J = J_ref[:]           # (8, B): rows 0..5 are Jacobian components
    r = r_ref[:]           # (8, B): row 0 is the residual (broadcast)
    v = valid_ref[:]       # (8, B): row 0 is the valid mask (broadcast)
    sigma = sigma_ref[0]
    w = _weight(r / sigma, loss) * v                 # (8, B), rows identical
    Jw = J * w
    # rhs rows: 0..5 = J (rows 6,7 of J are zero padding), 6 = r, 7 = r^2.
    # Row placement via iota+where — .at[].set() lowers to scatter, which
    # Mosaic does not implement (probed on device, docs/PALLAS_TPU.json).
    rid = jax.lax.broadcasted_iota(jnp.int32, J.shape, 0)
    rhs = jnp.where(rid == 6, r, jnp.where(rid == 7, r * r, J))
    block = jax.lax.dot_general(
        Jw, rhs, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)          # (8, 8)
    # block[0:6, 0:6] = J^T W J, block[0:6, 6] = J^T W r; rows 6,7 of block
    # are zero (Jw rows 6,7 are zero padding).  f = sum(w r^2) is placed at
    # [7, 7] with a masked select for the same no-scatter reason.  Column 7
    # of rows 0..5 would accumulate a meaningless sum(w J r^2) — zero it so
    # every cell of `out` is either defined or 0 (ADVICE.md round 2).
    f = jnp.sum(w[0] * r[0] * r[0])
    cid = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    rid128 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    upd = jnp.pad(block, ((0, 0), (0, 120)))
    upd = jnp.where((cid == 7) & (rid128 != 7), 0.0, upd)
    upd = jnp.where((rid128 == 7) & (cid == 7), f, upd)
    acc_ref[:, :] += upd

    @pl.when(k == nk - 1)
    def _():
        out_ref[:, :] = acc_ref[:, :]


def _irls_kernel_w(sigma_ref, J_ref, r_ref, valid_ref, out_ref, w_ref,
                   acc_ref, *, loss: str):
    """Same as ``_irls_kernel`` plus the per-point weights as a second
    output (row 0 of each (8, B) block) — lets the GN loop keep its weights
    state without a separate M-estimator pass."""
    k = pl.program_id(0)
    nk = pl.num_programs(0)

    @pl.when(k == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    J = J_ref[:]
    r = r_ref[:]
    v = valid_ref[:]
    sigma = sigma_ref[0]
    w = _weight(r / sigma, loss) * v
    w_ref[:, :] = w
    Jw = J * w
    rid = jax.lax.broadcasted_iota(jnp.int32, J.shape, 0)
    rhs = jnp.where(rid == 6, r, jnp.where(rid == 7, r * r, J))
    block = jax.lax.dot_general(
        Jw, rhs, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    f = jnp.sum(w[0] * r[0] * r[0])
    cid = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    rid128 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    upd = jnp.pad(block, ((0, 0), (0, 120)))
    upd = jnp.where((cid == 7) & (rid128 != 7), 0.0, upd)
    upd = jnp.where((rid128 == 7) & (cid == 7), f, upd)
    acc_ref[:, :] += upd

    @pl.when(k == nk - 1)
    def _():
        out_ref[:, :] = acc_ref[:, :]


@partial(jax.jit, static_argnames=("loss", "interpret"))
def irls_reduce_w(J6, r, valid, sigma, loss: str = "Tukey",
                  interpret: bool = False):
    """``irls_reduce`` that also returns the per-point weights (M,)."""
    M = r.shape[0]
    block = min(_BLOCK, M)
    pad = (-M) % block
    if pad:
        J6 = jnp.pad(J6, ((0, 0), (0, pad)))
        r = jnp.pad(r, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    Mp = M + pad

    J8 = jnp.pad(J6, ((0, 2), (0, 0)))
    r8 = jnp.broadcast_to(r[None, :], (8, Mp))
    v8 = jnp.broadcast_to(valid[None, :].astype(jnp.float32), (8, Mp))

    out, w8 = pl.pallas_call(
        partial(_irls_kernel_w, loss=loss),
        grid=(Mp // block,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, block), lambda k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block), lambda k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block), lambda k: (0, k), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block), lambda k: (0, k), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, Mp), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        interpret=interpret,
    )(jnp.reshape(sigma.astype(jnp.float32), (1,)), J8, r8, v8)

    H = out[:6, :6]
    g = out[:6, 6]
    f_sq = out[7, 7]
    return H, g, f_sq, w8[0, :M]


@partial(jax.jit, static_argnames=("loss", "interpret"))
def irls_reduce(J6, r, valid, sigma, loss: str = "Tukey",
                interpret: bool = False):
    """Fused weights + reductions.

    J6: (6, M) Jacobians (transposed template layout), r: (M,) residuals,
    valid: (M,) bool, sigma: scalar robust scale.
    Returns (H (6,6), g (6,), f_sq scalar).
    """
    M = r.shape[0]
    block = min(_BLOCK, M)
    pad = (-M) % block
    if pad:
        J6 = jnp.pad(J6, ((0, 0), (0, pad)))
        r = jnp.pad(r, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    Mp = M + pad

    # pack into 8-row slabs (f32 sublane tile) once
    J8 = jnp.pad(J6, ((0, 2), (0, 0)))
    r8 = jnp.broadcast_to(r[None, :], (8, Mp))
    v8 = jnp.broadcast_to(valid[None, :].astype(jnp.float32), (8, Mp))

    out = pl.pallas_call(
        partial(_irls_kernel, loss=loss),
        grid=(Mp // block,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, block), lambda k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block), lambda k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block), lambda k: (0, k), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        interpret=interpret,
    )(jnp.reshape(sigma.astype(jnp.float32), (1,)), J8, r8, v8)

    H = out[:6, :6]
    g = out[:6, 6]
    f_sq = out[7, 7]
    return H, g, f_sq
