"""Pallas TPU kernel for SGM scanline cost aggregation.

The semi-global matching recurrence
    L(p, d) = C(p, d) + min( L(p-1, d),
                             L(p-1, d+-1) + P1,
                             min_d' L(p-1, d') + P2 ) - min_d' L(p-1, d')
is sequential along a scanline.  Lowered through ``lax.scan`` XLA emits one
tiny kernel per scan step (W ~ 1241 launches per direction); here the whole
direction is ONE Pallas kernel: the (H, D) carry lives in VMEM scratch, which
persists across the sequential TPU grid steps, and each grid step streams one
(H, D) cost slab from HBM through the recurrence on the VPU.

Counterpart of the reference's vendored SGM/RSGM aggregation loops
(rsgm.cc — hand-written SSE over scanlines; sgm.cc) re-designed for the VPU:
the (H, D) slab is the vector axis instead of 16-pixel SSE chunks.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _aggregate_kernel(cost_ref, out_ref, carry_ref, *, p1: float, p2: float):
    """Grid dimension scans the scanline axis; blocks are (1, H, D) slabs —
    the trailing (H, D) pair is the hardware-tiled (sublane, lane) layout."""
    x = pl.program_id(0)
    c = cost_ref[0]  # (H, D)

    @pl.when(x == 0)
    def _():
        carry_ref[:, :] = c
        out_ref[0] = c

    @pl.when(x > 0)
    def _():
        prev = carry_ref[:, :]
        m = jnp.min(prev, axis=-1, keepdims=True)
        up = jnp.concatenate([prev[:, :1] + p1, prev[:, :-1] + p1], axis=-1)
        dn = jnp.concatenate([prev[:, 1:] + p1, prev[:, -1:] + p1], axis=-1)
        best = jnp.minimum(jnp.minimum(prev, up), jnp.minimum(dn, m + p2))
        new = c + best - m
        carry_ref[:, :] = new
        out_ref[0] = new


@partial(jax.jit, static_argnames=("p1", "p2", "interpret"))
def aggregate_direction(cost, p1: float, p2: float, interpret: bool = False):
    """Aggregate along axis 1 (left-to-right) of a (H, W, D) cost volume."""
    H, W, D = cost.shape
    cost_w = jnp.swapaxes(cost, 0, 1)  # (W, H, D): scan axis leading
    out = pl.pallas_call(
        partial(_aggregate_kernel, p1=p1, p2=p2),
        grid=(W,),
        in_specs=[pl.BlockSpec((1, H, D), lambda x: (x, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, D), lambda x: (x, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W, H, D), cost.dtype),
        scratch_shapes=[pltpu.VMEM((H, D), cost.dtype)],
        interpret=interpret,
    )(cost_w)
    return jnp.swapaxes(out, 0, 1)


def aggregate_4dir(cost, p1: float, p2: float, interpret: bool = False):
    """Sum of 4 directional aggregations (left/right/up/down) of (H, W, D)."""
    agg = aggregate_direction(cost, p1, p2, interpret)
    agg = agg + aggregate_direction(cost[:, ::-1], p1, p2, interpret)[:, ::-1]
    cost_t = jnp.swapaxes(cost, 0, 1)
    v = aggregate_direction(cost_t, p1, p2, interpret)
    v = v + aggregate_direction(cost_t[:, ::-1], p1, p2, interpret)[:, ::-1]
    return agg + jnp.swapaxes(v, 0, 1)
