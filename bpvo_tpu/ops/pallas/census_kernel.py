"""Pallas TPU kernel: census transform -> 8 bit-plane channels in one pass.

The reference computes a packed u8 census with SSE (16 px/instruction,
census.cc:42-57) and then unpacks bits into float channels per-channel with a
parallel_for (bitplanes_descriptor.cc:84-91).  On TPU the pack/unpack round
trip is pure overhead: this kernel emits the 8 comparison planes directly,
one (8, H, W) write, image resident in VMEM (a full 376x1241 f32 frame is
1.9 MB — comfortably under the ~16 MB VMEM budget).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bpvo_tpu.ops.census import NEIGHBOR_OFFSETS


def _census_kernel(img_ref, out_ref):
    # one census bit-plane per grid step: the full (8,H,W) output in a single
    # block overflows VMEM at KITTI size (probed on device: 16.88M > 16M,
    # docs/PALLAS_TPU.json round 3) — image stays resident, planes stream out
    b = pl.program_id(0)
    I = img_ref[:]
    H, W = I.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    border = ((row > 0) & (row < H - 1) & (col > 0) & (col < W - 1))

    def make(dy, dx):
        def branch(_):
            # pltpu.roll requires non-negative shifts
            return pltpu.roll(pltpu.roll(I, (-dy) % H, 0), (-dx) % W, 1)
        return branch

    shifted = jax.lax.switch(
        b, [make(dy, dx) for dy, dx in NEIGHBOR_OFFSETS], None)
    plane = jnp.where((shifted >= I) & border, 1.0, 0.0)
    out_ref[0] = plane.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def census_planes_pallas(I, interpret: bool = False):
    """(H, W) image -> (8, H, W) float32 {0,1} census planes."""
    I = jnp.asarray(I, jnp.float32)
    H, W = I.shape
    return pl.pallas_call(
        _census_kernel,
        grid=(8,),
        in_specs=[pl.BlockSpec((H, W), lambda b: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, H, W), jnp.float32),
        interpret=interpret,
    )(I)
