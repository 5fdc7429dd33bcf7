"""Image pyramid (reference ``bpvo/image_pyramid.{h,cc}``: level i+1 = pyrDown(level i),
image_pyramid.cc:43-50).

Levels have different static shapes, so the pyramid is a host-side list of
device arrays; each level feeds its own jit-compiled pipeline stage.
"""
from __future__ import annotations

from typing import List

import jax.numpy as jnp

from bpvo_tpu.ops.imgproc import pyr_down


def build(I, n_levels: int) -> List[jnp.ndarray]:
    """Return [level0 (finest) ... level n-1 (coarsest)]."""
    levels = [jnp.asarray(I, jnp.float32)]
    for _ in range(1, n_levels):
        levels.append(pyr_down(levels[-1]))
    return levels


def level_shapes(rows: int, cols: int, n_levels: int):
    shapes = [(rows, cols)]
    for _ in range(1, n_levels):
        r, c = shapes[-1]
        shapes.append(((r + 1) // 2, (c + 1) // 2))
    return shapes
