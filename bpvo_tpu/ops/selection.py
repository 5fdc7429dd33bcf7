"""Semi-dense pixel selection: saliency threshold + non-maxima suppression +
disparity gating, into a fixed-capacity top-K bucket.

Counterpart of the reference's selection scan in ``bpvo/template_data.cc:39-89``:
  - border exclusion: border = max(nonMaxSuppRadius, 3), pixels in
    [border, rows-border-1) x [border, cols-border-1)
  - saliency >= minSaliency and strict 3x3 local max (NMS enabled only when
    rows*cols >= minNumPixelsForNonMaximaSuppression)
  - disparity in [minValidDisparity, maxValidDisparity], sampled from the
    full-resolution disparity map with stride (1 << pyr_level)
  - the reference then truncates to a multiple of 16 for SSE; XLA needs static
    shapes, so we instead select the top-``capacity`` pixels by saliency and
    carry a valid mask (padding slots are masked out of every reduction).

When more than ``capacity`` pixels pass the gates we keep the most salient ones
(the reference keeps scan-order — top-K is at least as informative); when fewer
pass, the remainder are masked padding.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bpvo_tpu.ops import imgproc


class Selection(NamedTuple):
    rows: jnp.ndarray   # (K,) int32 y coordinate per selected pixel
    cols: jnp.ndarray   # (K,) int32 x coordinate
    disparity: jnp.ndarray  # (K,) float32
    valid: jnp.ndarray  # (K,) bool — False for padding slots
    num_valid: jnp.ndarray  # () int32


def capacity_for_level(p, rows: int, cols: int, level: int) -> int:
    """Static per-level point capacity: level l gets capacity >> 2l (images shrink
    4x per level), floored at pointCapacityMin and at the pixel count."""
    cap = max(p.pointCapacity >> (2 * level), p.pointCapacityMin)
    # can't select more pixels than exist inside the border
    return int(min(cap, rows * cols))


def select_pixels(saliency, disparity, capacity: int, *,
                  min_saliency: float, nms_radius: int, use_nms: bool,
                  min_disparity: float, max_disparity: float,
                  border: int) -> Selection:
    """Select up to ``capacity`` pixels. All args after saliency/disparity are
    static Python values (jit-specialized)."""
    H, W = saliency.shape

    ok = saliency >= min_saliency
    if use_nms and nms_radius > 0:
        ok &= imgproc.is_local_max(saliency, nms_radius)
    ok &= (disparity >= min_disparity) & (disparity <= max_disparity)

    # border exclusion (template_data.cc:52-57: y,x in [border, dim - border - 1))
    bm = jnp.zeros((H, W), bool)
    if H - 2 * border - 1 > 0 and W - 2 * border - 1 > 0:
        bm = bm.at[border:H - border - 1, border:W - border - 1].set(True)
    ok &= bm

    score = jnp.where(ok, saliency, -jnp.inf).reshape(-1)
    # TPU: approx_max_k (per-lane partial reduction + candidate top-k) is the
    # hardware-native top-k — the exact lax.top_k sort over H*W scores was
    # the single most expensive selection stage (1.44 ms at KITTI L0,
    # docs/PERFORMANCE.md round 3).  Selection is a saliency heuristic, so a
    # ~0.95-recall candidate set is semantically equivalent: the ~5% misses
    # are near-threshold pixels swapped for other near-threshold pixels.
    # BPVO_EXACT_TOPK=1 restores the exact path (and CPU always uses it).
    import os as _os
    if (jax.default_backend() == "tpu"
            and _os.environ.get("BPVO_EXACT_TOPK", "0") != "1"):
        vals, idx = jax.lax.approx_max_k(score, capacity,
                                         recall_target=0.95)
    else:
        vals, idx = jax.lax.top_k(score, capacity)
    valid = vals > -jnp.inf
    # re-sort the selected pixels into raster order: the per-iteration warped
    # gathers then hit the image nearly sequentially, which coalesces far
    # better than saliency order (the reference's scan-order selection had
    # this property for free, template_data.cc:55-66).  After the sort the
    # nv valid entries occupy positions [0, nv) (invalid keys map to
    # INT_MAX), which the closed-form balance below relies on.
    order = jnp.argsort(jnp.where(valid, idx, jnp.iinfo(jnp.int32).max))
    # Block-balanced redistribution: spread the nv valid points evenly over
    # the K capacity slots (still in raster order, invalid padding
    # interleaved).  The fused Pallas kernel (ops/pallas/gn_kernel.py) tiles
    # points in POINT_BLOCK chunks and samples each chunk from a static-height
    # row band; with valid compacted to the front, a half-full template packs
    # all its points into the first half of the chunks and each chunk's row
    # span ~doubles past the band (measured: 48-row spans at 8.5k/16k fill vs
    # a 48-row band -> ~6% of points invalidated).  Even fill keeps every
    # chunk's span ~rows/NB regardless of fill.  All downstream consumers
    # reduce over masked points, so the order change is free.
    #
    # The mapping dest(i) = i*K//nv is inverted in CLOSED FORM (round 4 —
    # the scatter+cumsum inverse cost ~0.6 ms of the 1.25 ms selection):
    # slots [0, j) contain ceil(j*nv/K) of the valid entries, so slot j is
    # occupied iff that count increases at j+1, its source is that count,
    # and free slots take the invalid tail in order.
    K = capacity
    # j * nv must not overflow int32: K <= 46340 keeps it < 2^31.  Widen to
    # int64 before raising this bound (ADVICE round 3).
    assert K <= 46340, "block-balance slot computation would overflow int32"
    j = jnp.arange(K)
    nv = jnp.sum(valid).astype(jnp.int32)
    occ_before = (j * nv + K - 1) // K          # ceil(j*nv/K), <= nv
    occ_next = ((j + 1) * nv + K - 1) // K
    occupied = occ_next > occ_before
    src = jnp.where(occupied, occ_before, nv + (j - occ_before))
    idx = idx[order[src]]
    valid = occupied
    rows = (idx // W).astype(jnp.int32)
    cols = (idx % W).astype(jnp.int32)
    d = disparity.reshape(-1)[idx]
    return Selection(rows=rows, cols=cols, disparity=d, valid=valid,
                     num_valid=jnp.sum(valid).astype(jnp.int32))
