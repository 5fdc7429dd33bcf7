"""Stereo disparity estimation.

Counterpart of the reference's ``utils/stereo_algorithm.{h,cc}`` (config-selected
matcher: OpenCV BlockMatching / SGBM, vendored SGM (Yamaguchi) and RSGM
(Spangenberg), int16 output scaled by 1/16 to float at stereo_algorithm.cc:92-135).

Two families here:
  * Host matchers (``CvBlockMatching``, ``CvSGBM``): OpenCV-backed, bit-parity
    with the reference's BM/SGBM path.
  * TPU-native matchers (``TpuBlockMatching``, ``TpuSGM``): re-designed as
    batched cost-volume computation in jnp — the (D, H, W) SAD/census volume is
    a stack of shifted absolute differences + box filter (fused VPU work), the
    winner-take-all + sub-pixel parabola is a reduction, and SGM's scanline
    dynamic programming runs as ``lax.scan`` over image columns with the (H, D)
    per-step message vectorized across rows — replacing the reference's
    hand-written SSE row loops (rsgm.cc) with compiler-scheduled vector code.
"""
from __future__ import annotations

from functools import partial

import jax
import numpy as np

from bpvo_tpu.config import ConfigFile


class StereoAlgorithm:
    """run(left, right) -> float32 disparity, invalid pixels < 0."""

    def run(self, left: np.ndarray, right: np.ndarray) -> np.ndarray:
        raise NotImplementedError


# ---------------------------------------------------------------------------
# host (OpenCV) matchers — parity with the reference BM/SGBM configuration keys
# ---------------------------------------------------------------------------

class CvBlockMatching(StereoAlgorithm):
    def __init__(self, cf: ConfigFile):
        import cv2
        self._bm = cv2.StereoBM_create(
            numDisparities=cf.get("numberOfDisparities", 128, int),
            blockSize=cf.get("SADWindowSize", 15, int) | 1)
        self._bm.setPreFilterCap(cf.get("preFilterCap", 31, int))
        self._bm.setMinDisparity(cf.get("minDisparity", 0, int))
        self._bm.setTextureThreshold(cf.get("textureThreshold", 10, int))
        self._bm.setUniquenessRatio(cf.get("uniquenessRatio", 15, int))
        self._bm.setSpeckleWindowSize(cf.get("speckleWindowSize", 0, int))
        self._bm.setSpeckleRange(cf.get("speckleRange", 0, int))
        self._bm.setDisp12MaxDiff(cf.get("disp12MaxDiff", -1, int))

    def run(self, left, right):
        d16 = self._bm.compute(left, right)
        return d16.astype(np.float32) / 16.0


class CvSGBM(StereoAlgorithm):
    def __init__(self, cf: ConfigFile):
        import cv2
        self._sgbm = cv2.StereoSGBM_create(
            minDisparity=cf.get("minDisparity", 0, int),
            numDisparities=cf.get("numberOfDisparities", 128, int),
            blockSize=cf.get("SADWindowSize", 3, int) | 1,
            P1=cf.get("P1", 0, int),
            P2=cf.get("P2", 0, int),
            uniquenessRatio=cf.get("uniquenessRatio", 0, int),
            speckleWindowSize=cf.get("speckleWindowSize", 0, int),
            speckleRange=cf.get("speckleRange", 0, int),
            mode=(cv2.STEREO_SGBM_MODE_HH if cf.get("fullDP", 0, int)
                  else cv2.STEREO_SGBM_MODE_SGBM))

    def run(self, left, right):
        d16 = self._sgbm.compute(left, right)
        return d16.astype(np.float32) / 16.0


# ---------------------------------------------------------------------------
# TPU-native matchers
# ---------------------------------------------------------------------------

def _box_filter(x, radius: int):
    """Mean filter over (2r+1)^2 windows on trailing (H, W) axes."""
    import jax.numpy as jnp
    if radius <= 0:
        return x
    k = 2 * radius + 1
    pad = [(0, 0)] * (x.ndim - 2) + [(radius, radius), (radius, radius)]
    xp = jnp.pad(x, pad, mode="edge")
    c = jnp.cumsum(jnp.cumsum(xp, axis=-2), axis=-1)
    c = jnp.pad(c, [(0, 0)] * (x.ndim - 2) + [(1, 0), (1, 0)])
    H, W = x.shape[-2:]
    s = (c[..., k:, k:] - c[..., :-k, k:] - c[..., k:, :-k] + c[..., :-k, :-k])
    return s[..., :H, :W] / (k * k)


@partial(jax.jit, static_argnames=("num_disparities", "radius",
                                   "uniqueness_ratio", "subpixel", "lr_check"))
def _block_matching(L, R, num_disparities: int, radius: int,
                    uniqueness_ratio: float, subpixel: bool, lr_check: bool):
    import jax.numpy as jnp
    L = L.astype(jnp.float32)
    R = R.astype(jnp.float32)
    H, W = L.shape

    # cost volume (D, H, W): mean absolute difference over the SAD window
    def cost_at(d):
        diff = jnp.abs(L - jnp.roll(R, d, axis=-1))
        diff = diff.at[:, :d].set(255.0) if d > 0 else diff
        return _box_filter(diff, radius)

    cost = jnp.stack([cost_at(d) for d in range(num_disparities)])

    best = jnp.argmin(cost, axis=0)
    cmin = jnp.min(cost, axis=0)

    # uniqueness: best must beat the runner-up (excluding +-1 neighbors) by ratio
    D = num_disparities
    didx = jnp.arange(D)[:, None, None]
    near = jnp.abs(didx - best[None]) <= 1
    second = jnp.min(jnp.where(near, jnp.inf, cost), axis=0)
    ok = second * (1.0 - uniqueness_ratio / 100.0) >= cmin
    ok &= jnp.isfinite(cmin)

    disp = best.astype(jnp.float32)

    if subpixel:
        # parabola through (d-1, d, d+1) costs
        bm1 = jnp.clip(best - 1, 0, D - 1)
        bp1 = jnp.clip(best + 1, 0, D - 1)
        take = lambda idx: jnp.take_along_axis(cost, idx[None], axis=0)[0]
        c0, c1, c2 = take(bm1), take(best), take(bp1)
        denom = c0 - 2.0 * c1 + c2
        delta = jnp.where(jnp.abs(denom) > 1e-6,
                          0.5 * (c0 - c2) / jnp.maximum(denom, 1e-6), 0.0)
        disp = disp + jnp.clip(delta, -0.5, 0.5)

    if lr_check:
        # right-view winner via the same volume: costR[d, y, x] = cost[d, y, x+d]
        xs = jnp.arange(W)[None, None, :]
        xr = jnp.clip(xs + jnp.arange(D)[:, None, None], 0, W - 1)
        costR = jnp.take_along_axis(cost, xr, axis=2)
        bestR = jnp.argmin(costR, axis=0)
        # project back: disparity of left pixel x must match right pixel x-d
        xl = jnp.clip(jnp.arange(W)[None, :] - best, 0, W - 1)
        bR = jnp.take_along_axis(bestR, xl, axis=1)
        ok &= jnp.abs(bR - best) <= 1

    disp = jnp.where(ok & (best > 0), disp, -1.0)
    return disp


class TpuBlockMatching(StereoAlgorithm):
    """Batched SAD block matching on the accelerator."""

    def __init__(self, cf: ConfigFile = None, num_disparities: int = 128,
                 sad_window: int = 9, uniqueness_ratio: float = 15.0,
                 subpixel: bool = True, lr_check: bool = True):
        if cf is not None:
            num_disparities = cf.get("numberOfDisparities", num_disparities, int)
            sad_window = cf.get("SADWindowSize", sad_window, int)
            uniqueness_ratio = cf.get("uniquenessRatio", uniqueness_ratio, float)
        self._D = num_disparities
        self._radius = max(sad_window // 2, 1)
        self._uniq = uniqueness_ratio
        self._subpixel = subpixel
        self._lr = lr_check

    def run(self, left, right):
        import jax.numpy as jnp
        d = _block_matching(jnp.asarray(left), jnp.asarray(right), self._D,
                            self._radius, self._uniq, self._subpixel, self._lr)
        return np.asarray(d)

    def as_fn(self):
        """Jittable ``(left, right) -> disparity`` closure for the
        device-resident keyframe-rate stereo path (DeviceVO stereo_fn)."""
        D, r, u = self._D, self._radius, self._uniq
        sp, lr = self._subpixel, self._lr
        return lambda L, R: _block_matching(L, R, D, r, u, sp, lr)


# ---------------------------------------------------------------------------
# TPU SGM: census-based matching cost + multi-direction scanline aggregation
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("num_disparities", "p1", "p2",
                                   "use_pallas"))
def _sgm(L, R, num_disparities: int, p1: float, p2: float,
         use_pallas: bool = False):
    """Semi-global matching over 4 scanline directions.

    Cost: hamming distance of 3x3 census codes (like the reference's vendored
    SGM, sgm.cc) computed from the 8 census planes.  Aggregation: the classic
    recurrence  Lr(p,d) = C(p,d) + min(Lr(p-r,d), Lr(p-r,d+-1)+P1, min_d'+P2)
    - min_d'  as a ``lax.scan`` per direction, vectorized over the
    perpendicular axis and the disparity axis.
    """
    import jax
    import jax.numpy as jnp
    from bpvo_tpu.ops.census import census_planes

    H, W = L.shape
    D = num_disparities
    cL = census_planes(L.astype(jnp.float32))  # (8, H, W) in {0, 1}
    cR = census_planes(R.astype(jnp.float32))

    # cost per disparity, SEQUENTIALLY via lax.map: the unrolled
    # stack-of-128 variant materializes ~2 GB of (8, H, W) roll
    # intermediates at KITTI scale and OOMs HBM at full frame width
    # (probed round 4); the map keeps peak memory at ~2 census stacks
    col = jnp.arange(W)[None, :]

    def cost_at(d):
        ham = jnp.sum(jnp.abs(cL - jnp.roll(cR, d, axis=-1)), axis=0)
        return jnp.where(col < d, 8.0, ham)

    cost = jnp.moveaxis(jax.lax.map(cost_at, jnp.arange(D)), 0, -1)  # (H,W,D)

    if use_pallas:
        from bpvo_tpu.ops.pallas import sgm_kernel
        a = sgm_kernel.aggregate_4dir(cost, p1, p2)
        return _wta_subpixel(a, D)
    return _wta_subpixel(_aggregate_4dir_scan(cost, p1, p2), D)


def _aggregate_4dir_scan(cost, p1: float, p2: float):
    """lax.scan lowering of the 4-direction SGM aggregation (one tiny XLA
    step per scanline position; the Pallas whole-direction alternative is
    ops/pallas/sgm_kernel.aggregate_4dir — compared on device in
    docs/PALLAS_TPU.json sgm_aggregate4_*)."""
    import jax
    import jax.numpy as jnp

    def aggregate(cost_seq):
        """cost_seq (T, B, D): scan along T, B = batch of parallel scanlines."""
        def step(prev, c):
            # prev (B, D)
            m = jnp.min(prev, axis=-1, keepdims=True)
            up = jnp.concatenate([prev[:, :1] + p1, prev[:, :-1] + p1], axis=-1)
            dn = jnp.concatenate([prev[:, 1:] + p1, prev[:, -1:] + p1], axis=-1)
            best = jnp.minimum(jnp.minimum(prev, up),
                               jnp.minimum(dn, m + p2))
            out = c + best - m
            return out, out
        init = cost_seq[0]
        _, agg = jax.lax.scan(step, init, cost_seq[1:])
        return jnp.concatenate([init[None], agg], axis=0)

    # left->right and right->left (scan over W, batch over H)
    c_lr = jnp.swapaxes(cost, 0, 1)                        # (W, H, D)
    a = aggregate(c_lr)
    a = a + aggregate(c_lr[::-1])[::-1]
    a = jnp.swapaxes(a, 0, 1)                              # (H, W, D)
    # top->bottom and bottom->top (scan over H, batch over W)
    a = a + aggregate(cost)
    a = a + aggregate(cost[::-1])[::-1]
    return a


def _wta_subpixel(a, D: int):
    """Winner-take-all over the disparity axis + parabolic sub-pixel.

    The neighbor costs c(best-1), c(best), c(best+1) are extracted with
    compare-select reductions instead of ``take_along_axis``: on v5e the
    three (H, W, D) gathers measured 21-27 ms at KITTI/D=128 (the LARGEST
    single SGM stage, scripts/profile_sgm.py round 5) while masked-sum
    passes are plain VPU streams."""
    import jax.numpy as jnp
    best = jnp.argmin(a, axis=-1)
    bm1 = jnp.clip(best - 1, 0, D - 1)
    bp1 = jnp.clip(best + 1, 0, D - 1)
    didx = jnp.arange(D, dtype=best.dtype)

    def take(idx):
        return jnp.sum(jnp.where(didx == idx[..., None], a, 0.0), axis=-1)

    c0, c1, c2 = take(bm1), take(best), take(bp1)
    denom = c0 - 2.0 * c1 + c2
    delta = jnp.where(jnp.abs(denom) > 1e-6,
                      0.5 * (c0 - c2) / jnp.maximum(denom, 1e-6), 0.0)
    disp = best.astype(jnp.float32) + jnp.clip(delta, -0.5, 0.5)
    return jnp.where(best > 0, disp, -1.0)


class TpuSGM(StereoAlgorithm):
    def __init__(self, cf: ConfigFile = None, num_disparities: int = 128,
                 p1: float = 2.0, p2: float = 8.0, use_pallas: bool = None):
        if use_pallas is None:
            # measured default (docs/PALLAS_TPU.json sgm_aggregate4_*): the
            # whole-direction Pallas kernel aggregates 4.0x faster than the
            # per-step lax.scan lowering on device (5.89 vs 23.73 ms at
            # 376x640x64); on CPU the kernel would run in interpret mode, so
            # the scan path stays the host default
            import jax
            use_pallas = jax.default_backend() == "tpu"
        if cf is not None:
            num_disparities = cf.get("numberOfDisparities", num_disparities, int)
            # reference SGM penalties are in census-weighted units
            # (stereo_algorithm.cc:50-55); ours are hamming-distance units,
            # calibrated against exact synthetic GT with cv2 SGBM as oracle
            # (scripts/calibrate_sgm.py sweep -> docs/SGM_CALIBRATION.md:
            # p1=2, p2=8 minimizes MAE + bad-pixel fraction across scenes)
            p1 = cf.get("sgmP1", p1, float)
            p2 = cf.get("sgmP2", p2, float)
            use_pallas = cf.get("sgmUsePallas", use_pallas, bool)
        self._D = num_disparities
        self._p1 = p1
        self._p2 = p2
        self._use_pallas = use_pallas

    def run(self, left, right):
        import jax.numpy as jnp
        d = _sgm(jnp.asarray(left), jnp.asarray(right), self._D, self._p1,
                 self._p2, self._use_pallas)
        return np.asarray(d)

    def as_fn(self):
        """Jittable ``(left, right) -> disparity`` closure (DeviceVO
        stereo_fn): SGM runs inside the VO step's keyframe branch."""
        D, p1, p2, up = self._D, self._p1, self._p2, self._use_pallas
        return lambda L, R: _sgm(L, R, D, p1, p2, up)


def create_stereo_algorithm(cf: ConfigFile) -> StereoAlgorithm:
    """Factory on the ``StereoAlgorithm`` key (stereo_algorithm.cc:20-85).
    The reference names map to host matchers; ``TpuBlockMatching``/``TpuSGM``
    select the accelerator-native ones."""
    name = cf.get("StereoAlgorithm", "BlockMatching", str).lower()
    if name in ("blockmatching", "bm"):
        return CvBlockMatching(cf)
    if name in ("sgbm", "semiglobalblockmatching"):
        return CvSGBM(cf)
    if name in ("sgm", "semiglobalmatching", "rsgm", "tpusgm"):
        return TpuSGM(cf)
    if name in ("tpublockmatching", "tpubm"):
        return TpuBlockMatching(cf)
    raise ValueError(f"unknown stereo algorithm {name!r}")
