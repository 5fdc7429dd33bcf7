"""Whole-GN-level Pallas kernel: the COMPLETE IRLS Gauss-Newton loop for one
coarse pyramid level — projection, bilinear sampling, robust sigma, weights,
normal equations, 6x6 Cholesky, SE(3) exponential and pose composition,
convergence tests, best-iterate fallback — inside ONE kernel invocation.

Why: the round-4 fixed-cost decomposition (docs/PERFORMANCE.md,
microbench_fixed.py) showed each per-level GN run pays ~0.3 ms of
SIZE-INDEPENDENT serial scalar chains in XLA (sigma estimation 0.11 ms, the
unrolled 6x6 solve 0.11 ms, exp+compose 0.11 ms — each a ~100-op dependency
chain at ~1 us/op of per-op overhead).  Inside a Pallas kernel those same
chains run on the scalar core at nanoseconds per op, so a coarse level whose
POINT work is trivial (512-1024 points, image fully VMEM-resident) collapses
from ~0.3 ms + 30-70 us/iter to roughly its pure compute.

Scope (coarse levels only — the guards in solver/gauss_newton.py):
  * image fits VMEM whole: (C, Hp, Wp) with no row banding;
  * K <= 2048 points, RigidBody warp, Linear/Cosine interpolation, GN solver;
  * sigma: median via 16-step count bisection (resolution rmax/2^16 — finer
    than the 1024-bin histogram), same 1.4826(1+5/(n-6)) scale and
    stable-skip semantics as solver/mestimator.py;
  * convergence tests, first-iteration gating, Levenberg-jittered Cholesky
    with residual check, and the best-iterate fallback mirror
    solver/gauss_newton.py run() exactly (asserted by tests/test_pallas.py).

Reference counterpart: the whole of pose_estimator_base.h:324-407 +
pose_estimator_gn.h:70-81 per level, as one fused device program.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bpvo_tpu.solver.mestimator import HUBER_K, TUKEY_T
from bpvo_tpu.types import InterpolationType, LossFunctionType

_SQRT_EPS = 3.452669831e-4

STATUS_MAX_ITERATIONS = 0
STATUS_PARAMETER_TOL = 1
STATUS_FUNCTION_TOL = 2
STATUS_GRADIENT_TOL = 3
STATUS_SOLVER_ERROR = 4


def _round_up(x, m):
    return (x + m - 1) // m * m


def _weight(u, loss: str):
    if loss == "Tukey":
        x = u / TUKEY_T
        w = (1.0 - x * x)
        return jnp.where(jnp.abs(u) < TUKEY_T, w * w, 0.0)
    if loss == "Huber":
        au = jnp.abs(u)
        return jnp.where(au < HUBER_K, 1.0, HUBER_K / jnp.maximum(au, 1e-20))
    return jnp.ones_like(u)


def _chol6_solve(h, g):
    """Scalar 6x6 Cholesky solve; h[i][j], g[i] python lists of scalars."""
    tiny = 1e-20
    L = [[None] * 6 for _ in range(6)]
    for i in range(6):
        for j in range(i + 1):
            s = h[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][i] = jnp.sqrt(jnp.maximum(s, tiny))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * 6
    for i in range(6):
        s = g[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def _exp_combined(dp, s_n, c0, c1, c2):
    """R', t' of T_n^{-1} exp(dp) T_n from 6 twist scalars (warp.py
    params_to_pose expanded: R' = Re, t' = te/s + c - Re c)."""
    w0, w1, w2 = dp[0], dp[1], dp[2]
    v0, v1, v2 = dp[3], dp[4], dp[5]
    t2 = w0 * w0 + w1 * w1 + w2 * w2
    theta = jnp.sqrt(jnp.maximum(t2, 1e-30))
    small = t2 < 1e-8
    A = jnp.where(small, 1.0 - t2 / 6.0 + t2 * t2 / 120.0,
                  jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - t2 / 24.0 + t2 * t2 / 720.0,
                  (1.0 - jnp.cos(theta)) / jnp.maximum(t2, 1e-30))
    C = jnp.where(small, 1.0 / 6.0 - t2 / 120.0 + t2 * t2 / 5040.0,
                  (1.0 - A) / jnp.maximum(t2, 1e-30))
    # W = hat(w); R = I + A W + B W^2;  V = I + B W + C W^2
    # W^2 entries
    ww00 = -(w1 * w1 + w2 * w2)
    ww11 = -(w0 * w0 + w2 * w2)
    ww22 = -(w0 * w0 + w1 * w1)
    ww01 = w0 * w1
    ww02 = w0 * w2
    ww12 = w1 * w2
    R = [[1.0 + B * ww00, -A * w2 + B * ww01, A * w1 + B * ww02],
         [A * w2 + B * ww01, 1.0 + B * ww11, -A * w0 + B * ww12],
         [-A * w1 + B * ww02, A * w0 + B * ww12, 1.0 + B * ww22]]
    V = [[1.0 + C * ww00, -B * w2 + C * ww01, B * w1 + C * ww02],
         [B * w2 + C * ww01, 1.0 + C * ww11, -B * w0 + C * ww12],
         [-B * w1 + C * ww02, B * w0 + C * ww12, 1.0 + C * ww22]]
    te = [V[i][0] * v0 + V[i][1] * v1 + V[i][2] * v2 for i in range(3)]
    c = [c0, c1, c2]
    inv_s = 1.0 / s_n
    t = [te[i] * inv_s + c[i]
         - (R[i][0] * c[0] + R[i][1] * c[1] + R[i][2] * c[2])
         for i in range(3)]
    return R, t


def _kernel_banded(scal_ref, T0_ref, bases_ref, pts_ref, jp_ref, img_ref,
                   outT_ref, stats_ref, h8_ref, w_ref, bo_ref,
                   *scratch, **kw):
    """Banded-sampling variant: extra inputs/outputs, same body (see
    _kernel's ``bases_ref`` docs).  The "hbm" sub-variant passes two VMEM
    slab buffers + DMA semaphores as scratch."""
    if scratch:
        kw = dict(kw, slabs_ref=scratch[0], dma_sem=scratch[1])
    _kernel(scal_ref, T0_ref, pts_ref, jp_ref, img_ref,
            outT_ref, stats_ref, h8_ref, w_ref,
            bases_ref=bases_ref, bo_ref=bo_ref, **kw)


def _kernel(scal_ref, T0_ref, pts_ref, jp_ref, img_ref,
            outT_ref, stats_ref, h8_ref, w_ref, *,
            H: int, W: int, C: int, K: int, loss: str, cosine: bool,
            max_iterations: int, function_tolerance: float,
            parameter_tolerance: float, gradient_tolerance: float,
            scale_tolerance: float, scale_tolerance_rel: float,
            bases_ref=None, bo_ref=None, band: int = 0,
            bf16_mix: bool = False, slabs_ref=None, dma_sem=None):
    Hp = img_ref.shape[1]
    Wp = img_ref.shape[2]
    Kp = pts_ref.shape[1]

    fx = scal_ref[0]
    fy = scal_ref[1]
    cx = scal_ref[2]
    cy = scal_ref[3]
    s_n = scal_ref[4]
    c0 = scal_ref[5]
    c1 = scal_ref[6]
    c2 = scal_ref[7]
    sigma0 = scal_ref[8]
    dscale0 = scal_ref[9]

    X = pts_ref[0:1, :]
    Y = pts_ref[1:2, :]
    Zp = pts_ref[2:3, :]
    val = pts_ref[3:4, :]

    # Sampling strategy (static): shapes whose (Wp, Kp) 2-hot and
    # (C*Hp, Kp) colmix fit 6 MB keep the validated single-pass program;
    # larger shapes (the K=4096 L1 levels) use BANDED sampling — the
    # round-4 chunked full-height variant was measured SLOWER end-to-end
    # (BitPlanes 262.9 vs 326.2 Hz: full-Hp colmixes per chunk), and its
    # post-mortem named this fix.  Banded: points are block-balanced into
    # raster-ordered blocks of 512, so block b's rows live in a narrow
    # band; the caller passes each block's band base (in units of 8 rows —
    # the *8 inside the kernel gives Mosaic the sublane-alignment proof)
    # computed from the INITIAL pose, and each per-block colmix touches
    # only (band, Wp) image rows: ~4x fewer sampling MACs than full
    # height.  Points whose warped row leaves their block's band during
    # the solve are dropped from the system and counted in bo_ref —
    # identical contract to the stacked linearize kernel's band telemetry
    # (ops/pallas/gn_kernel.py).
    banded = bases_ref is not None
    if not banded:
        ck = Kp
        cid = jax.lax.broadcasted_iota(jnp.int32, (Wp, ck), 0)
        rid = jax.lax.broadcasted_iota(jnp.int32, (Hp, ck), 0)
    else:
        ck = 512
        cid = jax.lax.broadcasted_iota(jnp.int32, (Wp, ck), 0)
        brid = jax.lax.broadcasted_iota(jnp.int32, (band, ck), 0)
    n_blocks = Kp // ck
    rid8 = jax.lax.broadcasted_iota(jnp.int32, (8, Kp), 0)

    def linearize(Ts):
        """One linearization at pose scalars Ts = (R 9, t 3); returns
        (ok (1,Kp), okf, rs: per-channel (1,Kp) residuals)."""
        (r00, r01, r02, r10, r11, r12, r20, r21, r22, tx, ty, tz) = Ts
        Xc = r00 * X + r01 * Y + r02 * Zp + tx
        Yc = r10 * X + r11 * Y + r12 * Zp + ty
        Zc = r20 * X + r21 * Y + r22 * Zp + tz
        zi = 1.0 / jnp.where(jnp.abs(Zc) > 1e-12, Zc, 1e-12)
        u = fx * Xc * zi + cx
        v = fy * Yc * zi + cy
        xi = jnp.floor(u)
        yi = jnp.floor(v)
        ok = ((val > 0) & (Zc > 1e-6)
              & (xi >= 0) & (xi < W - 1) & (yi >= 0) & (yi < H - 1))
        okf = ok.astype(jnp.float32)
        xii = jnp.clip(xi.astype(jnp.int32), 0, W - 2)
        yii = jnp.clip(yi.astype(jnp.int32), 0, H - 2)
        xf = u - xii.astype(jnp.float32)
        yf = v - yii.astype(jnp.float32)
        if cosine:
            xf = (1.0 - jnp.cos(xf * jnp.pi)) * 0.5
            yf = (1.0 - jnp.cos(yf * jnp.pi)) * 0.5

        if not banded:
            onehot = (jnp.where(cid == xii, 1.0 - xf, 0.0)
                      + jnp.where(cid == xii + 1, xf, 0.0))
            flat_img = img_ref[:, :, :].reshape(C * Hp, Wp)
            colmix = jax.lax.dot_general(
                flat_img, onehot, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (C*Hp, Kp)
            row_w = (jnp.where(rid == yii, 1.0 - yf, 0.0)
                     + jnp.where(rid == yii + 1, yf, 0.0))
            cm3 = colmix.reshape(C, Hp, Kp)
            I1s = [jnp.sum(cm3[c] * row_w, axis=0, keepdims=True)
                   for c in range(C)]
        else:
            # BANDED sampling, python-unrolled over the n_blocks point
            # blocks (block-balance fixed the block boundaries).  A lane
            # slice of a (1, Kp) vector cannot be re-broadcast on Mosaic
            # ("Invalid input layout", probed on device in round 4 AND
            # re-confirmed for this kernel), so each block's coordinate row
            # is extracted by the proven iota-compare reduction over the
            # (n_blocks, ck) reshape; with a STATIC block index the select
            # mask folds to a constant.  Only the row-band start is
            # dynamic — expressed as bases_ref[b] * 8 so the sublane slice
            # carries a multiple-of-8 proof.
            xii2 = xii.reshape(n_blocks, ck).astype(jnp.float32)
            xf2 = xf.reshape(n_blocks, ck)
            yii2 = yii.reshape(n_blocks, ck).astype(jnp.float32)
            yf2 = yf.reshape(n_blocks, ck)
            rows_iota = jax.lax.broadcasted_iota(jnp.int32, (n_blocks, ck), 0)

            def take_row(a, b):
                return jnp.sum(jnp.where(rows_iota == b, a, 0.0), axis=0,
                               keepdims=True)              # (1, ck)

            hbm = slabs_ref is not None

            def band_copy(b, slot):
                # whole-(C, band, Wp) strided DMA from the HBM-resident
                # image; bases are fixed by the initial pose so the
                # descriptor is identical between start() and wait()
                return pltpu.make_async_copy(
                    img_ref.at[:, pl.ds(bases_ref[b] * 8, band), :],
                    slabs_ref.at[slot], dma_sem.at[slot])

            if hbm:
                band_copy(0, 0).start()
            I1_chunks = [[] for _ in range(C)]
            band_ok_chunks = []
            for b in range(n_blocks):
                if hbm:
                    if b + 1 < n_blocks:
                        band_copy(b + 1, (b + 1) % 2).start()
                    band_copy(b, b % 2).wait()
                xq = take_row(xii2, b).astype(jnp.int32)
                fq = take_row(xf2, b)
                yq = take_row(yii2, b).astype(jnp.int32)
                gq = take_row(yf2, b)
                base = bases_ref[b] * 8
                yrel = yq - base
                band_ok_chunks.append((yrel >= 0) & (yrel <= band - 2))
                onehot = (jnp.where(cid == xq, 1.0 - fq, 0.0)
                          + jnp.where(cid == xq + 1, fq, 0.0))
                yrs = jnp.clip(yrel, 0, band - 2)
                row_w = (jnp.where(brid == yrs, 1.0 - gq, 0.0)
                         + jnp.where(brid == yrs + 1, gq, 0.0))
                # single-pass bf16 column mix for unit-scale (census)
                # channels — the same measured-safe policy as the stacked
                # linearize kernel (GNOptions.fused_bf16; f32 banded dots
                # measured 1.13 ms vs the stacked-XLA route's 0.95 at the
                # BitPlanes L1 shape, bf16 is what makes the kernel win)
                if bf16_mix:
                    onehot = onehot.astype(jnp.bfloat16)
                for c in range(C):
                    img_band = (slabs_ref[b % 2, c] if hbm
                                else img_ref[c, pl.ds(base, band), :])
                    if bf16_mix:
                        # DEFAULT precision: the package-global f32 matmul
                        # precision would ask Mosaic for an fp32-contract
                        # bf16 matmul, which it rejects ("Bad lhs type" —
                        # probed on device for the stacked kernel AND
                        # re-confirmed here)
                        colmix_c = jax.lax.dot_general(
                            img_band.astype(jnp.bfloat16), onehot,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)
                    else:
                        colmix_c = jax.lax.dot_general(
                            img_band, onehot,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (band, ck)
                    I1_chunks[c].append(jnp.sum(colmix_c * row_w, axis=0,
                                                keepdims=True))
            in_band = jnp.concatenate(band_ok_chunks, axis=1)   # (1, Kp)
            # telemetry: initially-valid points pushed out of their block's
            # band by the pose updates (dropped from the system below)
            bo_ref[0] = jnp.sum((ok & ~in_band).astype(jnp.float32))
            ok = ok & in_band
            okf = ok.astype(jnp.float32)
            I1s = [jnp.concatenate(I1_chunks[c], axis=1) for c in range(C)]

        rs = []
        for c in range(C):
            pix = jp_ref[c, 6:7, :]
            rs.append((I1s[c] - pix) * okf)
        return ok, okf, rs

    def reduce_system(rs, okf, sigma):
        def channel_ops(c):
            rc = rs[c]
            wc = _weight(rc / sigma, loss) * okf              # (1, Kp)
            # export the IRLS weights of the LAST linearization (the final
            # reduce_system call wins) so callers get an honest
            # GNState.weights instead of a zero sentinel (VERDICT r4 item 8)
            w_ref[c:c + 1, :] = wc
            jpc = jp_ref[c]                                   # (8, Kp)
            rb = jnp.broadcast_to(rc, (8, Kp))
            wb = jnp.broadcast_to(wc, (8, Kp))
            rhs = jnp.where(rid8 >= 6, rb, jpc)
            lhs = jnp.where(rid8 == 7, 0.0,
                            jnp.where(rid8 == 6, rb, jpc)) * wb
            return lhs, rhs

        if C * Kp <= 16384:
            # small systems: single lane-concat MXU pass (the validated
            # L2/L3 program shape — kept byte-identical)
            pieces = [channel_ops(c) for c in range(C)]
            lhs = (jnp.concatenate([p[0] for p in pieces], axis=1)
                   if C > 1 else pieces[0][0])
            rhs = (jnp.concatenate([p[1] for p in pieces], axis=1)
                   if C > 1 else pieces[0][1])
            return jax.lax.dot_general(
                lhs, rhs, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)           # (8, 8)
        # large systems (the K=4096 C=8 L1 shape): accumulate per-channel
        # dots so only one (8, Kp) lhs/rhs pair is live at a time — the
        # concat form kept all 2C pieces + the 2 concats alive and blew the
        # scoped-VMEM stack (measured 21 MB vs the 16 MB limit)
        block8 = None
        for c in range(C):
            lhs, rhs = channel_ops(c)
            d = jax.lax.dot_general(
                lhs, rhs, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            block8 = d if block8 is None else block8 + d
        return block8

    def median_bisect(r0_abs, ok):
        """Median of |r0| over ok via 16-step count bisection."""
        n = jnp.sum(ok.astype(jnp.float32))
        target = jnp.floor((n + 1.0) * 0.5)
        rmax = jnp.max(jnp.where(ok, r0_abs, 0.0))
        lo = jnp.asarray(0.0, jnp.float32)
        hi = rmax

        def body(_, lh):
            lo, hi = lh
            mid = (lo + hi) * 0.5
            cnt = jnp.sum((ok & (r0_abs <= mid)).astype(jnp.float32))
            # cnt >= target: the median is <= mid, shrink the interval to
            # (lo, mid]; else it is > mid, shrink to (mid, hi].  (Round-4
            # shipped these branches swapped, which collapsed the interval to
            # (mid, mid) and returned median 0 — silently disabling robust
            # sigma via the degenerate-scale clamp.  Guarded by
            # tests/test_pallas.py::test_sigma_matches_mestimator.)
            pred = cnt >= target
            return (jnp.where(pred, lo, mid), jnp.where(pred, mid, hi))

        lo, hi = jax.lax.fori_loop(0, 16, body, (lo, hi))
        # invariant: count(<=lo) < target <= count(<=hi), so the median lies
        # in (lo, hi]; hi converges onto it from above (width rmax/2^16)
        med = hi
        return jnp.where(n > 0, med, 0.0), n

    f32 = jnp.float32
    # pose scalars in (R row-major 9, t 3) order, from the row-major (16,) T0
    Tq = (T0_ref[0], T0_ref[1], T0_ref[2],
          T0_ref[4], T0_ref[5], T0_ref[6],
          T0_ref[8], T0_ref[9], T0_ref[10],
          T0_ref[3], T0_ref[7], T0_ref[11])

    big = f32(jnp.inf)
    init = (jnp.asarray(0, jnp.int32),        # 0 it
            jnp.asarray(False),               # 1 converged
            jnp.asarray(True),                # 2 solver_ok
            f32(0.0),                         # 3 f_norm (prev linearize)
            f32(0.0),                         # 4 |dp| of carried update
            f32(0.0),                         # 5 |dp| one step earlier
            f32(0.0),                         # 6 g_tol
            sigma0,                           # 7 sigma
            dscale0,                          # 8 delta_scale
            jnp.asarray(STATUS_MAX_ITERATIONS, jnp.int32),  # 9 status
            big,                              # 10 f_best
            Tq,                               # 11 T_best scalars
            Tq,                               # 12 T scalars
            f32(0.0))                         # 13 g_norm (last)

    def cond(st):
        return (~st[1]) & st[2] & (st[0] < max_iterations)

    def body(st):
        (it, conv, sok, f_prev, dpn_last, dpn_prev2, g_tol, sigma, dscale,
         status, f_best, Tb, Ts, _gn) = st
        first = it == 0

        ok, okf, rs = linearize(Ts)
        # sigma (channel-0 residuals), stable-skip semantics
        do_est = dscale > jnp.maximum(f32(scale_tolerance),
                                      scale_tolerance_rel * sigma)
        med, n = median_bisect(jnp.abs(rs[0]), ok)
        scale_est = 1.4826 * (1.0 + 5.0 / jnp.maximum(n - 6.0, 1.0)) * med
        scale_est = jnp.where(scale_est < 1e-6, 1.0, scale_est)
        sigma_new = jnp.where(do_est, scale_est, sigma)
        dscale_new = jnp.where(do_est, jnp.abs(sigma_new - sigma), dscale)

        block8 = reduce_system(rs, okf, sigma_new)
        h8_ref[:, :] = jnp.pad(block8, ((0, 0), (0, 120)))
        h = [[h8_ref[i, j] for j in range(6)] for i in range(6)]
        g = [h8_ref[i, 6] for i in range(6)]
        f_new = jnp.sqrt(jnp.maximum(h8_ref[6, 6], 0.0))

        g_norm = jnp.abs(g[0])
        for i in range(1, 6):
            g_norm = jnp.maximum(g_norm, jnp.abs(g[i]))
        g_tol_new = jnp.where(
            first, gradient_tolerance * jnp.maximum(g_norm, _SQRT_EPS), g_tol)

        # convergence tests (solver/gauss_newton._test_convergence): the
        # parameter test compares the CARRIED |dp| against the one before it
        p_tol = ((dpn_last < parameter_tolerance)
                 | (dpn_last < parameter_tolerance * (_SQRT_EPS + dpn_prev2)))
        f_tol = ((f_new < function_tolerance)
                 | (f_new < function_tolerance * (_SQRT_EPS + f_prev))
                 | (jnp.abs(f_new - f_prev) < function_tolerance)
                 | (jnp.abs(f_new - f_prev)
                    < function_tolerance * jnp.maximum(f_prev, 1.0)))
        g_ok = g_norm < g_tol_new
        status_new = jnp.where(
            p_tol, STATUS_PARAMETER_TOL,
            jnp.where(f_tol, STATUS_FUNCTION_TOL,
                      jnp.where(g_ok, STATUS_GRADIENT_TOL,
                                STATUS_MAX_ITERATIONS)))
        conv_new = p_tol | f_tol | g_ok
        conv_new = jnp.where(first, g_ok, conv_new)
        status_new = jnp.where(
            first, jnp.where(g_ok, STATUS_GRADIENT_TOL,
                             STATUS_MAX_ITERATIONS),
            status_new).astype(jnp.int32)

        # Levenberg-jittered Cholesky (solver/linear_system.solve)
        maxdiag = h[0][0]
        for i in range(1, 6):
            maxdiag = jnp.maximum(maxdiag, h[i][i])
        jit_ = 1e-6 * maxdiag + 1e-12
        haug = [[h[i][j] + (jit_ if i == j else 0.0) for j in range(6)]
                for i in range(6)]
        dp = _chol6_solve(haug, g)
        finite = jnp.isfinite(dp[0])
        for i in range(1, 6):
            finite = finite & jnp.isfinite(dp[i])
        dp = [jnp.where(finite, d, 0.0) for d in dp]
        # residual check |H dp - g|_inf <= 1e-3 (1 + |g|_inf)
        resid = f32(0.0)
        for i in range(6):
            ri = -g[i]
            for j in range(6):
                ri = ri + h[i][j] * dp[j]
            resid = jnp.maximum(resid, jnp.abs(ri))
        ok_solve = finite & (resid <= 1e-3 * (1.0 + g_norm))

        dp_norm = jnp.sqrt(dp[0] * dp[0] + dp[1] * dp[1] + dp[2] * dp[2]
                           + dp[3] * dp[3] + dp[4] * dp[4] + dp[5] * dp[5])
        do_update = (~conv_new) & ok_solve

        # T <- T @ params_to_pose(-dp)
        ndp = [-d for d in dp]
        Re, te = _exp_combined(ndp, s_n, c0, c1, c2)
        (r00, r01, r02, r10, r11, r12, r20, r21, r22, tx, ty, tz) = Ts
        Rm = [[r00, r01, r02], [r10, r11, r12], [r20, r21, r22]]
        Rn = [[sum(Rm[i][k] * Re[k][j] for k in range(3)) for j in range(3)]
              for i in range(3)]
        tn = [sum(Rm[i][k] * te[k] for k in range(3)) + [tx, ty, tz][i]
              for i in range(3)]
        Ts_new = tuple(
            jnp.where(do_update, x, y) for x, y in zip(
                (Rn[0][0], Rn[0][1], Rn[0][2], Rn[1][0], Rn[1][1], Rn[1][2],
                 Rn[2][0], Rn[2][1], Rn[2][2], tn[0], tn[1], tn[2]), Ts))

        better = f_new < f_best
        Tb_new = tuple(jnp.where(better, x, y) for x, y in zip(Ts, Tb))
        f_best_new = jnp.where(better, f_new, f_best)

        status_out = jnp.where(ok_solve, status_new,
                               STATUS_SOLVER_ERROR).astype(jnp.int32)
        dpn_carried = jnp.where(do_update, dp_norm, dpn_last)
        return (it + 1, conv_new, ok_solve, f_new, dpn_carried, dpn_last,
                g_tol_new, sigma_new, dscale_new, status_out, f_best_new,
                Tb_new, Ts_new, g_norm)

    st = jax.lax.while_loop(cond, body, init)
    (it, conv, sok, f_norm, _dpn, _dpn2, _gt, sigma, dscale, status, f_best,
     Tb, Ts, g_norm) = st
    use_best = (~conv) & (f_best < f_norm)
    Tf = tuple(jnp.where(use_best, b, t) for b, t in zip(Tb, Ts))
    (r00, r01, r02, r10, r11, r12, r20, r21, r22, tx, ty, tz) = Tf
    row_major = (r00, r01, r02, tx, r10, r11, r12, ty,
                 r20, r21, r22, tz, f32(0), f32(0), f32(0), f32(1))
    for i in range(16):
        outT_ref[i] = row_major[i]
    stats_ref[0] = it.astype(jnp.float32)
    stats_ref[1] = f_norm
    stats_ref[2] = g_norm
    stats_ref[3] = status.astype(jnp.float32)
    stats_ref[4] = sigma
    stats_ref[5] = dscale
    stats_ref[6] = conv.astype(jnp.float32)
    stats_ref[7] = sok.astype(jnp.float32)


# VMEM image budget for "whole image resident" (bytes); coarse KITTI levels
# are 0.1-4 MB, far below this
MAX_IMG_BYTES = 6 * 1024 * 1024
# Point budgets.  Single-pass sampling envelope: K <= 2048 AND the
# (Wp + C*Hp) * Kp intermediates fit _SMALL_SAMPLING_BYTES.  Beyond that,
# the BANDED path (round 5) extends the kernel to K <= MAX_POINTS_BANDED —
# the L1 levels.  (History: round 4's chunked full-height variant at K=4096
# measured SLOWER end-to-end than the XLA loop, BitPlanes 262.9 vs
# 326.2 Hz; its post-mortem prescribed banded sampling inside the level
# loop, which is what ships now.)
MAX_POINTS = 2048
MAX_POINTS_BANDED = 16384
_SMALL_SAMPLING_BYTES = 6 * 1024 * 1024


def _variant(rows: int, cols: int, C: int, K: int, bf16_img: bool = False):
    """Which kernel variant covers this shape: "small" | "banded" | None.

    ``bf16_img`` halves the VMEM-resident image cost — legal only for
    unit-scale (census) channel stacks per the measured bf16 policy
    (GNOptions.fused_bf16), which is how the C=8 L0 level (a 15.4 MB f32
    image) fits the budget."""
    Hp = _round_up(rows, 8)
    Wp = _round_up(cols, 128)
    Kp = _round_up(K, 128)
    # the validated single-pass program always wins where it fits (it
    # stores the image f32 regardless of the bf16 policy)
    if (C * Hp * Wp * 4 <= MAX_IMG_BYTES and K <= MAX_POINTS
            and (Wp + C * Hp) * Kp * 4 <= _SMALL_SAMPLING_BYTES):
        return "small"
    img_bytes = C * Hp * Wp * (2 if bf16_img else 4)
    if K <= MAX_POINTS_BANDED and Kp % 512 == 0:
        # total VMEM-resident estimate: image + jp (C,8,Kp f32) + pts +
        # weights/residual vectors + the (Wp, 512) 2-hot; Mosaic's scoped
        # stack is 16 MB (21 MB was measured to fail in round 4)
        base_est = (C * 8 * Kp * 4 + 8 * Kp * 4
                    + 3 * C * Kp * 4 + Wp * 512 * 4)
        if img_bytes + base_est <= 14 * 1024 * 1024:
            return "banded"
        # image too big to live in VMEM whole (the C=8 census L0): keep it
        # in HBM and double-buffer (C, band, Wp) row slabs per point block
        # — the bands are fixed by the initial pose, so each iteration
        # re-streams ~C*band*Wp*NB bytes (tens of MB at KITTI L0, ~40 us
        # of HBM bandwidth) while the MXU works the previous slab
        if bf16_img:
            n_blocks = Kp // 512
            slab = C * _band_for(rows, n_blocks) * Wp * 2
            if base_est + 2 * slab <= 14 * 1024 * 1024:
                return "hbm"
    return None


def _band_for(rows: int, n_blocks: int) -> int:
    """Static band height: nominal block span + margin for warp motion and
    interpolation, sublane-aligned and capped at the level height."""
    Hp = _round_up(rows, 8)
    return min(Hp, _round_up(Hp // n_blocks + 32, 8))


def _bf16_img(C: int, opts) -> bool:
    """bf16 VMEM image storage: only for unit-scale census stacks (the same
    measured policy as the bf16 column mix, GNOptions.fused_bf16)."""
    return C > 1 and getattr(opts, "fused_bf16", "0") == "1"


def supports(rows: int, cols: int, C: int, K: int, opts) -> bool:
    """Static eligibility: level shapes + the option subset the kernel
    implements (solver/gauss_newton.py consults this).  Since round 5 this
    includes the FINEST level for shapes inside the banded envelope — the
    kernel's honest H/g/weights export made that legal."""
    return (_variant(rows, cols, C, K, _bf16_img(C, opts)) is not None
            and opts.warp == "RigidBody"
            and not opts.verbose
            and opts.interp in (InterpolationType.LINEAR,
                                InterpolationType.COSINE))


def make_level_gn(rows: int, cols: int, C: int, K: int, opts,
                  interpret: bool = False):
    """Build the one-kernel level runner.

    Returns ``run(points (K,3), valid (K,), pixels (C,K), jacobians (C,K,6),
    channels (C,rows,cols), T0 (4,4), sigma0, dscale0, s, c) ->
    (T (4,4), stats (8,), H (6,6), g (6,), w (C,K), band_overflow)`` with
    stats as written by the kernel (iters, f_norm, g_norm, status, sigma,
    delta_scale, converged, solver_ok) and H/g/w the normal equations +
    IRLS weights of the LAST linearization — same semantics as
    gauss_newton.run's GNState.  ``band_overflow`` is the count of points
    the banded variant dropped for leaving their block's row band at the
    last linearization (0 for the small variant).
    """
    loss_name = {LossFunctionType.TUKEY: "Tukey",
                 LossFunctionType.HUBER: "Huber",
                 LossFunctionType.L2: "L2"}[opts.loss]
    Hp = _round_up(rows, 8)
    Wp = _round_up(cols, 128)
    Kp = _round_up(K, 128)
    bf16_img = _bf16_img(C, opts)
    variant = _variant(rows, cols, C, K, bf16_img)
    assert variant is not None, (rows, cols, C, K)
    banded = variant in ("banded", "hbm")
    hbm = variant == "hbm"
    # the small program always stores the image f32 (kept byte-identical)
    bf16_img = bf16_img and banded
    n_blocks = Kp // 512 if banded else 1
    band = _band_for(rows, n_blocks) if banded else 0

    static = dict(
        H=rows, W=cols, C=C, K=K, loss=loss_name,
        cosine=(opts.interp == InterpolationType.COSINE),
        max_iterations=opts.max_iterations,
        function_tolerance=opts.function_tolerance,
        parameter_tolerance=opts.parameter_tolerance,
        gradient_tolerance=opts.gradient_tolerance,
        scale_tolerance=opts.scale_tolerance,
        scale_tolerance_rel=opts.scale_tolerance_rel)
    kern = (partial(_kernel_banded, band=band, bf16_mix=bf16_img, **static)
            if banded else partial(_kernel, **static))

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # scal (16,)
        pl.BlockSpec(memory_space=pltpu.SMEM),   # T0 (16,)
    ]
    if banded:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # bases (NB,)
    in_specs += [
        pl.BlockSpec(memory_space=pltpu.VMEM),   # pts (8, Kp)
        pl.BlockSpec(memory_space=pltpu.VMEM),   # jp (C, 8, Kp)
        # image: VMEM-resident, or HBM with per-block slab DMA when it
        # exceeds the VMEM envelope (the C=8 census L0)
        pl.BlockSpec(memory_space=pltpu.ANY if hbm else pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # T out (16,)
        pl.BlockSpec(memory_space=pltpu.SMEM),   # stats (8,)
        pl.BlockSpec(memory_space=pltpu.VMEM),   # h8: last (8,8) block
        pl.BlockSpec(memory_space=pltpu.VMEM),   # w: last IRLS weights
    ]
    out_shape = [
        jax.ShapeDtypeStruct((16,), jnp.float32),
        jax.ShapeDtypeStruct((8,), jnp.float32),
        jax.ShapeDtypeStruct((8, 128), jnp.float32),
        jax.ShapeDtypeStruct((C, Kp), jnp.float32),
    ]
    if banded:
        out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # overflow
        out_shape.append(jax.ShapeDtypeStruct((1,), jnp.float32))
    scratch_shapes = []
    if hbm:
        scratch_shapes = [
            pltpu.VMEM((2, C, band, Wp), jnp.bfloat16),  # slab double-buffer
            pltpu.SemaphoreType.DMA((2,)),
        ]

    call = pl.pallas_call(
        kern,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )

    def run(cam, points, valid, pixels, jacobians, channels, T0, sigma0,
            dscale0, s, c):
        pts = jnp.zeros((8, Kp), jnp.float32)
        pts = pts.at[0, :K].set(points[:, 0])
        pts = pts.at[1, :K].set(points[:, 1])
        pts = pts.at[2, :K].set(points[:, 2])
        pts = pts.at[3, :K].set(valid.astype(jnp.float32))
        # jp: rows 0..5 J^T, 6 pixel, 7 zero
        J = jnp.pad(jnp.moveaxis(jacobians, 2, 1).astype(jnp.float32),
                    ((0, 0), (0, 0), (0, Kp - K)))
        px = jnp.pad(pixels.astype(jnp.float32), ((0, 0), (0, Kp - K)))
        jp = jnp.concatenate([J, px[:, None, :],
                              jnp.zeros((C, 1, Kp), jnp.float32)], axis=1)
        img = jnp.pad(channels.astype(jnp.bfloat16 if bf16_img
                                      else jnp.float32),
                      ((0, 0), (0, Hp - rows), (0, Wp - cols)))
        scal = jnp.stack([
            jnp.asarray(cam.fx, jnp.float32), jnp.asarray(cam.fy, jnp.float32),
            jnp.asarray(cam.cx, jnp.float32), jnp.asarray(cam.cy, jnp.float32),
            jnp.asarray(s, jnp.float32),
            jnp.asarray(c[0], jnp.float32), jnp.asarray(c[1], jnp.float32),
            jnp.asarray(c[2], jnp.float32),
            jnp.asarray(sigma0, jnp.float32),
            jnp.asarray(dscale0, jnp.float32),
            *([jnp.asarray(0.0, jnp.float32)] * 6)])
        T16 = jnp.reshape(jnp.asarray(T0, jnp.float32), (16,))
        if banded:
            # per-block row-band bases (in units of 8 rows) from the INITIAL
            # pose: the band is centered on each block's projected row span,
            # with the static margin in `band` absorbing the solve's pose
            # updates (violations are dropped + counted, never corrupted)
            Tm = jnp.reshape(T16, (4, 4))
            P = pts[0:3, :]
            Xc = Tm[:3, :3] @ P + Tm[:3, 3:4]
            zi = 1.0 / jnp.where(jnp.abs(Xc[2]) > 1e-12, Xc[2], 1e-12)
            vrow = jnp.asarray(cam.fy, jnp.float32) * Xc[1] * zi \
                + jnp.asarray(cam.cy, jnp.float32)
            vrow = jnp.clip(vrow, 0.0, rows - 1.0)
            vb = vrow.reshape(n_blocks, 512)
            okb = (pts[3, :] > 0).reshape(n_blocks, 512)
            big = jnp.asarray(1e9, jnp.float32)
            lo = jnp.min(jnp.where(okb, vb, big), axis=1)
            hi = jnp.max(jnp.where(okb, vb, -big), axis=1)
            # empty blocks: center mid-image
            empty = ~jnp.any(okb, axis=1)
            lo = jnp.where(empty, rows * 0.5, lo)
            hi = jnp.where(empty, rows * 0.5, hi)
            center = 0.5 * (lo + hi)
            base = jnp.clip(center - band * 0.5, 0.0, float(Hp - band))
            bases = (base.astype(jnp.int32) // 8).astype(jnp.int32)
            outT, stats, h8, w, bo = call(scal, T16, bases, pts, jp, img)
            overflow = bo[0].astype(jnp.int32)
        else:
            outT, stats, h8, w = call(scal, T16, pts, jp, img)
            overflow = jnp.asarray(0, jnp.int32)
        # h8 is the last reduce_system block: [0:6,0:6] = J^T W J,
        # [i,6] = (J^T W r)_i, [6,6] = sum w r^2
        return (jnp.reshape(outT, (4, 4)), stats,
                h8[0:6, 0:6], h8[0:6, 6], w[:, :K], overflow)

    return run
