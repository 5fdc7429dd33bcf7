"""IRLS Gauss-Newton pose refinement on one pyramid level, as a jitted
``lax.while_loop``.

Counterpart of the reference's CRTP optimizer framework
(``bpvo/pose_estimator_base.h``: main loop at :324-407, the three convergence
tests at :258-282; ``bpvo/pose_estimator_gn.h``: linearize =
residuals -> scale -> weights -> J^T W J at :70-81) and of its per-level
parameter relaxation (``bpvo/pose_estimator_params.cc:36-47``).

Flow per iteration (inverse compositional — template Jacobians fixed):
  r, valid = photometric residuals at T
  sigma    = robust scale (skipped once stable, mestimator.cc:467-490)
  w        = M-estimator weights
  H, g, f  = J^T W J, J^T W r, sqrt(sum w r^2)
  dp       = solve(H, g)    (Levenberg-augmented fallback)
  T       <- T * Tn^{-1} exp(-dp) Tn     (pose_estimator_base.h:371-390)

The LM trust-region variant is in ``bpvo_tpu/solver/levenberg_marquardt.py``.
"""
from __future__ import annotations

import dataclasses
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bpvo_tpu.config import AlgorithmParameters
from bpvo_tpu.solver import linear_system, mestimator
from bpvo_tpu.types import (InterpolationType, LossFunctionType,
                            PoseEstimationStatus)
from bpvo_tpu.vo import template_data as td_mod
from bpvo_tpu.vo import warp as warp_mod

_SQRT_EPS = 3.452669831e-4  # sqrt(float32 machine eps), pose_estimator_base.h:262

# integer status codes used inside jit (mapped back to PoseEstimationStatus)
STATUS_MAX_ITERATIONS = 0
STATUS_PARAMETER_TOL = 1
STATUS_FUNCTION_TOL = 2
STATUS_GRADIENT_TOL = 3
STATUS_SOLVER_ERROR = 4

STATUS_ENUMS = {
    STATUS_MAX_ITERATIONS: PoseEstimationStatus.MAX_ITERATIONS,
    STATUS_PARAMETER_TOL: PoseEstimationStatus.PARAMETER_TOL_REACHED,
    STATUS_FUNCTION_TOL: PoseEstimationStatus.FUNCTION_TOL_REACHED,
    STATUS_GRADIENT_TOL: PoseEstimationStatus.GRADIENT_TOL_REACHED,
    STATUS_SOLVER_ERROR: PoseEstimationStatus.SOLVER_ERROR,
}


@dataclasses.dataclass(frozen=True)
class GNOptions:
    """Static (hashable) per-level optimizer configuration."""
    max_iterations: int = 50
    function_tolerance: float = 1e-6
    parameter_tolerance: float = 1e-7
    gradient_tolerance: float = 1e-8
    loss: LossFunctionType = LossFunctionType.TUKEY
    interp: InterpolationType = InterpolationType.LINEAR
    scale_tolerance: float = 1e-6   # AutoScaleEstimator tol (mestimator.h:63)
    # RELATIVE sigma-stability tolerance: re-estimation stops once the last
    # sigma step was below ``scale_tolerance_rel * sigma`` (in addition to
    # the reference's absolute test above).  The reference's 1e-6 absolute
    # tolerance is effectively "never stable" for unit-scale descriptors
    # (BitPlanes sigma ~0.05-0.3), so sigma keeps drifting with the pose,
    # the cost stays non-stationary, and the function-tolerance test cannot
    # fire — measured grind: 28-46 GN iters/frame on BitPlanes (vs ~17 for
    # intensity) with zero accuracy benefit.  Measured A/B (KITTI-shape
    # value-noise scene, 12 frames): BitPlanes 30.3 iters/err 0.0025 at 0 ->
    # 21.0/0.0023 at 0.01 -> 19.2/0.0022 at 0.05; intensity 17.6/2e-5 ->
    # 16.9/2e-5 at 0.01.  Default 0.01; 0 restores reference semantics.
    # BPVO_SCALE_TOL_REL overrides — resolved per CONSTRUCTION (default
    # factory), not at import, so setting the env var after importing
    # bpvo_tpu still takes effect (and the GNOptions hash used as the Pallas
    # kernel cache key reflects the live value).
    scale_tolerance_rel: float = dataclasses.field(
        default_factory=lambda: float(
            os.environ.get("BPVO_SCALE_TOL_REL", "0.01")))
    use_histogram_median: bool = True
    # per-iteration table like the reference's kIteration verbosity
    # (pose_estimator_base.h:231-247), printed from inside the jitted loop
    verbose: bool = False
    # warp parameterization: "RigidBody" | "DisparitySpace" (config warpType)
    warp: str = "RigidBody"
    # linearization backend: "jnp" (XLA gather path), "fused" (the Pallas
    # band+one-hot kernel, ops/pallas/gn_kernel.py — RigidBody +
    # Linear/Cosine only; falls back to jnp otherwise), or "auto" (fused on
    # TPU, jnp elsewhere — chosen by on-device measurement, docs/
    # PALLAS_TPU.json linearize_fused_L0_*: 0.476 vs 0.783 ms intensity,
    # 0.882 vs 0.945 ms bitplanes).  BPVO_LINEARIZE env var overrides so the
    # bench can A/B both on device.
    linearize: str = os.environ.get("BPVO_LINEARIZE", "auto")
    # packed-tap storage for the jnp (gather) linearize path: "f32" |
    # "bf16" | "bf16pack" | "auto".  The multi-channel gather dominates
    # BitPlanes (32 taps/point = 693 us/iter at L0), and three storages were
    # measured end-to-end on device: f32 rows 169-180 Hz, plain bf16 rows
    # 134.9 Hz (bf16 row gathers lower badly on v5e), and "bf16pack" — two
    # bf16 taps bitcast into each gathered f32 word, halving the row's
    # f32-word count — 186.1 Hz.  Auto picks bf16pack for C > 1 on TPU and
    # f32 elsewhere; bf16-valued taps are accuracy-neutral (corridor ATE
    # 0.0120 vs 0.0123 m).  See PERFORMANCE.md.
    taps_dtype: str = os.environ.get("BPVO_TAPS_DTYPE", "auto")
    # single-pass bf16 column-mix matmul in the fused kernels ("1" | "0" |
    # "auto").  Measured on device: stacked C=8 drops 0.87 -> 0.38 ms with
    # bf16's ~0.4%-of-value sampling noise.  That noise is relative to the
    # CHANNEL scale, so "auto" resolves to bf16 only for the unit-scale
    # census-bit descriptor (BitPlanes) — ``from_params`` knows the
    # descriptor and resolves it; a raw GNOptions() treats auto as f32.
    # On a 255-scale multi-channel stack the same noise moves the converged
    # pose by ~1e-3 (tests/test_pallas.py cross-backend check), which is why
    # auto is per-descriptor rather than per-channel-count.
    fused_bf16: str = os.environ.get("BPVO_FUSED_BF16", "auto")

    @classmethod
    def from_params(cls, p: AlgorithmParameters, coarse: bool) -> "GNOptions":
        """Coarse levels get relaxed tolerances and the smoother Huber loss
        (reference pose_estimator_params.cc:36-47)."""
        from bpvo_tpu.types import DescriptorType, VerbosityType
        verbose = p.verbosity in (VerbosityType.ITERATION, VerbosityType.DEBUG)
        # resolve the "auto" bf16 column-mix policy per descriptor (see the
        # fused_bf16 field comment): unit-scale census bits tolerate the
        # bf16 sampling noise, 255-scale channels measurably do not
        env_bf16 = os.environ.get("BPVO_FUSED_BF16", "auto")
        bf16 = (env_bf16 if env_bf16 in ("0", "1")
                else ("1" if p.descriptor == DescriptorType.BITPLANES
                      else "0"))
        # sigma-stability tolerance: an explicit BPVO_SCALE_TOL_REL applies
        # to every level; otherwise coarse levels relax to 0.05 — the
        # round-4 sweep measured 0.05 at 19.2 iters / err 0.0022 vs 0.01 at
        # 21.0 / 0.0023 on BitPlanes (equal-or-better accuracy, fewer
        # sigma-driven iterations), and with the round-5 median fix the
        # coarse-level kernel now really pays that re-estimation, so the
        # relaxation belongs with the other coarse-level relaxed tolerances
        # (the finest level, which sets the final pose, stays at 0.01).
        env_rel = os.environ.get("BPVO_SCALE_TOL_REL")
        if not coarse or not p.relaxTolerancesForCoarseLevels:
            rel = float(env_rel) if env_rel is not None else 0.01
            return cls(max_iterations=p.maxIterations,
                       function_tolerance=p.functionTolerance,
                       parameter_tolerance=p.parameterTolerance,
                       gradient_tolerance=p.gradientTolerance,
                       loss=p.lossFunction, interp=p.interp, verbose=verbose,
                       warp=p.warpType, fused_bf16=bf16,
                       scale_tolerance_rel=rel)
        s = p.coarseToleranceScale
        loss = (p.lossFunction if p.lossFunction == LossFunctionType.L2
                else LossFunctionType.HUBER)
        rel = float(env_rel) if env_rel is not None else 0.05
        return cls(max_iterations=min(p.maxIterations, p.coarseMaxIterations),
                   function_tolerance=p.functionTolerance * s,
                   parameter_tolerance=p.parameterTolerance * s,
                   gradient_tolerance=p.gradientTolerance * s,
                   loss=loss, interp=p.interp, verbose=verbose,
                   warp=p.warpType, fused_bf16=bf16,
                   scale_tolerance_rel=rel)


class GNState(NamedTuple):
    T: jnp.ndarray            # (4, 4) current pose
    dp: jnp.ndarray           # (6,) last update
    f_norm: jnp.ndarray       # weighted residual norm at last linearize
    f_norm_prev: jnp.ndarray
    dp_norm_prev: jnp.ndarray
    g: jnp.ndarray            # (6,) gradient at last linearize
    g_tol: jnp.ndarray
    scale: jnp.ndarray        # robust sigma
    delta_scale: jnp.ndarray
    weights: jnp.ndarray      # (C, K) last IRLS weights
    H: jnp.ndarray            # (6, 6) last Hessian
    num_iters: jnp.ndarray    # int32
    status: jnp.ndarray       # int32
    converged: jnp.ndarray    # bool
    solver_ok: jnp.ndarray    # bool
    # telemetry: points the fused Pallas kernel invalidated because their
    # warped row left the per-block band (gn_kernel.py) at the LAST
    # linearization — 0 on the jnp path.  Nonzero means the band assumption
    # is being stressed (fast rotation); see VOResult.band_overflow.
    band_overflow: jnp.ndarray  # int32
    # best-iterate fallback: the lowest evaluated cost and its pose.  GN under
    # IRLS is not monotone; on rare frames the coarse level walks AWAY from
    # the basin (measured: corridor f83 CentralDifference, cost 450 -> 4220
    # over 34 iterations, a 1 m single-frame pose error the reference escapes
    # only by selection luck).  ``run`` returns the best evaluated iterate
    # when the loop ends unconverged with a worse cost.
    T_best: jnp.ndarray       # (4, 4)
    f_best: jnp.ndarray       # cost at T_best


def _sigma_unstable(delta_scale, scale, opts: "GNOptions"):
    """Stable-skip test for sigma re-estimation: absolute (reference
    mestimator.cc:467-490) OR relative (scale_tolerance_rel) threshold."""
    return delta_scale > jnp.maximum(
        jnp.asarray(opts.scale_tolerance, jnp.float32),
        opts.scale_tolerance_rel * scale)


def _linearize(tdata, channels, cam, T, scale, delta_scale, opts: GNOptions,
               packed=None):
    r, valid = td_mod.compute_residuals(tdata, channels, cam, T, opts.interp,
                                        packed=packed, warp=opts.warp)
    # scale re-estimation is skipped once stable (mestimator.cc:467-490) — via
    # lax.cond so the median work is actually not executed when stable.
    # Like the reference's getValidResiduals (linear_system_builder.cc:302-315)
    # we estimate sigma from the first channel only — other channels look alike.
    do_est = _sigma_unstable(delta_scale, scale, opts)
    new_sigma = jax.lax.cond(
        do_est,
        lambda op: mestimator.estimate_scale(op[0], op[1],
                                             opts.use_histogram_median),
        lambda op: scale, (r[0], valid))
    sigma = new_sigma
    new_delta = jnp.where(do_est, jnp.abs(new_sigma - scale), delta_scale)
    w = mestimator.compute_weights(opts.loss, r, valid[None, :], sigma)
    H, g, f_sq = linear_system.build(tdata.jacobians, r, w)
    return (H, g, jnp.sqrt(f_sq), sigma, new_delta, w,
            jnp.asarray(0, jnp.int32))


def _test_convergence(dp_norm, dp_norm_prev, g_norm, f_norm, f_norm_prev,
                      g_tol, opts: GNOptions):
    """The three convergence tests (pose_estimator_base.h:258-282)."""
    p_tol = (dp_norm < opts.parameter_tolerance) | (
        dp_norm < opts.parameter_tolerance * (_SQRT_EPS + dp_norm_prev))
    # the reference's |f - f_prev| < tol test is absolute (pose_estimator_base.h
    # :269-272); with f ~ 1e2-1e3 that is below float32 rounding on TPU, so a
    # RELATIVE decrease test is added — without it every level runs to
    # maxIterations on device
    f_tol = ((f_norm < opts.function_tolerance)
             | (f_norm < opts.function_tolerance * (_SQRT_EPS + f_norm_prev))
             | (jnp.abs(f_norm - f_norm_prev) < opts.function_tolerance)
             | (jnp.abs(f_norm - f_norm_prev)
                < opts.function_tolerance * jnp.maximum(f_norm_prev, 1.0)))
    g_ok = g_norm < g_tol
    status = jnp.where(
        p_tol, STATUS_PARAMETER_TOL,
        jnp.where(f_tol, STATUS_FUNCTION_TOL,
                  jnp.where(g_ok, STATUS_GRADIENT_TOL, STATUS_MAX_ITERATIONS)))
    return p_tol | f_tol | g_ok, status.astype(jnp.int32)


def run(tdata, channels, cam: warp_mod.CameraModel, T_init,
        opts: GNOptions, linearize_fn=None) -> GNState:
    """Run GN to convergence from T_init; returns the full final state.

    Pure function of its inputs — jit with static ``opts``.

    The loop body holds exactly ONE linearization (the reference's structure at
    pose_estimator_base.h:324-407 linearizes both before and inside the loop —
    traced naively that doubles the XLA program, which matters here because
    remote TPU compiles are minutes-long).  Iteration i linearizes at T_i,
    tests convergence against iteration i-1's values, then solves and updates.

    ``linearize_fn(T, scale, delta_scale) -> (H, g, f, sigma, dscale, w)``
    may be overridden — the distributed path injects a psum-reducing variant
    (bpvo_tpu/parallel/sharded.py).
    """
    f32 = jnp.float32
    T0 = jnp.asarray(T_init, f32)
    s, c = tdata.norm_scale, tdata.norm_center
    lin = opts.linearize
    if lin == "auto":
        # Measured on device (docs/PALLAS_TPU.json + PERFORMANCE.md A/B):
        # - C == 1: the fused kernel's one-hot MXU sampling beats XLA's
        #   gather path 2.1x per call (0.33 vs 0.55 ms at KITTI L0) and
        #   332.6 vs 317.8 Hz end-to-end -> fused.
        # - C > 1 with the bf16 column mix (BitPlanes policy): the stacked
        #   kernel wins end-to-end, 266.8 vs 231.8 Hz (round-4 A/B,
        #   bitplanes_backend_ab) -> fused.
        # - C > 1 at f32: the 3-pass f32 MXU decomposition makes the stacked
        #   column mix lose badly (119.3 Hz) -> jnp gather path.
        one_channel = tdata.pixels.shape[0] == 1
        lin = ("fused" if (jax.default_backend() == "tpu"
                           and (one_channel or opts.fused_bf16 == "1"))
               else "jnp")
    use_fused = (lin == "fused" and opts.warp == "RigidBody"
                 and opts.interp in (InterpolationType.LINEAR,
                                     InterpolationType.COSINE))
    if linearize_fn is None and use_fused:
        # Pallas fused path (ops/pallas/gn_kernel.py): sampling + residual +
        # weights + H/g/f in one kernel.  Scale semantics preserved exactly:
        # while sigma is still converging (stable-skip off), a first kernel
        # pass supplies the residuals the histogram median needs, then the
        # weighted reduction runs at the new sigma — the reference's
        # residuals -> scale -> weights order (pose_estimator_gn.h:70-81).
        from bpvo_tpu.ops import interp as interp_mod
        from bpvo_tpu.ops.pallas import gn_kernel
        C_, rows_, cols_ = channels.shape
        K_ = tdata.pixels.shape[1]
        interpret_ = jax.default_backend() == "cpu"
        # C > 1 uses the channel-stacked kernel (one MXU column-mix per point
        # block amortized over all channels, gn_kernel._stacked_kernel) —
        # round 3's (C, NB)-grid kernel rebuilt the column-mix per channel and
        # lost to the XLA gather path at C=8 (1.01 vs 0.95 ms).
        stacked = C_ > 1
        maker = (gn_kernel.make_fused_linearize_stacked if stacked
                 else gn_kernel.make_fused_linearize)
        bf16_ = opts.fused_bf16 == "1"
        runner = maker(rows_, cols_, C_, K_, opts.loss, opts.interp,
                       interpret=interpret_, mxu_bf16=bf16_)
        # sigma is estimated from channel-0 residuals only (same policy as
        # the jnp path / reference linear_system_builder.cc:302-315), so the
        # estimation pass runs a 1-channel kernel instance: (1+C)/C kernel
        # cost instead of 2x while scale is still converging
        # sigma-pass runner shares the bf16 policy: its r0 feeds only the
        # histogram median, where the ~0.4% sampling noise is sub-bin
        runner0 = (runner if C_ == 1 else maker(
            rows_, cols_, 1, K_, opts.loss, opts.interp,
            interpret=interpret_, mxu_bf16=bf16_))
        packer = (gn_kernel.pack_template_stacked if stacked
                  else gn_kernel.pack_template)
        jp = packer(tdata.pixels, tdata.jacobians)
        jp0 = jp if C_ == 1 else (jp[:, :1] if stacked else jp[:1])
        ch_pad = gn_kernel.pad_channels(channels, rows_, cols_)

        if C_ == 1:
            # Single-channel: ONE kernel pass per iteration.  The kernel runs
            # at the incoming sigma and returns r0 = all residuals; when
            # sigma is still converging, the new sigma + weights + H/g are
            # recomputed in XLA from r0 and the HBM-resident Jacobians
            # (~0.2 ms) instead of a second 0.36 ms kernel pass — measured
            # end-to-end, the two-pass variant LOST to the plain gather path
            # (271 vs 318 Hz) precisely because est runs most iterations.
            # The rebuild honors the kernel's band invalidation: ok_k drops
            # the out-of-band points from sigma estimation AND from the
            # rebuilt H (ADVICE round 3), so band overflow degrades to
            # "fewer measurements", never to corrupted rows.
            def linearize_fn(T, scale, dscale):
                u, v, Z = warp_mod.project(cam, T, tdata.points)
                ok = tdata.valid & (Z > 1e-6) & interp_mod.valid_mask(
                    u, v, rows_, cols_, opts.interp)
                do_est = _sigma_unstable(dscale, scale, opts)
                H0, g0, f0_sq, r0, w0, band_ok = runner(
                    u, v, ok, ch_pad, jp, scale)
                n_oob = jnp.sum(ok & ~band_ok).astype(jnp.int32)
                ok_k = ok & band_ok

                def est(_):
                    sigma = mestimator.estimate_scale(
                        r0, ok_k, opts.use_histogram_median)
                    w = mestimator.compute_weights(
                        opts.loss, r0[None, :], ok_k[None, :], sigma)
                    Hn, gn_, fn_sq = linear_system.build(
                        tdata.jacobians, r0[None, :], w)
                    return Hn, gn_, jnp.sqrt(fn_sq), sigma, w

                def keep(_):
                    return H0, g0, jnp.sqrt(f0_sq), scale, w0

                H, g, f, sigma, w = jax.lax.cond(do_est, est, keep, None)
                new_delta = jnp.where(do_est, jnp.abs(sigma - scale), dscale)
                return H, g, f, sigma, new_delta, w, n_oob
        else:
            def linearize_fn(T, scale, dscale):
                u, v, Z = warp_mod.project(cam, T, tdata.points)
                ok = tdata.valid & (Z > 1e-6) & interp_mod.valid_mask(
                    u, v, rows_, cols_, opts.interp)
                do_est = _sigma_unstable(dscale, scale, opts)

                def est(_):
                    _H, _g, _f, r0, _w, bok = runner0(u, v, ok, ch_pad[:1],
                                                      jp0, scale)
                    return mestimator.estimate_scale(
                        r0, ok & bok, opts.use_histogram_median)

                sigma = jax.lax.cond(do_est, est, lambda _: scale, None)
                new_delta = jnp.where(do_est, jnp.abs(sigma - scale), dscale)
                H, g, f_sq, _r0, w, band_ok = runner(u, v, ok, ch_pad, jp,
                                                     sigma)
                n_oob = jnp.sum(ok & ~band_ok).astype(jnp.int32)
                return H, g, jnp.sqrt(f_sq), sigma, new_delta, w, n_oob
    elif linearize_fn is None:
        # channels are constant across iterations: pre-shift them once so each
        # iteration's warped sampling is a single gather (interp.pack_taps)
        from bpvo_tpu.ops import interp as interp_mod
        td_ = opts.taps_dtype
        if td_ == "auto":
            # bf16pack: two bf16 taps bitcast into each gathered f32 word —
            # halves row bytes while keeping the f32 gather layout (plain
            # bf16 rows gather SLOWER on v5e; both measured, see taps_dtype)
            td_ = ("bf16pack" if (jax.default_backend() == "tpu"
                                  and channels.shape[0] > 1) else "f32")
        packed = interp_mod.pack_taps(
            channels, opts.interp,
            dtype={"bf16": jnp.bfloat16, "bf16pack": "bf16pack"}.get(td_))

        loss_irls = {LossFunctionType.TUKEY: "Tukey",
                     LossFunctionType.HUBER: "Huber",
                     LossFunctionType.L2: "L2"}.get(opts.loss)
        irls_env = os.environ.get("BPVO_IRLS_KERNEL", "1")
        use_irls = (tdata.pixels.shape[0] > 1 and loss_irls is not None
                    and (irls_env == "force"      # tests: interpret on CPU
                         or (irls_env != "0"
                             and jax.default_backend() == "tpu")))
        if use_irls:
            # multi-channel reduction via the fused IRLS Pallas kernel
            # (weights + H/g/f in one stream): measured 0.277 vs 0.356 ms
            # for the jnp weights+build pair at BitPlanes scale (131k terms,
            # docs/PALLAS_TPU.json irls_reduce_*).  Same sigma semantics as
            # _linearize; sampling stays the packed-taps gather.
            from bpvo_tpu.ops.pallas import irls_kernel
            C_, K_ = tdata.pixels.shape
            J6 = tdata.jacobians.reshape(C_ * K_, 6).T  # once per level run

            def linearize_fn(T, scale, dscale):
                r, valid = td_mod.compute_residuals(
                    tdata, channels, cam, T, opts.interp, packed=packed,
                    warp=opts.warp)
                do_est = _sigma_unstable(dscale, scale, opts)
                sigma = jax.lax.cond(
                    do_est,
                    lambda op: mestimator.estimate_scale(
                        op[0], op[1], opts.use_histogram_median),
                    lambda op: scale, (r[0], valid))
                new_delta = jnp.where(do_est, jnp.abs(sigma - scale), dscale)
                vflat = jnp.broadcast_to(valid[None, :],
                                         (C_, K_)).reshape(-1)
                H, g, f_sq, w = irls_kernel.irls_reduce_w(
                    J6, r.reshape(-1), vflat, sigma, loss_irls,
                    interpret=(jax.default_backend() == "cpu"))
                return (H, g, jnp.sqrt(f_sq), sigma, new_delta,
                        w.reshape(C_, K_), jnp.asarray(0, jnp.int32))
        else:
            def linearize_fn(T, scale, dscale):
                return _linearize(tdata, channels, cam, T, scale, dscale,
                                  opts, packed=packed)

    C, K = tdata.pixels.shape
    init = GNState(
        T=T0, dp=jnp.zeros(6, f32), f_norm=jnp.asarray(0.0, f32),
        f_norm_prev=jnp.asarray(0.0, f32),
        dp_norm_prev=jnp.asarray(0.0, f32), g=jnp.zeros(6, f32),
        g_tol=jnp.asarray(0.0, f32), scale=jnp.asarray(1.0, f32),
        delta_scale=jnp.asarray(1e10, f32),
        weights=jnp.zeros((C, K), f32), H=jnp.eye(6, dtype=f32),
        num_iters=jnp.asarray(0, jnp.int32),
        status=jnp.asarray(STATUS_MAX_ITERATIONS, jnp.int32),
        converged=jnp.asarray(False), solver_ok=jnp.asarray(True),
        band_overflow=jnp.asarray(0, jnp.int32),
        T_best=T0, f_best=jnp.asarray(jnp.inf, f32))

    def cond(st: GNState):
        return (~st.converged) & st.solver_ok & (
            st.num_iters < opts.max_iterations)

    def body(st: GNState):
        first = st.num_iters == 0
        H, g, f_new, sigma, dscale, w, n_oob = linearize_fn(
            st.T, st.scale, st.delta_scale)
        g_norm = jnp.max(jnp.abs(g))
        # first-order-optimality threshold fixed from the first gradient
        # (pose_estimator_base.h:341-343)
        g_tol = jnp.where(
            first, opts.gradient_tolerance * jnp.maximum(g_norm, _SQRT_EPS),
            st.g_tol)

        dp_norm = jnp.linalg.norm(st.dp)
        conv, status = _test_convergence(
            dp_norm, st.dp_norm_prev, g_norm, f_new, st.f_norm, g_tol, opts)
        # on the first iteration only the gradient test applies
        # (pose_estimator_base.h:346-360)
        g_conv = g_norm < g_tol
        conv = jnp.where(first, g_conv, conv)
        status = jnp.where(
            first, jnp.where(g_conv, STATUS_GRADIENT_TOL,
                             STATUS_MAX_ITERATIONS),
            status).astype(jnp.int32)

        dp, ok = linear_system.solve(H, g)
        do_update = (~conv) & ok
        if opts.verbose:
            jax.debug.print(
                "  it {it}  |F|={f:.6g}  |G|={g:.4g}  |dp|={dp:.4g}  "
                "sigma={s:.4g}", it=st.num_iters, f=f_new, g=g_norm,
                dp=jnp.linalg.norm(dp), s=sigma)
        T = jnp.where(do_update, st.T @ warp_mod.params_to_pose(-dp, s, c),
                      st.T)
        better = f_new < st.f_best
        return GNState(
            T=T, dp=jnp.where(do_update, dp, st.dp), f_norm=f_new,
            f_norm_prev=st.f_norm, dp_norm_prev=dp_norm, g=g, g_tol=g_tol,
            scale=sigma, delta_scale=dscale, weights=w, H=H,
            num_iters=st.num_iters + 1,
            status=jnp.where(ok, status, STATUS_SOLVER_ERROR).astype(jnp.int32),
            converged=conv, solver_ok=ok,
            band_overflow=jnp.maximum(st.band_overflow, n_oob),
            T_best=jnp.where(better, st.T, st.T_best),
            f_best=jnp.where(better, f_new, st.f_best))

    st = jax.lax.while_loop(cond, body, init)
    # Unconverged exits (max iterations / solver error) whose final evaluated
    # cost exceeds the best seen fall back to the best evaluated iterate —
    # f_new in the loop is the cost of the ENTERING pose, so on convergence
    # st.T is the evaluated pose and is kept as-is.
    use_best = (~st.converged) & (st.f_best < st.f_norm)
    return st._replace(T=jnp.where(use_best, st.T_best, st.T))


_LEVEL_KERNEL_CACHE = {}


def level_kernel_enabled() -> bool:
    """Whole-level-GN Pallas kernel policy (BPVO_LEVEL_KERNEL): "auto"
    (default) = on for TPU, "force" = on everywhere (interpret mode on CPU —
    tests), "0" = off.

    Measured end-to-end (BENCH_DETAIL / docs/PERFORMANCE.md round 4): the
    kernel lifts the full bench from 370.9 -> 418.6 Hz intensity and
    277.3 -> 312.9 Hz BitPlanes.  Correctness is parity-tested vs
    gauss_newton.run (tests/test_pallas.py TestLevelGnKernel).  One caveat
    for THIS container's tunneled remote compiler: programs embedding
    in-kernel while-loops compile slowly (tens of minutes for the full VO
    scan) — on a normal TPU host with a local compiler this does not apply;
    set BPVO_LEVEL_KERNEL=0 when compile latency matters more than
    steady-state rate."""
    env = os.environ.get("BPVO_LEVEL_KERNEL", "auto")
    if env == "0":
        return False
    if env == "force":
        return True
    return jax.default_backend() == "tpu"


def level_kernel_supported(opts: GNOptions, C: int, rows: int, cols: int,
                           K: int) -> bool:
    from bpvo_tpu.ops.pallas import level_gn_kernel as lk
    return (opts.loss in (LossFunctionType.TUKEY, LossFunctionType.HUBER,
                          LossFunctionType.L2)
            and lk.supports(rows, cols, C, K, opts))


def fine_level_kernel_enabled() -> bool:
    """Whole-level kernel at the FINEST level (BPVO_L0_KERNEL: "auto" = on
    wherever the coarse kernel is on, "0" = off).  Round 4 barred the finest
    level because run_level_fused returned sentinel weights/H that Result /
    fraction-of-good-points consume; the round-5 honest export removed the
    blocker, and the banded envelope covers the K=16384 L0 (intensity: f32
    image 1.9 MB VMEM; the C=8 census L0 image only fits as bf16 and its
    jp does not, so BitPlanes L0 stays on the XLA route — see
    level_gn_kernel._variant)."""
    if os.environ.get("BPVO_L0_KERNEL", "auto") == "0":
        return False
    return level_kernel_enabled()


def run_level_fused(tdata, channels, cam, T_init, opts: GNOptions) -> GNState:
    """One-kernel coarse-level GN (ops/pallas/level_gn_kernel.py): the entire
    IRLS loop — sampling, sigma, weights, normal equations, 6x6 solve, exp
    map, convergence tests, best-iterate fallback — in a single Pallas
    invocation.  Same contract as ``run`` (a GNState): since round 5 the
    kernel exports the H / g / IRLS weights of its last linearization, so
    the state is fully honest (no zero/sentinel fields — VERDICT r4 item 8;
    parity vs the XLA path in tests/test_pallas.py
    test_fused_state_is_honest)."""
    from bpvo_tpu.ops.pallas import level_gn_kernel as lk

    C, rows, cols = channels.shape
    K = tdata.pixels.shape[1]
    interpret = jax.default_backend() == "cpu"
    key = (rows, cols, C, K, opts, interpret)
    if key not in _LEVEL_KERNEL_CACHE:
        _LEVEL_KERNEL_CACHE[key] = lk.make_level_gn(rows, cols, C, K, opts,
                                                    interpret=interpret)
    runner = _LEVEL_KERNEL_CACHE[key]
    f32 = jnp.float32
    T, stats, H, g, w, bo = runner(cam, tdata.points, tdata.valid,
                                   tdata.pixels, tdata.jacobians, channels,
                                   jnp.asarray(T_init, f32),
                                   jnp.asarray(1.0, f32),
                                   jnp.asarray(1e10, f32),
                                   tdata.norm_scale, tdata.norm_center)
    return GNState(
        T=T, dp=jnp.zeros(6, f32), f_norm=stats[1], f_norm_prev=stats[1],
        dp_norm_prev=jnp.asarray(0.0, f32), g=g,
        g_tol=jnp.asarray(0.0, f32), scale=stats[4], delta_scale=stats[5],
        weights=w, H=H,
        num_iters=stats[0].astype(jnp.int32),
        status=stats[3].astype(jnp.int32),
        converged=stats[6] > 0.5, solver_ok=stats[7] > 0.5,
        band_overflow=bo, T_best=T, f_best=stats[1])


def fraction_of_good_points(weights, num_channels, num_valid, threshold):
    """count(w > thresh) / (C * N) (reference vo_pose_estimator.cc:101-107);
    N is the true (unpadded) template point count."""
    n_good = jnp.sum(weights > threshold)
    denom = jnp.maximum(num_channels * num_valid, 1)
    return n_good.astype(jnp.float32) / denom.astype(jnp.float32)
