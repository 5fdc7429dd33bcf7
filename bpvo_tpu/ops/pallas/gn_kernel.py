"""Fused Pallas TPU kernel for one GN linearization: warped sampling +
residual + IRLS weight + normal-equation reduction in a single VMEM-resident
stream (SURVEY §7 Phase 4; replaces the reference's photo_error.cc:336-459 +
mestimator.cc:242-385 + linear_system_builder.cc:140-205 pipeline).

The one irregular access — I1 at warped points — is the design crux: Mosaic
has NO per-lane dynamic gather (probed on device, docs/PALLAS_TPU.json
``pallas_taa_*``), so sampling is reformulated gather-free:

  * points stay on LANES end-to-end (no layout transposes);
  * per point-block, a dynamic slice pulls a BAND-row window of the channel
    image around the block's min warped row (raster-sorted selection keeps
    blocks row-local);
  * bilinear x: a 2-hot matrix (W, B) built from iota compares carries both
    column selection AND the x interpolation weights; band @ onehot runs on
    the MXU -> (BAND, B) column mix;
  * bilinear y: 2-hot row weights from a sublane iota compare, VPU multiply +
    sublane-reduce -> the sampled row I1 (B,);
  * residual, M-estimator weight, and the (8,B)x(8,B) lane-contraction
    rank-update of the packed H/g/f accumulator (irls_kernel's layout) follow
    in-register.

Points whose warped row falls outside the block's band are INVALIDATED (w=0),
not mis-sampled; selection block-balances valid points across BLOCK-sized
chunks (ops/selection.py) so each chunk's row span is ~rows/NB regardless of
capacity fill, well inside the band (measured spans 23-28 vs band 56 at KITTI
shape; device parity vs the jnp path in docs/PALLAS_TPU.json
``fused_vs_jnp_reldiff_*``).  Coarse levels size the band to the whole
(padded) image so they are always exact.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bpvo_tpu.solver.mestimator import HUBER_K, TUKEY_T
from bpvo_tpu.types import InterpolationType, LossFunctionType

BLOCK = 1024          # points per grid step (selection block-balances to this)
BAND_MARGIN = 32      # extra band rows beyond the mean block span: covers
                      # selection-density variation + inter-frame flow + the
                      # <=7-row 8-alignment shift of the band base


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


def _kernel(sigma_ref, bases_ref, u_ref, v_ref, valid_ref, img_ref, jp_ref,
            out_ref, r0_ref, w_ref, acc_ref, *,
            H: int, W: int, band: int, loss: str, cosine: bool,
            mxu_bf16: bool = False):
    """Grid (C, NB) — point blocks INNERMOST so the (1, Hp, Wp) channel
    block's index map is constant across consecutive grid steps and Mosaic's
    pipeline skips its DMA (channel loaded once per c, not once per (c, b):
    at KITTI shape that is 15 MB vs 243 MB of HBM traffic for 8 channels).
    Refs:
      sigma (1,) SMEM; bases (NB,) SMEM per-block band starts (computed in
      XLA — an in-kernel vector-min-fed dynamic slice crashes Mosaic, probed:
      docs/PALLAS_TPU.json band_bisect.v2); u/v/valid (1, 8, B) blocks (row 0
      live); img (1, Hp, Wp) = this channel; jp (1, 1, 8, B) = rows 0..5 J,
      6 pixel; out (8, 128) accumulator output; r0 (1, 8, B) ch-0 residuals.
    """
    c = pl.program_id(0)
    b = pl.program_id(1)
    nc = pl.num_programs(0)
    nb = pl.num_programs(1)

    @pl.when((b == 0) & (c == 0))
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    u = u_ref[0, 0, :]
    v = v_ref[0, 0, :]
    val = valid_ref[0, 0, :]
    xi = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, W - 2)
    yi = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, H - 2)
    xf = u - xi.astype(jnp.float32)
    yf = v - yi.astype(jnp.float32)

    Hp = img_ref.shape[1]
    Wp = img_ref.shape[2]
    if band >= Hp:
        base = 0
        band_rows = Hp
    else:
        # bases are stored PRE-DIVIDED by 8 and re-multiplied here: Mosaic
        # requires a static proof that a sublane-dim dynamic-slice start is a
        # multiple of 8, and `x * 8` is the proof (probed on device — a raw
        # SMEM value fails with "cannot statically prove that index in
        # dimension 1 is a multiple of 8"; docs/PALLAS_TPU.json).
        base = bases_ref[b] * 8
        band_rows = band
    bandm = img_ref[0, pl.ds(base, band_rows), :]        # (band, Wp)

    if cosine:
        xm = (1.0 - jnp.cos(xf * jnp.pi)) * 0.5
        ym = (1.0 - jnp.cos(yf * jnp.pi)) * 0.5
    else:
        xm, ym = xf, yf

    # x selection + interpolation on the MXU
    cid = jax.lax.broadcasted_iota(jnp.int32, (Wp, BLOCK), 0)
    onehot = (jnp.where(cid == xi[None, :], 1.0 - xm[None, :], 0.0)
              + jnp.where(cid == xi[None, :] + 1, xm[None, :], 0.0))
    if mxu_bf16:
        colmix = jax.lax.dot_general(
            bandm.astype(jnp.bfloat16), onehot.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)         # (band, BLOCK)
    else:
        colmix = jax.lax.dot_general(
            bandm, onehot, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (band, BLOCK)

    # y selection + interpolation on the VPU
    rel = yi - base
    band_ok = (rel >= 0) & (rel <= band_rows - 2)
    relc = jnp.clip(rel, 0, band_rows - 2)
    rid = jax.lax.broadcasted_iota(jnp.int32, (band_rows, BLOCK), 0)
    row_w = (jnp.where(rid == relc[None, :], 1.0 - ym[None, :], 0.0)
             + jnp.where(rid == relc[None, :] + 1, ym[None, :], 0.0))
    I1 = jnp.sum(colmix * row_w, axis=0)                 # (BLOCK,)

    jp = jp_ref[0, 0]                                    # (8, BLOCK)
    vmask = val * band_ok.astype(jnp.float32)
    r = (I1 - jp[6, :]) * vmask
    sigma = sigma_ref[0]
    w = _weight(r / sigma, loss) * vmask                 # (BLOCK,)

    # r0 is a per-(c, b) block written unconditionally: a block revisited
    # non-consecutively (index map (b, 0, 0) under grid (C, NB)) is copied out
    # of VMEM on EVERY revisit by the Pallas TPU pipeline, so a write gated on
    # c == 0 leaves stale buffer contents for c > 0 (ADVICE round 3, medium).
    # Row 0 carries this channel's residuals, row 1 the band-validity mask so
    # callers can drop kernel-invalidated points from sigma estimation.
    rid8r = jax.lax.broadcasted_iota(jnp.int32, (8, BLOCK), 0)
    r0_ref[0, 0, :, :] = jnp.where(
        rid8r == 0, jnp.broadcast_to(r[None, :], (8, BLOCK)),
        jnp.where(rid8r == 1,
                  jnp.broadcast_to(band_ok.astype(jnp.float32)[None, :],
                                   (8, BLOCK)), 0.0))

    w_ref[0, 0, :, :] = jnp.broadcast_to(w[None, :], (8, BLOCK))

    # rank update of the packed accumulator (irls_kernel layout):
    # rhs rows 0..5 = J, 6 = r, 7 = r; lhs = [w*J rows; w*r; 0]
    rid8 = jax.lax.broadcasted_iota(jnp.int32, (8, BLOCK), 0)
    rbc = jnp.broadcast_to(r[None, :], (8, BLOCK))
    wbc = jnp.broadcast_to(w[None, :], (8, BLOCK))
    rhs = jnp.where(rid8 >= 6, rbc, jp)                  # rows 6,7 = r
    lhs = jnp.where(rid8 == 7, 0.0, jnp.where(rid8 == 6, rbc, jp)) * wbc
    block8 = jax.lax.dot_general(
        lhs, rhs, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (8, 8)
    # block8[0:6,0:6] = H, [0:6,6] = g, [6,6] = f_sq = sum w r^2
    acc_ref[:, :] += jnp.pad(block8, ((0, 0), (0, 120)))

    @pl.when((b == nb - 1) & (c == nc - 1))
    def _():
        out_ref[:, :] = acc_ref[:, :]


def make_fused_linearize(rows: int, cols: int, C: int, K: int,
                         loss: LossFunctionType,
                         interp: InterpolationType = InterpolationType.LINEAR,
                         interpret: bool = False, mxu_bf16: bool = False):
    """Build the fused kernel runner specialized to one pyramid level.

    Returns ``run(u, v, valid, channels, jp, sigma) ->
    (H6 (6,6), g (6,), f_sq, r0 (K,), w (C,K))`` where ``channels`` is the raw
    (C, rows, cols) stack and ``jp`` the packed (C, NB, 8, BLOCK) template
    (see ``pack_template``).
    """
    if interp not in (InterpolationType.LINEAR, InterpolationType.COSINE):
        raise ValueError("fused kernel supports Linear/Cosine interpolation")
    loss_name = {LossFunctionType.TUKEY: "Tukey",
                 LossFunctionType.HUBER: "Huber",
                 LossFunctionType.L2: "L2"}[loss]
    Hp = _round_up(rows, 8)
    Wp = _round_up(cols, 128)
    Kp = _round_up(K, BLOCK)
    NB = Kp // BLOCK
    # band sized to the MEAN rows-per-block of raster-sorted points plus a
    # flow margin; blocks denser than the mean center their band on their own
    # span (midpoint bases), sparser ones invalidate the overflow
    band = min(Hp, _round_up(Hp // NB + BAND_MARGIN, 8))

    kern = partial(_kernel, H=rows, W=cols, band=band, loss=loss_name,
                   cosine=(interp == InterpolationType.COSINE),
                   mxu_bf16=mxu_bf16)

    grid = (C, NB)
    call = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                # sigma (1,)
            pl.BlockSpec(memory_space=pltpu.SMEM),                # bases (NB,)
            pl.BlockSpec((1, 8, BLOCK), lambda c, b: (b, 0, 0),
                         memory_space=pltpu.VMEM),                # u
            pl.BlockSpec((1, 8, BLOCK), lambda c, b: (b, 0, 0),
                         memory_space=pltpu.VMEM),                # v
            pl.BlockSpec((1, 8, BLOCK), lambda c, b: (b, 0, 0),
                         memory_space=pltpu.VMEM),                # valid
            pl.BlockSpec((1, Hp, Wp), lambda c, b: (c, 0, 0),
                         memory_space=pltpu.VMEM),                # channel c
            pl.BlockSpec((1, 1, 8, BLOCK), lambda c, b: (c, b, 0, 0),
                         memory_space=pltpu.VMEM),                # jp
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),                # out (8,128)
            pl.BlockSpec((1, 1, 8, BLOCK), lambda c, b: (c, b, 0, 0),
                         memory_space=pltpu.VMEM),                # r0
            pl.BlockSpec((1, 1, 8, BLOCK), lambda c, b: (c, b, 0, 0),
                         memory_space=pltpu.VMEM),                # w
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((C, NB, 8, BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((C, NB, 8, BLOCK), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        interpret=interpret,
    )

    def run(u, v, valid, channels, jp, sigma):
        pad = Kp - K
        uu = jnp.pad(u.astype(jnp.float32), (0, pad))
        vv = jnp.pad(v.astype(jnp.float32), (0, pad))
        vm = jnp.pad(valid.astype(jnp.float32), (0, pad))
        u3 = jnp.broadcast_to(uu.reshape(NB, 1, BLOCK), (NB, 8, BLOCK))
        v3 = jnp.broadcast_to(vv.reshape(NB, 1, BLOCK), (NB, 8, BLOCK))
        m3 = jnp.broadcast_to(vm.reshape(NB, 1, BLOCK), (NB, 8, BLOCK))
        # channels may be passed pre-padded (pad_channels) so the copy is
        # hoisted out of the GN while-loop instead of re-run every iteration
        if channels.shape[1:] == (Hp, Wp):
            ch = channels.astype(jnp.float32)
        else:
            ch = jnp.pad(channels.astype(jnp.float32),
                         ((0, 0), (0, Hp - rows), (0, Wp - cols)))
        # per-block band start, centered on the block's valid row span
        # (raster-sorted selection keeps spans narrow; out-of-band points are
        # invalidated in-kernel)
        yi2 = jnp.clip(jnp.floor(vv).astype(jnp.int32),
                       0, rows - 2).reshape(NB, BLOCK)
        vm2 = vm.reshape(NB, BLOCK) > 0
        mn = jnp.min(jnp.where(vm2, yi2, rows - 2), axis=1)
        mx = jnp.max(jnp.where(vm2, yi2, 0), axis=1)
        # 8-aligned band starts (stored /8; the kernel re-multiplies so
        # Mosaic can prove sublane alignment of the dynamic slice)
        bases = jnp.clip((mn + mx + 1) // 2 - band // 2, 0, Hp - band) // 8
        out, r0, w = call(jnp.reshape(sigma.astype(jnp.float32), (1,)),
                          bases.astype(jnp.int32),
                          u3, v3, m3, ch, jp)
        H6 = out[:6, :6]
        g = out[:6, 6]
        f_sq = out[6, 6]
        band_ok = r0[0, :, 1, :].reshape(Kp)[:K] > 0.5
        return (H6, g, f_sq, r0[0, :, 0, :].reshape(Kp)[:K],
                w[:, :, 0, :].reshape(C, Kp)[:, :K], band_ok)

    return run


def _stacked_kernel(sigma_ref, bases_ref, u_ref, v_ref, valid_ref, img_ref,
                    jp_ref, out_ref, r0_ref, w_ref, acc_ref, band_sc, sem, *,
                    H: int, W: int, band: int, loss: str, cosine: bool,
                    C: int, mxu_bf16: bool = False):
    """Channel-stacked variant: grid (NB,) — ONE step per point block handles
    ALL channels, so the (Wp, BLOCK) 2-hot column-mix matrix is built once per
    block and amortized across channels by stacking the C band windows into a
    single (C*band, Wp) @ (Wp, BLOCK) MXU pass (the round-3 (C, NB) grid
    rebuilt + re-ran it per channel — at C=8 that left the kernel slower than
    the XLA gather path, VERDICT round 3 item 1).

    The channel stack stays in HBM (memory_space ANY); each step DMAs only the
    (C, band, Wp) band rows around the block's warped-row span into a
    double-buffered VMEM scratch (block b+1's copy is issued before block b's
    compute).  Band-overflow points are invalidated exactly as in the (C, NB)
    kernel and the mask is exported in r0 row 1.
    """
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    Hp = img_ref.shape[1]
    Wp = img_ref.shape[2]

    @pl.when(b == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    if band >= Hp:
        base = 0
        band_rows = Hp
        # whole stack fits the band: DMA once, reuse across blocks
        @pl.when(b == 0)
        def _():
            cp = pltpu.make_async_copy(img_ref, band_sc.at[0], sem.at[0])
            cp.start()
            cp.wait()
        bandm = band_sc[0]                               # (C, Hp, Wp)
    else:
        base = bases_ref[b] * 8
        band_rows = band

        def _dma(slot, blk):
            return pltpu.make_async_copy(
                img_ref.at[:, pl.ds(bases_ref[blk] * 8, band), :],
                band_sc.at[slot], sem.at[slot])

        @pl.when(b == 0)
        def _():
            _dma(0, 0).start()

        @pl.when(b + 1 < nb)
        def _():
            _dma((b + 1) % 2, b + 1).start()

        _dma(b % 2, b).wait()
        bandm = band_sc[b % 2]                           # (C, band, Wp)

    u = u_ref[0, 0, :]
    v = v_ref[0, 0, :]
    val = valid_ref[0, 0, :]
    xi = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, W - 2)
    yi = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, H - 2)
    xf = u - xi.astype(jnp.float32)
    yf = v - yi.astype(jnp.float32)
    if cosine:
        xm = (1.0 - jnp.cos(xf * jnp.pi)) * 0.5
        ym = (1.0 - jnp.cos(yf * jnp.pi)) * 0.5
    else:
        xm, ym = xf, yf

    # x selection + interpolation: ONE stacked MXU pass for all C channels
    cid = jax.lax.broadcasted_iota(jnp.int32, (Wp, BLOCK), 0)
    onehot = (jnp.where(cid == xi[None, :], 1.0 - xm[None, :], 0.0)
              + jnp.where(cid == xi[None, :] + 1, xm[None, :], 0.0))
    flat = bandm.reshape(C * band_rows, Wp)
    if mxu_bf16:
        # single-pass bf16 column mix: image values and 2-hot interpolation
        # weights both fit bf16's 8-bit mantissa to ~4e-3 relative — sampling
        # noise far below the M-estimator's inlier sigma — while the f32
        # 3-pass MXU decomposition costs 3x the cycles.  H/g accumulation
        # stays f32 (the round-1 lesson: accumulator precision is what breaks
        # GN, docs/PERFORMANCE.md).
        flat = flat.astype(jnp.bfloat16)
        onehot = onehot.astype(jnp.bfloat16)
        # DEFAULT precision: the package-global float32 matmul precision
        # would ask Mosaic for an fp32-contract bf16 matmul, which it
        # rejects ("Bad lhs type", probed on device)
        colmix = jax.lax.dot_general(
            flat, onehot, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)         # (C*band, BLOCK)
    else:
        colmix = jax.lax.dot_general(
            flat, onehot, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (C*band, BLOCK)

    # y selection + interpolation on the VPU, shared row weights
    rel = yi - base
    band_ok = (rel >= 0) & (rel <= band_rows - 2)
    relc = jnp.clip(rel, 0, band_rows - 2)
    rid = jax.lax.broadcasted_iota(jnp.int32, (band_rows, BLOCK), 0)
    row_w = (jnp.where(rid == relc[None, :], 1.0 - ym[None, :], 0.0)
             + jnp.where(rid == relc[None, :] + 1, ym[None, :], 0.0))
    cm3 = colmix.reshape(C, band_rows, BLOCK)
    I1 = jnp.sum(cm3 * row_w[None, :, :], axis=1)        # (C, BLOCK)

    jp = jp_ref[0]                                       # (C, 8, BLOCK)
    pix = jp[:, 6, :]                                    # (C, BLOCK)
    vmask = (val * band_ok.astype(jnp.float32))[None, :]
    r = (I1 - pix) * vmask                               # (C, BLOCK)
    sigma = sigma_ref[0]
    w = _weight(r / sigma, loss) * vmask                 # (C, BLOCK)

    rid8 = jax.lax.broadcasted_iota(jnp.int32, (8, BLOCK), 0)
    r0_ref[0, :, :] = jnp.where(
        rid8 == 0, jnp.broadcast_to(r[0:1, :], (8, BLOCK)),
        jnp.where(rid8 == 1,
                  jnp.broadcast_to(band_ok.astype(jnp.float32)[None, :],
                                   (8, BLOCK)), 0.0))
    Cp = w_ref.shape[1]
    if Cp == C:
        w_ref[0, :, :] = w
    else:
        ridc = jax.lax.broadcasted_iota(jnp.int32, (Cp, BLOCK), 0)
        w_ref[0, :, :] = jnp.where(
            ridc < C, jnp.pad(w, ((0, Cp - C), (0, 0))), 0.0)

    # rank update: per-channel lhs/rhs stacked along lanes -> ONE
    # (8, C*BLOCK) x (8, C*BLOCK) lane contraction = sum_c of the per-channel
    # rank updates (irls_kernel accumulator layout)
    lhs_list = []
    rhs_list = []
    for c in range(C):
        jpc = jp[c]                                      # (8, BLOCK)
        rc = jnp.broadcast_to(r[c][None, :], (8, BLOCK))
        wc = jnp.broadcast_to(w[c][None, :], (8, BLOCK))
        rhs_list.append(jnp.where(rid8 >= 6, rc, jpc))
        lhs_list.append(
            jnp.where(rid8 == 7, 0.0, jnp.where(rid8 == 6, rc, jpc)) * wc)
    lhs = jnp.concatenate(lhs_list, axis=1) if C > 1 else lhs_list[0]
    rhs = jnp.concatenate(rhs_list, axis=1) if C > 1 else rhs_list[0]
    block8 = jax.lax.dot_general(
        lhs, rhs, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (8, 8)
    acc_ref[:, :] += jnp.pad(block8, ((0, 0), (0, 120)))

    @pl.when(b == nb - 1)
    def _():
        out_ref[:, :] = acc_ref[:, :]


def make_fused_linearize_stacked(rows: int, cols: int, C: int, K: int,
                                 loss: LossFunctionType,
                                 interp: InterpolationType =
                                 InterpolationType.LINEAR,
                                 interpret: bool = False,
                                 mxu_bf16: bool = False):
    """Build the channel-stacked fused runner (see ``_stacked_kernel``).

    Same contract as ``make_fused_linearize``: returns ``run(u, v, valid,
    channels, jp, sigma) -> (H6, g, f_sq, r0 (K,), w (C, K), band_ok (K,))``
    but ``jp`` must be packed per-block-major: (NB, C, 8, BLOCK)
    (``pack_template_stacked``).
    """
    if interp not in (InterpolationType.LINEAR, InterpolationType.COSINE):
        raise ValueError("fused kernel supports Linear/Cosine interpolation")
    loss_name = {LossFunctionType.TUKEY: "Tukey",
                 LossFunctionType.HUBER: "Huber",
                 LossFunctionType.L2: "L2"}[loss]
    Hp = _round_up(rows, 8)
    Wp = _round_up(cols, 128)
    Kp = _round_up(K, BLOCK)
    NB = Kp // BLOCK
    Cp = _round_up(C, 8)
    band = min(Hp, _round_up(Hp // NB + BAND_MARGIN, 8))

    kern = partial(_stacked_kernel, H=rows, W=cols, band=band, loss=loss_name,
                   cosine=(interp == InterpolationType.COSINE), C=C,
                   mxu_bf16=mxu_bf16)
    if band >= Hp:
        band_scratch = pltpu.VMEM((1, C, Hp, Wp), jnp.float32)
        n_sem = 1
    else:
        band_scratch = pltpu.VMEM((2, C, band, Wp), jnp.float32)
        n_sem = 2

    call = pl.pallas_call(
        kern,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                # sigma (1,)
            pl.BlockSpec(memory_space=pltpu.SMEM),                # bases (NB,)
            pl.BlockSpec((1, 8, BLOCK), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),                # u
            pl.BlockSpec((1, 8, BLOCK), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),                # v
            pl.BlockSpec((1, 8, BLOCK), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),                # valid
            pl.BlockSpec(memory_space=pl.ANY),                    # channels
            pl.BlockSpec((1, C, 8, BLOCK), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),                # jp
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),                # out (8,128)
            pl.BlockSpec((1, 8, BLOCK), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),                # r0+band_ok
            pl.BlockSpec((1, Cp, BLOCK), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),                # w
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((NB, 8, BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((NB, Cp, BLOCK), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                        band_scratch,
                        pltpu.SemaphoreType.DMA((n_sem,))],
        interpret=interpret,
    )

    def run(u, v, valid, channels, jp, sigma):
        pad = Kp - K
        uu = jnp.pad(u.astype(jnp.float32), (0, pad))
        vv = jnp.pad(v.astype(jnp.float32), (0, pad))
        vm = jnp.pad(valid.astype(jnp.float32), (0, pad))
        u3 = jnp.broadcast_to(uu.reshape(NB, 1, BLOCK), (NB, 8, BLOCK))
        v3 = jnp.broadcast_to(vv.reshape(NB, 1, BLOCK), (NB, 8, BLOCK))
        m3 = jnp.broadcast_to(vm.reshape(NB, 1, BLOCK), (NB, 8, BLOCK))
        if channels.shape[1:] == (Hp, Wp):
            ch = channels.astype(jnp.float32)
        else:
            ch = jnp.pad(channels.astype(jnp.float32),
                         ((0, 0), (0, Hp - rows), (0, Wp - cols)))
        yi2 = jnp.clip(jnp.floor(vv).astype(jnp.int32),
                       0, rows - 2).reshape(NB, BLOCK)
        vm2 = vm.reshape(NB, BLOCK) > 0
        mn = jnp.min(jnp.where(vm2, yi2, rows - 2), axis=1)
        mx = jnp.max(jnp.where(vm2, yi2, 0), axis=1)
        bases = jnp.clip((mn + mx + 1) // 2 - band // 2, 0, Hp - band) // 8
        out, r0b, w = call(jnp.reshape(sigma.astype(jnp.float32), (1,)),
                           bases.astype(jnp.int32),
                           u3, v3, m3, ch, jp)
        H6 = out[:6, :6]
        g = out[:6, 6]
        f_sq = out[6, 6]
        r0 = r0b[:, 0, :].reshape(Kp)[:K]
        band_ok = r0b[:, 1, :].reshape(Kp)[:K] > 0.5
        w_ck = jnp.moveaxis(w[:, :C, :], 1, 0).reshape(C, Kp)[:, :K]
        return H6, g, f_sq, r0, w_ck, band_ok

    return run


def pack_template_stacked(pixels, jacobians, K: int = None):
    """``pack_template`` in the stacked kernel's block-major layout
    (NB, C, 8, BLOCK) — block index leads so the per-block BlockSpec slices one
    contiguous (C, 8, BLOCK) slab per grid step."""
    return jnp.moveaxis(pack_template(pixels, jacobians, K), 0, 1)


def pad_channels(channels, rows: int, cols: int):
    """Pad a (C, rows, cols) channel stack to the kernel's (C, Hp, Wp) tile
    shape ONCE (outside the GN loop); ``run`` detects the padded shape and
    skips its per-call pad."""
    Hp = _round_up(rows, 8)
    Wp = _round_up(cols, 128)
    return jnp.pad(channels.astype(jnp.float32),
                   ((0, 0), (0, Hp - rows), (0, Wp - cols)))


_RUNNER_CACHE = {}


def fused_linearize(tdata, channels, cam, T, sigma,
                    loss: LossFunctionType = LossFunctionType.TUKEY,
                    interp: InterpolationType = InterpolationType.LINEAR,
                    interpret: bool = False, jp=None, stacked=None):
    """Convenience one-call fused linearization on a TemplateData.

    Projection (tiny VPU math) stays in XLA; sampling + residual + weights +
    H/g/f run in the Pallas kernel.  ``jp`` may be passed pre-packed (once per
    keyframe) to skip the per-call packing — in ``pack_template`` layout for
    the (C, NB)-grid kernel, ``pack_template_stacked`` layout for the stacked
    one.  ``stacked`` defaults to C > 1 (the measured winner per variant).

    Returns (H (6,6), g (6,), f_sq, r0 (K,), w (C,K), valid (K,)) with
    ``valid`` the kernel-true mask (XLA validity AND in-band).
    """
    from bpvo_tpu.ops import interp as interp_mod
    from bpvo_tpu.vo import warp as warp_mod

    C, rows_, cols_ = channels.shape
    K = tdata.pixels.shape[1]
    if stacked is None:
        stacked = C > 1
    key = (rows_, cols_, C, K, loss, interp, interpret, stacked)
    if key not in _RUNNER_CACHE:
        maker = make_fused_linearize_stacked if stacked else \
            make_fused_linearize
        _RUNNER_CACHE[key] = maker(rows_, cols_, C, K, loss, interp, interpret)
    run = _RUNNER_CACHE[key]

    u, v, Z = warp_mod.project(cam, T, tdata.points)
    ok = tdata.valid & (Z > 1e-6) & interp_mod.valid_mask(
        u, v, rows_, cols_, interp)
    if jp is None:
        packer = pack_template_stacked if stacked else pack_template
        jp = packer(tdata.pixels, tdata.jacobians, K)
    H6, g, f_sq, r0, w, band_ok = run(u, v, ok, channels, jp, sigma)
    return H6, g, f_sq, r0, w, ok & band_ok


def pack_template(pixels, jacobians, K: int = None):
    """Pack per-keyframe template arrays for the fused kernel.

    pixels (C, K), jacobians (C, K, 6) -> (C, NB, 8, BLOCK) with rows 0..5 the
    Jacobian components, row 6 the pixel value, row 7 zero.  Done once per
    keyframe (the reference's setData-time layout work,
    template_data.cc:102-141).
    """
    C, Kt = pixels.shape
    K = Kt if K is None else K
    Kp = _round_up(K, BLOCK)
    NB = Kp // BLOCK
    pad = Kp - Kt
    px = jnp.pad(pixels, ((0, 0), (0, pad)))
    J = jnp.pad(jacobians, ((0, 0), (0, pad), (0, 0)))
    rows = jnp.concatenate([
        jnp.moveaxis(J, 2, 1),                     # (C, 6, Kp)
        px[:, None, :],                            # (C, 1, Kp)
        jnp.zeros((C, 1, Kp), px.dtype),
    ], axis=1)                                     # (C, 8, Kp)
    return jnp.moveaxis(rows.reshape(C, 8, NB, BLOCK), 1, 2)  # (C, NB, 8, B)
