"""Fully-fused diffraction kernels: DFT-as-matmul on the MXU.

The deepest TPU-native redesign of the reference operator core. The
hybrid path (pallas_kernels + XLA FFT) still materialises the nearplane
between the gather kernel and the FFT -- a full farplane-sized HBM write
+ read per pass. For detector-sized frames (64^2..256^2) the 2-D unitary
DFT is just two small matrix multiplications,

    farplane = F @ (prb * patch) @ F^T,   F[u, y] = e^(-2 pi i u y / ndet)
                                                    / sqrt(ndet),

with **rectangular** (ndet x nprb) DFT factors, so the zero-padding of
the patch into the detector frame is implicit (fewer FLOPs than an FFT
of the padded frame). On TPU the matmuls ride the MXU -- FLOPs are cheap,
HBM bandwidth is not -- so fusing gather + probe-multiply + DFT into ONE
Pallas kernel (and IDFT + conj-probe + overlap-scatter into another)
eliminates the intermediate nearplane entirely: the forward pass touches
HBM once to write the farplane, the adjoint once to read it.

Complexity: DFT-matmul is O(ndet^2 * nprb) per frame vs O(ndet^2 log
ndet) for the FFT -- ~9x more FLOPs at 128^2 -- but the MXU's f32
throughput is ~2 orders of magnitude above what the VPU-bound FFT
butterflies achieve, and the pass is memory-bound anyway.

Same addressing scheme as pallas_kernels (aligned pow2 windows + dynamic
rotates, scalar-prefetched scan offsets, sequential-grid deterministic
scatter). Adjoints are exact: the adjoint kernels apply F^H . conj(F)
with the same factor matrices, so fwd/adj remain Hermitian-adjoint pairs
to f32 rounding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tikejax.ops.pallas_kernels import (_accum_patch, _interpret,
                                        _load_patch, _pad_axis1,
                                        _pad_object, _split_c64,
                                        _window_hw, _with_vma)


def _positions_per_step(nmodes: int) -> int:
    # P * nmodes frame-sized f32 pairs live in VMEM per step plus matmul
    # temporaries; P=16 measured fastest at 128^2 frames on v5e (40.4 vs
    # 38.9 iters/s at P=8 on the headline CG config). Env knob for
    # re-tuning sweeps on hardware.
    import os
    frames = int(os.environ.get("TIKEJAX_FRAMES_PER_STEP", "16"))
    return max(1, frames // nmodes)


@functools.lru_cache(maxsize=None)
def _dft_factors_np(ndet: int, nprb: int):
    u = np.arange(ndet)[:, None]
    y = np.arange(nprb)[None, :]
    ang = -2.0 * np.pi * u * y / ndet
    scale = 1.0 / np.sqrt(ndet)
    return (np.cos(ang).astype(np.float32) * scale,
            np.sin(ang).astype(np.float32) * scale)


def _dft_factors(ndet: int, nprb: int):
    fr, fi = _dft_factors_np(ndet, nprb)
    return jnp.asarray(fr), jnp.asarray(fi)


# MXU precision of the DFT factor matmuls, selected per call via the
# kernel name (see ops.diffraction._fused_precision). Measured on v5e
# (operator relative error vs the XLA oracle; CG rate on the 512^2/16k
# headline, benchmarks/kernel_ab.py):
#   DEFAULT   (1 bf16 pass, schoolbook)  ~2.5e-3 error, fastest (~78)
#   'kara_x3' (Karatsuba of bf16x3)      ~8e-6 error   ('fused_mp')
#   'kara_hp' (Karatsuba of full f32)    ~4e-7 error   ('fused_hp')
# Precision.HIGH is not supported by Mosaic; 'bf16x3' is the manual
# equivalent: split each operand into bf16 hi + lo and take the three
# dominant cross products. Karatsuba does NOT pay on the single-pass
# tier (no speed gain, 2.5e-3 -> 4.1e-3 error) so DEFAULT stays
# schoolbook.
PRECISION = lax.Precision.DEFAULT


def _dot(a, b, contract, prec):
    dims = (contract, ((), ()))
    if prec == "bf16x3":
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        b_hi = b.astype(jnp.bfloat16)
        b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)

        def d(x, y):
            return lax.dot_general(x, y, dims,
                                   preferred_element_type=jnp.float32)

        return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)
    if prec == "bf16":
        # Explicit one-shot bf16 operand conversion (otherwise identical
        # to DEFAULT's single bf16 MXU pass): lets the caller share the
        # converted operand across the schoolbook dots instead of relying
        # on Mosaic to CSE the implicit converts.
        return lax.dot_general(a.astype(jnp.bfloat16),
                               b.astype(jnp.bfloat16), dims,
                               preferred_element_type=jnp.float32)
    return lax.dot_general(a, b, dims, preferred_element_type=jnp.float32,
                           precision=prec)


# Complex-matmul algorithm per precision tag: 'kara*' tags select the
# Karatsuba/Gauss 3-multiplication form (25% fewer MXU passes than the
# 4-mul schoolbook form at the cost of three VPU add passes), with the
# base precision of each real matmul given by the mapped value.
_KARA_BASE = {
    "kara": "bf16",                     # 1 bf16 pass per real mm
    "kara_x3": "bf16x3",                # 3 passes (mp tier)
    "kara_hp": lax.Precision.HIGHEST,   # full f32 (hp tier)
}


def _cmm(ar, ai, br, bi, contract, prec):
    """Complex matrix multiply (ar + i*ai) @ (br + i*bi) with the given
    dot_general contraction dims; returns (re, im) in f32."""
    base = _KARA_BASE.get(prec)
    if base is not None:
        t1 = _dot(ar, br, contract, base)
        t2 = _dot(ai, bi, contract, base)
        t3 = _dot(ar + ai, br + bi, contract, base)
        return t1 - t2, t3 - t1 - t2
    re = _dot(ar, br, contract, prec) - _dot(ai, bi, contract, prec)
    im = _dot(ar, bi, contract, prec) + _dot(ai, br, contract, prec)
    return re, im


def _dft2(nr, ni, fr, fi, prec):
    """(F @ near @ F^T) for near (nprb, nprb), F (ndet, nprb) split re/im.
    Returns farplane (ndet, ndet) re/im."""
    # t = F @ near : (ndet, nprb)
    tr, ti = _cmm(fr, fi, nr, ni, ((1,), (0,)), prec)
    # far = t @ F^T : contract t dim1 with F dim1
    return _cmm(tr, ti, fr, fi, ((1,), (1,)), prec)


def _idft2(gr, gi, fr, fi, prec):
    """Adjoint of :func:`_dft2`: (F^H @ far @ conj(F)) for far (ndet,
    ndet). Returns nearplane (nprb, nprb) re/im."""
    # t = F^H @ far : (nprb, ndet); F^H = conj(F)^T
    tr, ti = _cmm(fr, -fi, gr, gi, ((0,), (0,)), prec)
    # near = t @ conj(F) : contract t dim1 (ndet) with F dim0
    return _cmm(tr, ti, fr, -fi, ((1,), (0,)), prec)


# Phase-separated frame processing: the mega-kernels below run their
# per-step position block in PHASES (gather all patches -> all DFTs ->
# all pointwise likelihood work -> all IDFTs -> all scatters) instead of
# interleaving the full chain per position. Same math, but Mosaic
# schedules the independent per-frame matmuls of a phase back-to-back:
# measured 78.7 +- 3.8 iters/s (4 runs) on the 512^2/16k headline vs
# 63-68 for the interleaved form.
#
# REJECTED follow-up (measured, for the record): stacking G frames into
# wide per-group matmuls -- one (ndet, G*nprb) stage-1 and one (G*ndet,
# nprb) stage-2 product with a tile-aligned block relayout between --
# was monotonically SLOWER (G=4: 59.7, G=8: 56.0, G=16: 52.6 iters/s):
# the VMEM concat/relayout traffic exceeds any MXU pipeline gain, and
# the bigger live set degrades double-buffering.


def _dft2_many(nrs, nis, fr, fi, prec):
    """DFT2 over a list of nearplanes; returns lists of farplane re/im."""
    out = [_dft2(nr, ni, fr, fi, prec) for nr, ni in zip(nrs, nis)]
    return [o[0] for o in out], [o[1] for o in out]


def _idft2_many(grs, gis, fr, fi, prec):
    """Adjoint of :func:`_dft2_many`."""
    out = [_idft2(gr, gi, fr, fi, prec) for gr, gi in zip(grs, gis)]
    return [o[0] for o in out], [o[1] for o in out]


# ---------------------------------------------------------------------------
# fwd: gather + probe-multiply + DFT, one kernel.
# ---------------------------------------------------------------------------


def _fwd_kernel(P, nmodes, nprb, prec, has_base, sy, sx, fr, fi, pre, pim,
                bre, bim, *rest):
    if has_base:
        zre, zim, ore, oim = rest
    else:
        ore, oim = rest
    i = pl.program_id(0)
    j = pl.program_id(1)
    nrs, nis = [], []
    for p in range(P):
        y = sy[i, j * P + p]
        x = sx[i, j * P + p]
        ar = _load_patch(pre, y, x, nprb)
        ai = _load_patch(pim, y, x, nprb)
        for m in range(nmodes):
            br = bre[0, m]
            bi = bim[0, m]
            nrs.append(ar * br - ai * bi)
            nis.append(ar * bi + ai * br)
    frs, fis = _dft2_many(nrs, nis, fr[...], fi[...], prec)
    for p in range(P):
        for m in range(nmodes):
            k = p * nmodes + m
            rr, ri = frs[k], fis[k]
            if has_base:
                # Split-operator epilogue: add the frozen base farplane
                # in VMEM, saving the separate XLA add pass (farplane-
                # sized read+read+write of HBM per CG iteration).
                rr = rr + zre[0, p, m]
                ri = ri + zim[0, p, m]
            ore[0, p, m] = rr
            oim[0, p, m] = ri


def fwd(psi: jax.Array, scan_int: jax.Array, prb: jax.Array,
        ndet: int, precision=None, base: jax.Array | None = None
        ) -> jax.Array:
    """Fused forward: farplane[t,s,m] = DFT2(pad(psi[patch(s)] * prb[m])).

    With ``base`` (same shape as the output), returns DFT2(...) + base,
    fused into the same pass (split-operator refinement epilogue).

    Returns ``(ntheta, nscan, nmodes, ndet, ndet)`` complex64.
    """
    t, nz, n = psi.shape
    _, nmodes, nprb, _ = prb.shape
    s = scan_int.shape[1]
    P = _positions_per_step(nmodes)
    s_pad = -(-s // P) * P
    sy = _pad_axis1(scan_int[..., 0].astype(jnp.int32), s_pad)
    sx = _pad_axis1(scan_int[..., 1].astype(jnp.int32), s_pad)
    pre, pim = (_pad_object(a, nprb) for a in _split_c64(psi))
    bre, bim = _split_c64(prb)
    fr, fi = _dft_factors(ndet, nprb)
    wh, ww = _window_hw(nprb)
    hz, wn = nz + wh - nprb, n + ww - nprb

    frame_spec = pl.BlockSpec((1, P, nmodes, ndet, ndet),
                              lambda i, j, *_: (i, j, 0, 0, 0))
    in_specs = [
        pl.BlockSpec((ndet, nprb), lambda i, j, *_: (0, 0)),
        pl.BlockSpec((ndet, nprb), lambda i, j, *_: (0, 0)),
        pl.BlockSpec((1, hz, wn), lambda i, j, *_: (i, 0, 0)),
        pl.BlockSpec((1, hz, wn), lambda i, j, *_: (i, 0, 0)),
        pl.BlockSpec((1, nmodes, nprb, nprb),
                     lambda i, j, *_: (i, 0, 0, 0)),
        pl.BlockSpec((1, nmodes, nprb, nprb),
                     lambda i, j, *_: (i, 0, 0, 0)),
    ]
    args = [sy, sx, fr, fi, pre, pim, bre, bim]
    if base is not None:
        zre, zim = (_pad_axis1(a, s_pad) for a in _split_c64(base))
        in_specs += [frame_spec, frame_spec]
        args += [zre, zim]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t, s_pad // P),
        in_specs=in_specs,
        out_specs=[frame_spec, frame_spec],
    )
    out_shape = [
        jax.ShapeDtypeStruct((t, s_pad, nmodes, ndet, ndet), jnp.float32),
        jax.ShapeDtypeStruct((t, s_pad, nmodes, ndet, ndet), jnp.float32),
    ]
    ore, oim = pl.pallas_call(
        functools.partial(_fwd_kernel, P, nmodes, nprb,
                          precision or PRECISION, base is not None),
        grid_spec=grid_spec,
        out_shape=_with_vma(out_shape, args),
        interpret=_interpret(),
    )(*args)
    return lax.complex(ore, oim)[:, :s]


# ---------------------------------------------------------------------------
# adj (object): IDFT + conj-probe + overlap scatter, one kernel.
# ---------------------------------------------------------------------------


def _adj_kernel(P, nmodes, nprb, prec, sy, sx, fr, fi, gre, gim, bre, bim,
                ore, oim):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        ore[...] = jnp.zeros_like(ore)
        oim[...] = jnp.zeros_like(oim)

    ars, ais = _idft2_many(
        [gre[0, p, m] for p in range(P) for m in range(nmodes)],
        [gim[0, p, m] for p in range(P) for m in range(nmodes)],
        fr[...], fi[...], prec)
    for p in range(P):
        y = sy[i, j * P + p]
        x = sx[i, j * P + p]
        acc_re = jnp.zeros((nprb, nprb), jnp.float32)
        acc_im = jnp.zeros((nprb, nprb), jnp.float32)
        for m in range(nmodes):
            k = p * nmodes + m
            br = bre[0, m]
            bi = bim[0, m]
            # conj(prb) * near
            acc_re = acc_re + (br * ars[k] + bi * ais[k])
            acc_im = acc_im + (br * ais[k] - bi * ars[k])
        _accum_patch(ore, acc_re, y, x, nprb)
        _accum_patch(oim, acc_im, y, x, nprb)


def adj(farplane: jax.Array, scan_int: jax.Array, prb: jax.Array, nz: int,
        n: int, precision=None) -> jax.Array:
    """Fused adjoint-to-object: IDFT, crop, conj(prb)-multiply, mode-sum,
    deterministic overlap scatter-add -- one pass over the farplane.

    Returns ``(ntheta, nz, n)`` complex64.
    """
    t, s, nmodes, ndet, _ = farplane.shape
    nprb = prb.shape[-1]
    P = _positions_per_step(nmodes)
    s_pad = -(-s // P) * P
    sy = _pad_axis1(scan_int[..., 0].astype(jnp.int32), s_pad)
    sx = _pad_axis1(scan_int[..., 1].astype(jnp.int32), s_pad)
    gre, gim = _split_c64(farplane)
    gre = _pad_axis1(gre, s_pad)
    gim = _pad_axis1(gim, s_pad)
    bre, bim = _split_c64(prb)
    fr, fi = _dft_factors(ndet, nprb)
    wh, ww = _window_hw(nprb)
    hz, wn = nz + wh - nprb, n + ww - nprb

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t, s_pad // P),
        in_specs=[
            pl.BlockSpec((ndet, nprb), lambda i, j, *_: (0, 0)),
            pl.BlockSpec((ndet, nprb), lambda i, j, *_: (0, 0)),
            pl.BlockSpec((1, P, nmodes, ndet, ndet),
                         lambda i, j, *_: (i, j, 0, 0, 0)),
            pl.BlockSpec((1, P, nmodes, ndet, ndet),
                         lambda i, j, *_: (i, j, 0, 0, 0)),
            pl.BlockSpec((1, nmodes, nprb, nprb),
                         lambda i, j, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, nmodes, nprb, nprb),
                         lambda i, j, *_: (i, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, hz, wn), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((1, hz, wn), lambda i, j, *_: (i, 0, 0)),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((t, hz, wn), jnp.float32),
        jax.ShapeDtypeStruct((t, hz, wn), jnp.float32),
    ]
    args = (sy, sx, fr, fi, gre, gim, bre, bim)
    ore, oim = pl.pallas_call(
        functools.partial(_adj_kernel, P, nmodes, nprb,
                          precision or PRECISION),
        grid_spec=grid_spec,
        out_shape=_with_vma(out_shape, args),
        interpret=_interpret(),
    )(*args)
    return lax.complex(ore, oim)[:, :nz, :n]


# ---------------------------------------------------------------------------
# adj (probe): IDFT + conj-patch + reduce over positions, one kernel.
# ---------------------------------------------------------------------------


def _adj_probe_kernel(P, nmodes, nprb, prec, sy, sx, fr, fi, gre, gim, pre,
                      pim, ore, oim):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        ore[...] = jnp.zeros_like(ore)
        oim[...] = jnp.zeros_like(oim)

    ars, ais = _idft2_many(
        [gre[0, p, m] for p in range(P) for m in range(nmodes)],
        [gim[0, p, m] for p in range(P) for m in range(nmodes)],
        fr[...], fi[...], prec)
    for p in range(P):
        y = sy[i, j * P + p]
        x = sx[i, j * P + p]
        pr = _load_patch(pre, y, x, nprb)
        pi = _load_patch(pim, y, x, nprb)
        for m in range(nmodes):
            k = p * nmodes + m
            # conj(psi_patch) * near
            ore[0, m] += pr * ars[k] + pi * ais[k]
            oim[0, m] += pr * ais[k] - pi * ars[k]


def adj_probe(farplane: jax.Array, scan_int: jax.Array, psi: jax.Array,
              nprb: int, precision=None) -> jax.Array:
    """Fused probe adjoint: IDFT + conj(patch)-multiply + reduce over all
    scan positions, one pass over the farplane.

    Returns ``(ntheta, nmodes, nprb, nprb)`` complex64.
    """
    t, s, nmodes, ndet, _ = farplane.shape
    _, nz, n = psi.shape
    P = _positions_per_step(nmodes)
    s_pad = -(-s // P) * P
    sy = _pad_axis1(scan_int[..., 0].astype(jnp.int32), s_pad)
    sx = _pad_axis1(scan_int[..., 1].astype(jnp.int32), s_pad)
    gre, gim = _split_c64(farplane)
    gre = _pad_axis1(gre, s_pad)
    gim = _pad_axis1(gim, s_pad)
    pre, pim = (_pad_object(a, nprb) for a in _split_c64(psi))
    fr, fi = _dft_factors(ndet, nprb)
    wh, ww = _window_hw(nprb)
    hz, wn = nz + wh - nprb, n + ww - nprb

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t, s_pad // P),
        in_specs=[
            pl.BlockSpec((ndet, nprb), lambda i, j, *_: (0, 0)),
            pl.BlockSpec((ndet, nprb), lambda i, j, *_: (0, 0)),
            pl.BlockSpec((1, P, nmodes, ndet, ndet),
                         lambda i, j, *_: (i, j, 0, 0, 0)),
            pl.BlockSpec((1, P, nmodes, ndet, ndet),
                         lambda i, j, *_: (i, j, 0, 0, 0)),
            pl.BlockSpec((1, hz, wn), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((1, hz, wn), lambda i, j, *_: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, nmodes, nprb, nprb),
                         lambda i, j, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, nmodes, nprb, nprb),
                         lambda i, j, *_: (i, 0, 0, 0)),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((t, nmodes, nprb, nprb), jnp.float32),
        jax.ShapeDtypeStruct((t, nmodes, nprb, nprb), jnp.float32),
    ]
    args = (sy, sx, fr, fi, gre, gim, pre, pim)
    ore, oim = pl.pallas_call(
        functools.partial(_adj_probe_kernel, P, nmodes, nprb,
                          precision or PRECISION),
        grid_spec=grid_spec,
        out_shape=_with_vma(out_shape, args),
        interpret=_interpret(),
    )(*args)
    return lax.complex(ore, oim)


# ---------------------------------------------------------------------------
# Gradient pass: residual + objective + adjoint in ONE kernel.
# ---------------------------------------------------------------------------


def _adj_residual_kernel(P, nmodes, nprb, model, prec, s_actual, sy, sx,
                         fr, fi, gre, gim, dat, bre, bim, ore, oim, fsum):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        ore[...] = jnp.zeros_like(ore)
        oim[...] = jnp.zeros_like(oim)
        fsum[0, 0] = jnp.float32(0.0)

    minf_acc = jnp.zeros((), jnp.float32)
    rrs, ris = [], []
    for p in range(P):
        idx = j * P + p
        # Mask padded tail positions (idx >= s_actual): for gaussian the
        # eps guard makes a zero frame contribute ndet^2 * 1e-12 to minf,
        # so zero-padding alone is not enough (same masking as
        # _grad_kernel).
        valid = jnp.where(idx < s_actual, jnp.float32(1.0),
                          jnp.float32(0.0))
        # Incoherent intensity over modes, residual factor, objective.
        intensity = jnp.zeros_like(dat[0, p])
        for m in range(nmodes):
            intensity = intensity + gre[0, p, m] ** 2 + gim[0, p, m] ** 2
        d = jnp.maximum(dat[0, p], 0.0)
        if model == "gaussian":
            amp = jnp.sqrt(intensity + 1e-12)
            sq = jnp.sqrt(d)
            factor = (1.0 - sq / amp) * valid
            minf_acc = minf_acc + valid * jnp.sum((amp - sq) ** 2)
        else:  # poisson
            factor = (1.0 - d / (intensity + 1e-8)) * valid
            minf_acc = minf_acc + valid * jnp.sum(
                intensity - d * jnp.log(intensity + 1e-8))
        for m in range(nmodes):
            rrs.append(gre[0, p, m] * factor)
            ris.append(gim[0, p, m] * factor)
    ars, ais = _idft2_many(rrs, ris, fr[...], fi[...], prec)
    for p in range(P):
        y = sy[i, j * P + p]
        x = sx[i, j * P + p]
        acc_re = jnp.zeros((nprb, nprb), jnp.float32)
        acc_im = jnp.zeros((nprb, nprb), jnp.float32)
        for m in range(nmodes):
            k = p * nmodes + m
            br = bre[0, m]
            bi = bim[0, m]
            acc_re = acc_re + (br * ars[k] + bi * ais[k])
            acc_im = acc_im + (br * ais[k] - bi * ars[k])
        _accum_patch(ore, acc_re, y, x, nprb)
        _accum_patch(oim, acc_im, y, x, nprb)
    fsum[0, 0] += minf_acc


def adj_residual(farplane: jax.Array, data: jax.Array, scan_int: jax.Array,
                 prb: jax.Array, nz: int, n: int, model: str,
                 precision=None):
    """Whole gradient tail in one pass over the farplane: compute the
    likelihood residual (gaussian or poisson), the scalar objective, the
    IDFT, the conj-probe multiply, and the deterministic overlap scatter.

    Returns:
      (psi_acc ``(ntheta, nz, n)`` complex64, minf ``()`` float32).
    """
    t, s, nmodes, ndet, _ = farplane.shape
    nprb = prb.shape[-1]
    P = _positions_per_step(nmodes)
    s_pad = -(-s // P) * P
    sy = _pad_axis1(scan_int[..., 0].astype(jnp.int32), s_pad)
    sx = _pad_axis1(scan_int[..., 1].astype(jnp.int32), s_pad)
    gre, gim = _split_c64(farplane)
    gre = _pad_axis1(gre, s_pad)
    gim = _pad_axis1(gim, s_pad)
    # Padded tail frames are masked out inside the kernel (idx >= s).
    dat = _pad_axis1(data.astype(jnp.float32), s_pad)
    bre, bim = _split_c64(prb)
    fr, fi = _dft_factors(ndet, nprb)
    wh, ww = _window_hw(nprb)
    hz, wn = nz + wh - nprb, n + ww - nprb

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t, s_pad // P),
        in_specs=[
            pl.BlockSpec((ndet, nprb), lambda i, j, *_: (0, 0)),
            pl.BlockSpec((ndet, nprb), lambda i, j, *_: (0, 0)),
            pl.BlockSpec((1, P, nmodes, ndet, ndet),
                         lambda i, j, *_: (i, j, 0, 0, 0)),
            pl.BlockSpec((1, P, nmodes, ndet, ndet),
                         lambda i, j, *_: (i, j, 0, 0, 0)),
            pl.BlockSpec((1, P, ndet, ndet),
                         lambda i, j, *_: (i, j, 0, 0)),
            pl.BlockSpec((1, nmodes, nprb, nprb),
                         lambda i, j, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, nmodes, nprb, nprb),
                         lambda i, j, *_: (i, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, hz, wn), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((1, hz, wn), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.SMEM),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((t, hz, wn), jnp.float32),
        jax.ShapeDtypeStruct((t, hz, wn), jnp.float32),
        jax.ShapeDtypeStruct((t, 1), jnp.float32),
    ]
    args = (sy, sx, fr, fi, gre, gim, dat, bre, bim)
    ore, oim, fsum = pl.pallas_call(
        functools.partial(_adj_residual_kernel, P, nmodes, nprb, model,
                          precision or PRECISION, s),
        grid_spec=grid_spec,
        out_shape=_with_vma(out_shape, args),
        interpret=_interpret(),
    )(*args)
    return lax.complex(ore, oim)[:, :nz, :n], jnp.sum(fsum)


# ---------------------------------------------------------------------------
# Line-search statistics pass: forward of the direction fused with the
# quadratic statistics -- the direction farplane never touches HBM.
# ---------------------------------------------------------------------------


def _fwd_quad_kernel(P, nmodes, nprb, prec, sy, sx, fr, fi, dre, dim_, bre,
                     bim, pre_psi, pim_psi, oa, ob, oc):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nrs, nis = [], []
    for p in range(P):
        y = sy[i, j * P + p]
        x = sx[i, j * P + p]
        ar = _load_patch(dre, y, x, nprb)
        ai = _load_patch(dim_, y, x, nprb)
        for m in range(nmodes):
            br = bre[0, m]
            bi = bim[0, m]
            nrs.append(ar * br - ai * bi)
            nis.append(ar * bi + ai * br)
    fds, fdis = _dft2_many(nrs, nis, fr[...], fi[...], prec)
    for p in range(P):
        a = jnp.zeros((oa.shape[-2], oa.shape[-1]), jnp.float32)
        b = jnp.zeros_like(a)
        c = jnp.zeros_like(a)
        for m in range(nmodes):
            k = p * nmodes + m
            fdr, fdi = fds[k], fdis[k]
            fpr = pre_psi[0, p, m]
            fpi = pim_psi[0, p, m]
            a = a + fpr * fpr + fpi * fpi
            b = b + fpr * fdr + fpi * fdi
            c = c + fdr * fdr + fdi * fdi
        oa[0, p] = a
        ob[0, p] = b
        oc[0, p] = c


def fwd_quad_stats(dpsi: jax.Array, scan_int: jax.Array, prb: jax.Array,
                   fpsi: jax.Array, precision=None):
    """Line-search sufficient statistics in one pass: computes the
    direction farplane G(dpsi) frame-by-frame in VMEM (gather + probe
    multiply + MXU DFT) and immediately reduces it against the current
    farplane into the per-pixel quadratic coefficients

        a = sum_m |G psi|^2, b = sum_m Re(conj(G psi) G d),
        c = sum_m |G d|^2,

    so the direction farplane never exists in HBM.

    Returns:
      (a, b, c) each ``(ntheta, nscan, ndet, ndet)`` float32.
    """
    t, s, nmodes, ndet, _ = fpsi.shape
    nprb = prb.shape[-1]
    P = _positions_per_step(nmodes)
    s_pad = -(-s // P) * P
    sy = _pad_axis1(scan_int[..., 0].astype(jnp.int32), s_pad)
    sx = _pad_axis1(scan_int[..., 1].astype(jnp.int32), s_pad)
    dre, dim_ = (_pad_object(x, nprb) for x in _split_c64(dpsi))
    bre, bim = _split_c64(prb)
    fre, fim = (_pad_axis1(x, s_pad) for x in _split_c64(fpsi))
    fr, fi = _dft_factors(ndet, nprb)
    wh, ww = _window_hw(nprb)
    hz, wn = dpsi.shape[1] + wh - nprb, dpsi.shape[2] + ww - nprb

    stat_spec = pl.BlockSpec((1, P, ndet, ndet),
                             lambda i, j, *_: (i, j, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t, s_pad // P),
        in_specs=[
            pl.BlockSpec((ndet, nprb), lambda i, j, *_: (0, 0)),
            pl.BlockSpec((ndet, nprb), lambda i, j, *_: (0, 0)),
            pl.BlockSpec((1, hz, wn), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((1, hz, wn), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((1, nmodes, nprb, nprb),
                         lambda i, j, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, nmodes, nprb, nprb),
                         lambda i, j, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, P, nmodes, ndet, ndet),
                         lambda i, j, *_: (i, j, 0, 0, 0)),
            pl.BlockSpec((1, P, nmodes, ndet, ndet),
                         lambda i, j, *_: (i, j, 0, 0, 0)),
        ],
        out_specs=[stat_spec, stat_spec, stat_spec],
    )
    out_shape = [
        jax.ShapeDtypeStruct((t, s_pad, ndet, ndet), jnp.float32)
        for _ in range(3)
    ]
    args = (sy, sx, fr, fi, dre, dim_, bre, bim, fre, fim)
    oa, ob, oc = pl.pallas_call(
        functools.partial(_fwd_quad_kernel, P, nmodes, nprb,
                          precision or PRECISION),
        grid_spec=grid_spec,
        out_shape=_with_vma(out_shape, args),
        interpret=_interpret(),
    )(*args)
    return oa[:, :s], ob[:, :s], oc[:, :s]


# ---------------------------------------------------------------------------
# Gradient mega-kernel: fwd + residual + objective + adjoint in ONE pass.
# The farplane never exists in HBM -- each position's frames are produced
# by the MXU DFT in VMEM, turned into the likelihood residual against the
# measured frame, IDFT'd and scattered, all in-kernel. HBM traffic of a
# full gradient evaluation: read data once, write the object gradient.
# ---------------------------------------------------------------------------


def _grad_kernel(P, nmodes, nprb, model, prec, s_actual, has_base, sy, sx,
                 fr, fi, pre, pim, dat, bre, bim, *rest):
    if has_base:
        zre, zim, ore, oim, fsum = rest
    else:
        ore, oim, fsum = rest
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        ore[...] = jnp.zeros_like(ore)
        oim[...] = jnp.zeros_like(oim)
        fsum[0, 0] = jnp.float32(0.0)

    # Phase A: gather + probe multiply -> all P*nmodes nearplanes.
    ys, xs, nrs, nis = [], [], [], []
    for p in range(P):
        y = sy[i, j * P + p]
        x = sx[i, j * P + p]
        ys.append(y)
        xs.append(x)
        ar = _load_patch(pre, y, x, nprb)
        ai = _load_patch(pim, y, x, nprb)
        for m in range(nmodes):
            br = bre[0, m]
            bi = bim[0, m]
            nrs.append(ar * br - ai * bi)
            nis.append(ar * bi + ai * br)
    frs, fis = _dft2_many(nrs, nis, fr[...], fi[...], prec)

    # Phase B: likelihood residual factor + objective per position.
    minf_acc = jnp.zeros((), jnp.float32)
    for p in range(P):
        idx = j * P + p
        # Padded tail positions gather REAL object data against zero data
        # frames; mask their objective and residual to exactly zero.
        valid = jnp.where(idx < s_actual, jnp.float32(1.0),
                          jnp.float32(0.0))
        intensity = jnp.zeros_like(dat[0, p])
        for m in range(nmodes):
            k = p * nmodes + m
            if has_base:
                # Split-operator mode: the frame is G(base) + G(delta),
                # with the accurate base farplane read from HBM.
                frs[k] = frs[k] + zre[0, p, m]
                fis[k] = fis[k] + zim[0, p, m]
            intensity = intensity + frs[k] * frs[k] + fis[k] * fis[k]
        d = jnp.maximum(dat[0, p], 0.0)
        if model == "gaussian":
            amp = jnp.sqrt(intensity + 1e-12)
            sq = jnp.sqrt(d)
            factor = (1.0 - sq / amp) * valid
            minf_acc = minf_acc + valid * jnp.sum((amp - sq) ** 2)
        else:  # poisson
            factor = (1.0 - d / (intensity + 1e-8)) * valid
            minf_acc = minf_acc + valid * jnp.sum(
                intensity - d * jnp.log(intensity + 1e-8))
        for m in range(nmodes):
            k = p * nmodes + m
            frs[k] = frs[k] * factor
            fis[k] = fis[k] * factor
    ars, ais = _idft2_many(frs, fis, fr[...], fi[...], prec)

    # Phase C: conj-probe multiply, mode-sum, overlap scatter.
    for p in range(P):
        acc_re = jnp.zeros((nprb, nprb), jnp.float32)
        acc_im = jnp.zeros((nprb, nprb), jnp.float32)
        for m in range(nmodes):
            k = p * nmodes + m
            br = bre[0, m]
            bi = bim[0, m]
            acc_re = acc_re + (br * ars[k] + bi * ais[k])
            acc_im = acc_im + (br * ais[k] - bi * ars[k])
        _accum_patch(ore, acc_re, ys[p], xs[p], nprb)
        _accum_patch(oim, acc_im, ys[p], xs[p], nprb)
    fsum[0, 0] += minf_acc


def grad_fused(psi: jax.Array, data: jax.Array, scan_int: jax.Array,
               prb: jax.Array, ndet: int, model: str, precision=None,
               base: jax.Array | None = None):
    """Full likelihood gradient w.r.t. the object plus the objective in a
    single kernel pass (no farplane in HBM). With ``base``, the forward
    field is G(psi) + base (split-operator refinement: psi is a small
    correction, base the frozen accurate farplane).

    Returns:
      (grad_psi ``(ntheta, nz, n)`` complex64, minf ``()`` float32).
    """
    t, nz, n = psi.shape
    _, nmodes, nprb, _ = prb.shape
    s = scan_int.shape[1]
    P = _positions_per_step(nmodes)
    s_pad = -(-s // P) * P
    sy = _pad_axis1(scan_int[..., 0].astype(jnp.int32), s_pad)
    sx = _pad_axis1(scan_int[..., 1].astype(jnp.int32), s_pad)
    pre, pim = (_pad_object(a, nprb) for a in _split_c64(psi))
    dat = _pad_axis1(data.astype(jnp.float32), s_pad)
    bre, bim = _split_c64(prb)
    fr, fi = _dft_factors(ndet, nprb)
    wh, ww = _window_hw(nprb)
    hz, wn = nz + wh - nprb, n + ww - nprb

    in_specs = [
        pl.BlockSpec((ndet, nprb), lambda i, j, *_: (0, 0)),
        pl.BlockSpec((ndet, nprb), lambda i, j, *_: (0, 0)),
        pl.BlockSpec((1, hz, wn), lambda i, j, *_: (i, 0, 0)),
        pl.BlockSpec((1, hz, wn), lambda i, j, *_: (i, 0, 0)),
        pl.BlockSpec((1, P, ndet, ndet),
                     lambda i, j, *_: (i, j, 0, 0)),
        pl.BlockSpec((1, nmodes, nprb, nprb),
                     lambda i, j, *_: (i, 0, 0, 0)),
        pl.BlockSpec((1, nmodes, nprb, nprb),
                     lambda i, j, *_: (i, 0, 0, 0)),
    ]
    args = [sy, sx, fr, fi, pre, pim, dat, bre, bim]
    if base is not None:
        frame_spec = pl.BlockSpec((1, P, nmodes, ndet, ndet),
                                  lambda i, j, *_: (i, j, 0, 0, 0))
        in_specs += [frame_spec, frame_spec]
        args += [_pad_axis1(a, s_pad) for a in _split_c64(base)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t, s_pad // P),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, hz, wn), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((1, hz, wn), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.SMEM),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((t, hz, wn), jnp.float32),
        jax.ShapeDtypeStruct((t, hz, wn), jnp.float32),
        jax.ShapeDtypeStruct((t, 1), jnp.float32),
    ]
    ore, oim, fsum = pl.pallas_call(
        functools.partial(_grad_kernel, P, nmodes, nprb, model,
                          precision or PRECISION, s, base is not None),
        grid_spec=grid_spec,
        out_shape=_with_vma(out_shape, args),
        interpret=_interpret(),
    )(*args)
    return lax.complex(ore, oim)[:, :nz, :n], jnp.sum(fsum)


def _minf_kernel(P, nmodes, nprb, model, prec, s_actual, has_base, sy, sx,
                 fr, fi, pre, pim, dat, bre, bim, *rest):
    if has_base:
        zre, zim, fsum = rest
    else:
        (fsum,) = rest
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        fsum[0, 0] = jnp.float32(0.0)

    nrs, nis = [], []
    for p in range(P):
        y = sy[i, j * P + p]
        x = sx[i, j * P + p]
        ar = _load_patch(pre, y, x, nprb)
        ai = _load_patch(pim, y, x, nprb)
        for m in range(nmodes):
            br = bre[0, m]
            bi = bim[0, m]
            nrs.append(ar * br - ai * bi)
            nis.append(ar * bi + ai * br)
    frs, fis = _dft2_many(nrs, nis, fr[...], fi[...], prec)

    minf_acc = jnp.zeros((), jnp.float32)
    for p in range(P):
        idx = j * P + p
        valid = jnp.where(idx < s_actual, jnp.float32(1.0),
                          jnp.float32(0.0))
        intensity = jnp.zeros((dat.shape[-2], dat.shape[-1]), jnp.float32)
        for m in range(nmodes):
            k = p * nmodes + m
            gr_, gi_ = frs[k], fis[k]
            if has_base:
                gr_ = gr_ + zre[0, p, m]
                gi_ = gi_ + zim[0, p, m]
            intensity = intensity + gr_ * gr_ + gi_ * gi_
        d = jnp.maximum(dat[0, p], 0.0)
        if model == "gaussian":
            minf_acc = minf_acc + valid * jnp.sum(
                (jnp.sqrt(intensity + 1e-12) - jnp.sqrt(d)) ** 2)
        else:  # poisson
            minf_acc = minf_acc + valid * jnp.sum(
                intensity - d * jnp.log(intensity + 1e-8))
    fsum[0, 0] += minf_acc


def minf_fused(psi: jax.Array, data: jax.Array, scan_int: jax.Array,
               prb: jax.Array, ndet: int, model: str, precision=None,
               base: jax.Array | None = None):
    """Objective evaluation with NOTHING farplane-sized in HBM: every
    frame is produced by the MXU DFT in VMEM and reduced into the SMEM
    accumulator on the spot. This is the fully-frameless line-search
    evaluator: at 64k positions x 128^2 even the (a, b, c) quadratic
    statistics would be 13 GB, so backtracking re-evaluates the forward
    model per step instead (FLOPs are the cheap currency here). With
    ``base``, the field is G(psi) + base (split-operator refinement).

    Returns minf ``()`` float32.
    """
    t, nz, n = psi.shape
    _, nmodes, nprb, _ = prb.shape
    s = scan_int.shape[1]
    P = _positions_per_step(nmodes)
    s_pad = -(-s // P) * P
    sy = _pad_axis1(scan_int[..., 0].astype(jnp.int32), s_pad)
    sx = _pad_axis1(scan_int[..., 1].astype(jnp.int32), s_pad)
    pre, pim = (_pad_object(a, nprb) for a in _split_c64(psi))
    dat = _pad_axis1(data.astype(jnp.float32), s_pad)
    bre, bim = _split_c64(prb)
    fr, fi = _dft_factors(ndet, nprb)
    wh, ww = _window_hw(nprb)
    hz, wn = nz + wh - nprb, n + ww - nprb

    in_specs = [
        pl.BlockSpec((ndet, nprb), lambda i, j, *_: (0, 0)),
        pl.BlockSpec((ndet, nprb), lambda i, j, *_: (0, 0)),
        pl.BlockSpec((1, hz, wn), lambda i, j, *_: (i, 0, 0)),
        pl.BlockSpec((1, hz, wn), lambda i, j, *_: (i, 0, 0)),
        pl.BlockSpec((1, P, ndet, ndet),
                     lambda i, j, *_: (i, j, 0, 0)),
        pl.BlockSpec((1, nmodes, nprb, nprb),
                     lambda i, j, *_: (i, 0, 0, 0)),
        pl.BlockSpec((1, nmodes, nprb, nprb),
                     lambda i, j, *_: (i, 0, 0, 0)),
    ]
    args = [sy, sx, fr, fi, pre, pim, dat, bre, bim]
    if base is not None:
        frame_spec = pl.BlockSpec((1, P, nmodes, ndet, ndet),
                                  lambda i, j, *_: (i, j, 0, 0, 0))
        in_specs += [frame_spec, frame_spec]
        args += [_pad_axis1(a, s_pad) for a in _split_c64(base)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t, s_pad // P),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.SMEM),
        ],
    )
    out_shape = [jax.ShapeDtypeStruct((t, 1), jnp.float32)]
    (fsum,) = pl.pallas_call(
        functools.partial(_minf_kernel, P, nmodes, nprb, model,
                          precision or PRECISION, s, base is not None),
        grid_spec=grid_spec,
        out_shape=_with_vma(out_shape, args),
        interpret=_interpret(),
    )(*args)
    return jnp.sum(fsum)


# ---------------------------------------------------------------------------
# Probe-gradient mega-kernel: fwd + residual + objective + probe adjoint
# in one pass (the joint-recovery analogue of grad_fused).
# ---------------------------------------------------------------------------


def _grad_prb_kernel(P, nmodes, nprb, model, prec, s_actual, sy, sx, fr,
                     fi, pre, pim, dat, bre, bim, ore, oim, fsum):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        ore[...] = jnp.zeros_like(ore)
        oim[...] = jnp.zeros_like(oim)
        fsum[0, 0] = jnp.float32(0.0)

    minf_acc = jnp.zeros((), jnp.float32)
    pats = []
    nrs, nis = [], []
    for p in range(P):
        y = sy[i, j * P + p]
        x = sx[i, j * P + p]
        ar = _load_patch(pre, y, x, nprb)
        ai = _load_patch(pim, y, x, nprb)
        pats.append((ar, ai))
        for m in range(nmodes):
            br = bre[0, m]
            bi = bim[0, m]
            nrs.append(ar * br - ai * bi)
            nis.append(ar * bi + ai * br)
    frs, fis = _dft2_many(nrs, nis, fr[...], fi[...], prec)

    for p in range(P):
        idx = j * P + p
        valid = jnp.where(idx < s_actual, jnp.float32(1.0),
                          jnp.float32(0.0))
        intensity = jnp.zeros_like(dat[0, p])
        for m in range(nmodes):
            k = p * nmodes + m
            intensity = intensity + frs[k] * frs[k] + fis[k] * fis[k]
        d = jnp.maximum(dat[0, p], 0.0)
        if model == "gaussian":
            amp = jnp.sqrt(intensity + 1e-12)
            sq = jnp.sqrt(d)
            factor = (1.0 - sq / amp) * valid
            minf_acc = minf_acc + valid * jnp.sum((amp - sq) ** 2)
        else:  # poisson
            factor = (1.0 - d / (intensity + 1e-8)) * valid
            minf_acc = minf_acc + valid * jnp.sum(
                intensity - d * jnp.log(intensity + 1e-8))
        for m in range(nmodes):
            k = p * nmodes + m
            frs[k] = frs[k] * factor
            fis[k] = fis[k] * factor
    ars, ais = _idft2_many(frs, fis, fr[...], fi[...], prec)

    for p in range(P):
        ar, ai = pats[p]
        for m in range(nmodes):
            k = p * nmodes + m
            # conj(psi_patch) * near accumulated into the probe mode
            ore[0, m] += ar * ars[k] + ai * ais[k]
            oim[0, m] += ar * ais[k] - ai * ars[k]
    fsum[0, 0] += minf_acc


def grad_prb_fused(psi: jax.Array, data: jax.Array, scan_int: jax.Array,
                   prb: jax.Array, ndet: int, model: str, precision=None):
    """Full likelihood gradient w.r.t. the probe plus the objective in a
    single kernel pass (no farplane in HBM).

    Returns:
      (grad_prb ``(ntheta, nmodes, nprb, nprb)`` complex64,
       minf ``()`` float32).
    """
    t, nz, n = psi.shape
    _, nmodes, nprb, _ = prb.shape
    s = scan_int.shape[1]
    P = _positions_per_step(nmodes)
    s_pad = -(-s // P) * P
    sy = _pad_axis1(scan_int[..., 0].astype(jnp.int32), s_pad)
    sx = _pad_axis1(scan_int[..., 1].astype(jnp.int32), s_pad)
    pre, pim = (_pad_object(a, nprb) for a in _split_c64(psi))
    dat = _pad_axis1(data.astype(jnp.float32), s_pad)
    bre, bim = _split_c64(prb)
    fr, fi = _dft_factors(ndet, nprb)
    wh, ww = _window_hw(nprb)
    hz, wn = nz + wh - nprb, n + ww - nprb

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t, s_pad // P),
        in_specs=[
            pl.BlockSpec((ndet, nprb), lambda i, j, *_: (0, 0)),
            pl.BlockSpec((ndet, nprb), lambda i, j, *_: (0, 0)),
            pl.BlockSpec((1, hz, wn), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((1, hz, wn), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((1, P, ndet, ndet),
                         lambda i, j, *_: (i, j, 0, 0)),
            pl.BlockSpec((1, nmodes, nprb, nprb),
                         lambda i, j, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, nmodes, nprb, nprb),
                         lambda i, j, *_: (i, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, nmodes, nprb, nprb),
                         lambda i, j, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, nmodes, nprb, nprb),
                         lambda i, j, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.SMEM),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((t, nmodes, nprb, nprb), jnp.float32),
        jax.ShapeDtypeStruct((t, nmodes, nprb, nprb), jnp.float32),
        jax.ShapeDtypeStruct((t, 1), jnp.float32),
    ]
    args = (sy, sx, fr, fi, pre, pim, dat, bre, bim)
    ore, oim, fsum = pl.pallas_call(
        functools.partial(_grad_prb_kernel, P, nmodes, nprb, model,
                          precision or PRECISION, s),
        grid_spec=grid_spec,
        out_shape=_with_vma(out_shape, args),
        interpret=_interpret(),
    )(*args)
    return lax.complex(ore, oim), jnp.sum(fsum)
