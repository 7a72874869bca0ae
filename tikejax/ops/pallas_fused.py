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
                                        _window_hw)


def _positions_per_step(nmodes: int) -> int:
    # P * nmodes frame-sized f32 pairs live in VMEM per step plus matmul
    # temporaries; P=16 measured fastest at 128^2 frames on v5e (40.4 vs
    # 38.9 iters/s at P=8 on the headline CG config).
    return max(1, 16 // nmodes)


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
# kernel name (see ops.diffraction). Measured on v5e (single 128x128x128
# matmul relative error vs exact; CG rate on the 512^2/16k headline):
#   DEFAULT  (1 bf16 pass)      ~2e-3 error, fastest (~57 iters/s)
#   'bf16x3' (manual 3-pass)    ~6e-6 error, middle ('fused_mp')
#   HIGHEST  (full f32 passes)  exact,      ~15 iters/s ('fused_hp')
# Precision.HIGH is not supported by Mosaic; 'bf16x3' is the manual
# equivalent: split each operand into bf16 hi + lo and take the three
# dominant cross products.
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
    return lax.dot_general(a, b, dims, preferred_element_type=jnp.float32,
                           precision=prec)


def _dft2(nr, ni, fr, fi, prec):
    """(F @ near @ F^T) for near (nprb, nprb), F (ndet, nprb) split re/im.
    Returns farplane (ndet, ndet) re/im."""
    # t = F @ near : (ndet, nprb)
    tr = _dot(fr, nr, ((1,), (0,)), prec) - _dot(fi, ni, ((1,), (0,)), prec)
    ti = _dot(fr, ni, ((1,), (0,)), prec) + _dot(fi, nr, ((1,), (0,)), prec)
    # far = t @ F^T : contract t dim1 with F dim1
    rr = _dot(tr, fr, ((1,), (1,)), prec) - _dot(ti, fi, ((1,), (1,)), prec)
    ri = _dot(tr, fi, ((1,), (1,)), prec) + _dot(ti, fr, ((1,), (1,)), prec)
    return rr, ri


def _idft2(gr, gi, fr, fi, prec):
    """Adjoint of :func:`_dft2`: (F^H @ far @ conj(F)) for far (ndet,
    ndet). Returns nearplane (nprb, nprb) re/im."""
    # t = F^H @ far : (nprb, ndet); F^H = conj(F)^T
    tr = _dot(fr, gr, ((0,), (0,)), prec) + _dot(fi, gi, ((0,), (0,)), prec)
    ti = _dot(fr, gi, ((0,), (0,)), prec) - _dot(fi, gr, ((0,), (0,)), prec)
    # near = t @ conj(F) : contract t dim1 (ndet) with F dim0
    rr = _dot(tr, fr, ((1,), (0,)), prec) + _dot(ti, fi, ((1,), (0,)), prec)
    ri = _dot(ti, fr, ((1,), (0,)), prec) - _dot(tr, fi, ((1,), (0,)), prec)
    return rr, ri


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
    for p in range(P):
        y = sy[i, j * P + p]
        x = sx[i, j * P + p]
        ar = _load_patch(pre, y, x, nprb)
        ai = _load_patch(pim, y, x, nprb)
        for m in range(nmodes):
            br = bre[0, m]
            bi = bim[0, m]
            nr = ar * br - ai * bi
            ni = ar * bi + ai * br
            rr, ri = _dft2(nr, ni, fr[...], fi[...], prec)
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
        out_shape=out_shape,
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

    for p in range(P):
        y = sy[i, j * P + p]
        x = sx[i, j * P + p]
        acc_re = jnp.zeros((nprb, nprb), jnp.float32)
        acc_im = jnp.zeros((nprb, nprb), jnp.float32)
        for m in range(nmodes):
            nr, ni = _idft2(gre[0, p, m], gim[0, p, m], fr[...], fi[...],
                            prec)
            br = bre[0, m]
            bi = bim[0, m]
            # conj(prb) * near
            acc_re = acc_re + (br * nr + bi * ni)
            acc_im = acc_im + (br * ni - bi * nr)
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
    ore, oim = pl.pallas_call(
        functools.partial(_adj_kernel, P, nmodes, nprb,
                          precision or PRECISION),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interpret(),
    )(sy, sx, fr, fi, gre, gim, bre, bim)
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

    for p in range(P):
        y = sy[i, j * P + p]
        x = sx[i, j * P + p]
        ar = _load_patch(pre, y, x, nprb)
        ai = _load_patch(pim, y, x, nprb)
        for m in range(nmodes):
            nr, ni = _idft2(gre[0, p, m], gim[0, p, m], fr[...], fi[...],
                            prec)
            # conj(psi_patch) * near
            ore[0, m] += ar * nr + ai * ni
            oim[0, m] += ar * ni - ai * nr


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
    ore, oim = pl.pallas_call(
        functools.partial(_adj_probe_kernel, P, nmodes, nprb,
                          precision or PRECISION),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interpret(),
    )(sy, sx, fr, fi, gre, gim, pre, pim)
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
    for p in range(P):
        idx = j * P + p
        y = sy[i, idx]
        x = sx[i, idx]
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
        acc_re = jnp.zeros((nprb, nprb), jnp.float32)
        acc_im = jnp.zeros((nprb, nprb), jnp.float32)
        for m in range(nmodes):
            rr = gre[0, p, m] * factor
            ri = gim[0, p, m] * factor
            nr, ni = _idft2(rr, ri, fr[...], fi[...], prec)
            br = bre[0, m]
            bi = bim[0, m]
            acc_re = acc_re + (br * nr + bi * ni)
            acc_im = acc_im + (br * ni - bi * nr)
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
    ore, oim, fsum = pl.pallas_call(
        functools.partial(_adj_residual_kernel, P, nmodes, nprb, model,
                          precision or PRECISION, s),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interpret(),
    )(sy, sx, fr, fi, gre, gim, dat, bre, bim)
    return lax.complex(ore, oim)[:, :nz, :n], jnp.sum(fsum)


# ---------------------------------------------------------------------------
# Line-search statistics pass: forward of the direction fused with the
# quadratic statistics -- the direction farplane never touches HBM.
# ---------------------------------------------------------------------------


def _fwd_quad_kernel(P, nmodes, nprb, prec, sy, sx, fr, fi, dre, dim_, bre,
                     bim, pre_psi, pim_psi, oa, ob, oc):
    i = pl.program_id(0)
    j = pl.program_id(1)
    for p in range(P):
        y = sy[i, j * P + p]
        x = sx[i, j * P + p]
        ar = _load_patch(dre, y, x, nprb)
        ai = _load_patch(dim_, y, x, nprb)
        a = jnp.zeros((oa.shape[-2], oa.shape[-1]), jnp.float32)
        b = jnp.zeros_like(a)
        c = jnp.zeros_like(a)
        for m in range(nmodes):
            br = bre[0, m]
            bi = bim[0, m]
            nr = ar * br - ai * bi
            ni = ar * bi + ai * br
            fdr, fdi = _dft2(nr, ni, fr[...], fi[...], prec)
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
    oa, ob, oc = pl.pallas_call(
        functools.partial(_fwd_quad_kernel, P, nmodes, nprb,
                          precision or PRECISION),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interpret(),
    )(sy, sx, fr, fi, dre, dim_, bre, bim, fre, fim)
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

    minf_acc = jnp.zeros((), jnp.float32)
    for p in range(P):
        idx = j * P + p
        y = sy[i, idx]
        x = sx[i, idx]
        # Padded tail positions gather REAL object data against zero data
        # frames; mask their objective and residual to exactly zero.
        valid = jnp.where(idx < s_actual, jnp.float32(1.0),
                          jnp.float32(0.0))
        ar = _load_patch(pre, y, x, nprb)
        ai = _load_patch(pim, y, x, nprb)
        frames = []
        intensity = jnp.zeros_like(dat[0, p])
        for m in range(nmodes):
            br = bre[0, m]
            bi = bim[0, m]
            nr = ar * br - ai * bi
            ni = ar * bi + ai * br
            gr_, gi_ = _dft2(nr, ni, fr[...], fi[...], prec)
            if has_base:
                # Split-operator mode: the frame is G(base) + G(delta),
                # with the accurate base farplane read from HBM.
                gr_ = gr_ + zre[0, p, m]
                gi_ = gi_ + zim[0, p, m]
            frames.append((gr_, gi_))
            intensity = intensity + gr_ * gr_ + gi_ * gi_
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
        acc_re = jnp.zeros((nprb, nprb), jnp.float32)
        acc_im = jnp.zeros((nprb, nprb), jnp.float32)
        for m in range(nmodes):
            gr_, gi_ = frames[m]
            nr, ni = _idft2(gr_ * factor, gi_ * factor, fr[...], fi[...],
                            prec)
            br = bre[0, m]
            bi = bim[0, m]
            acc_re = acc_re + (br * nr + bi * ni)
            acc_im = acc_im + (br * ni - bi * nr)
        _accum_patch(ore, acc_re, y, x, nprb)
        _accum_patch(oim, acc_im, y, x, nprb)
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
        out_shape=out_shape,
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

    minf_acc = jnp.zeros((), jnp.float32)
    for p in range(P):
        idx = j * P + p
        y = sy[i, idx]
        x = sx[i, idx]
        valid = jnp.where(idx < s_actual, jnp.float32(1.0),
                          jnp.float32(0.0))
        ar = _load_patch(pre, y, x, nprb)
        ai = _load_patch(pim, y, x, nprb)
        intensity = jnp.zeros((dat.shape[-2], dat.shape[-1]), jnp.float32)
        for m in range(nmodes):
            br = bre[0, m]
            bi = bim[0, m]
            nr = ar * br - ai * bi
            ni = ar * bi + ai * br
            gr_, gi_ = _dft2(nr, ni, fr[...], fi[...], prec)
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
        out_shape=out_shape,
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
    for p in range(P):
        idx = j * P + p
        y = sy[i, idx]
        x = sx[i, idx]
        valid = jnp.where(idx < s_actual, jnp.float32(1.0),
                          jnp.float32(0.0))
        ar = _load_patch(pre, y, x, nprb)
        ai = _load_patch(pim, y, x, nprb)
        frames = []
        intensity = jnp.zeros_like(dat[0, p])
        for m in range(nmodes):
            br = bre[0, m]
            bi = bim[0, m]
            nr = ar * br - ai * bi
            ni = ar * bi + ai * br
            gr_, gi_ = _dft2(nr, ni, fr[...], fi[...], prec)
            frames.append((gr_, gi_))
            intensity = intensity + gr_ * gr_ + gi_ * gi_
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
            gr_, gi_ = frames[m]
            nr, ni = _idft2(gr_ * factor, gi_ * factor, fr[...], fi[...],
                            prec)
            # conj(psi_patch) * near accumulated into the probe mode
            ore[0, m] += ar * nr + ai * ni
            oim[0, m] += ar * ni - ai * nr
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
    ore, oim, fsum = pl.pallas_call(
        functools.partial(_grad_prb_kernel, P, nmodes, nprb, model,
                          precision or PRECISION, s),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interpret(),
    )(sy, sx, fr, fi, pre, pim, dat, bre, bim)
    return lax.complex(ore, oim), jnp.sum(fsum)
