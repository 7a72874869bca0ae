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


# MXU precision of the DFT factor matmuls. Measured on v5e (512^2/16k
# headline config): DEFAULT = ~8.5e-4 relative operator error vs the FFT
# path at ~25-38 CG iters/s; HIGHEST (full-f32 passes) = ~2e-7 error at
# ~15 iters/s. Precision.HIGH is not supported by Mosaic. Set to HIGHEST
# for metrology-grade operator accuracy (and call jax.clear_caches() if
# changing after traces exist).
PRECISION = lax.Precision.DEFAULT


def _dot(a, b, contract):
    return lax.dot_general(a, b, (contract, ((), ())),
                           preferred_element_type=jnp.float32,
                           precision=PRECISION)


def _dft2(nr, ni, fr, fi):
    """(F @ near @ F^T) for near (nprb, nprb), F (ndet, nprb) split re/im.
    Returns farplane (ndet, ndet) re/im."""
    # t = F @ near : (ndet, nprb)
    tr = _dot(fr, nr, ((1,), (0,))) - _dot(fi, ni, ((1,), (0,)))
    ti = _dot(fr, ni, ((1,), (0,))) + _dot(fi, nr, ((1,), (0,)))
    # far = t @ F^T : contract t dim1 with F dim1
    rr = _dot(tr, fr, ((1,), (1,))) - _dot(ti, fi, ((1,), (1,)))
    ri = _dot(tr, fi, ((1,), (1,))) + _dot(ti, fr, ((1,), (1,)))
    return rr, ri


def _idft2(gr, gi, fr, fi):
    """Adjoint of :func:`_dft2`: (F^H @ far @ conj(F)) for far (ndet,
    ndet). Returns nearplane (nprb, nprb) re/im."""
    # t = F^H @ far : (nprb, ndet); F^H = conj(F)^T
    tr = _dot(fr, gr, ((0,), (0,))) + _dot(fi, gi, ((0,), (0,)))
    ti = _dot(fr, gi, ((0,), (0,))) - _dot(fi, gr, ((0,), (0,)))
    # near = t @ conj(F) : contract t dim1 (ndet) with F dim0
    rr = _dot(tr, fr, ((1,), (0,))) + _dot(ti, fi, ((1,), (0,)))
    ri = _dot(ti, fr, ((1,), (0,))) - _dot(tr, fi, ((1,), (0,)))
    return rr, ri


# ---------------------------------------------------------------------------
# fwd: gather + probe-multiply + DFT, one kernel.
# ---------------------------------------------------------------------------


def _fwd_kernel(P, nmodes, nprb, sy, sx, fr, fi, pre, pim, bre, bim, ore,
                oim):
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
            rr, ri = _dft2(nr, ni, fr[...], fi[...])
            ore[0, p, m] = rr
            oim[0, p, m] = ri


def fwd(psi: jax.Array, scan_int: jax.Array, prb: jax.Array,
        ndet: int) -> jax.Array:
    """Fused forward: farplane[t,s,m] = DFT2(pad(psi[patch(s)] * prb[m])).

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
        ],
        out_specs=[
            pl.BlockSpec((1, P, nmodes, ndet, ndet),
                         lambda i, j, *_: (i, j, 0, 0, 0)),
            pl.BlockSpec((1, P, nmodes, ndet, ndet),
                         lambda i, j, *_: (i, j, 0, 0, 0)),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((t, s_pad, nmodes, ndet, ndet), jnp.float32),
        jax.ShapeDtypeStruct((t, s_pad, nmodes, ndet, ndet), jnp.float32),
    ]
    ore, oim = pl.pallas_call(
        functools.partial(_fwd_kernel, P, nmodes, nprb),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interpret(),
    )(sy, sx, fr, fi, pre, pim, bre, bim)
    return lax.complex(ore, oim)[:, :s]


# ---------------------------------------------------------------------------
# adj (object): IDFT + conj-probe + overlap scatter, one kernel.
# ---------------------------------------------------------------------------


def _adj_kernel(P, nmodes, nprb, sy, sx, fr, fi, gre, gim, bre, bim, ore,
                oim):
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
            nr, ni = _idft2(gre[0, p, m], gim[0, p, m], fr[...], fi[...])
            br = bre[0, m]
            bi = bim[0, m]
            # conj(prb) * near
            acc_re = acc_re + (br * nr + bi * ni)
            acc_im = acc_im + (br * ni - bi * nr)
        _accum_patch(ore, acc_re, y, x, nprb)
        _accum_patch(oim, acc_im, y, x, nprb)


def adj(farplane: jax.Array, scan_int: jax.Array, prb: jax.Array, nz: int,
        n: int) -> jax.Array:
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
        functools.partial(_adj_kernel, P, nmodes, nprb),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interpret(),
    )(sy, sx, fr, fi, gre, gim, bre, bim)
    return lax.complex(ore, oim)[:, :nz, :n]


# ---------------------------------------------------------------------------
# adj (probe): IDFT + conj-patch + reduce over positions, one kernel.
# ---------------------------------------------------------------------------


def _adj_probe_kernel(P, nmodes, nprb, sy, sx, fr, fi, gre, gim, pre, pim,
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
        ar = _load_patch(pre, y, x, nprb)
        ai = _load_patch(pim, y, x, nprb)
        for m in range(nmodes):
            nr, ni = _idft2(gre[0, p, m], gim[0, p, m], fr[...], fi[...])
            # conj(psi_patch) * near
            ore[0, m] += ar * nr + ai * ni
            oim[0, m] += ar * ni - ai * nr


def adj_probe(farplane: jax.Array, scan_int: jax.Array, psi: jax.Array,
              nprb: int) -> jax.Array:
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
        functools.partial(_adj_probe_kernel, P, nmodes, nprb),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interpret(),
    )(sy, sx, fr, fi, gre, gim, pre, pim)
    return lax.complex(ore, oim)


# ---------------------------------------------------------------------------
# Gradient pass: residual + objective + adjoint in ONE kernel.
# ---------------------------------------------------------------------------


def _adj_residual_kernel(P, nmodes, nprb, model, sy, sx, fr, fi, gre, gim,
                         dat, bre, bim, ore, oim, fsum):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        ore[...] = jnp.zeros_like(ore)
        oim[...] = jnp.zeros_like(oim)
        fsum[0, 0] = jnp.float32(0.0)

    minf_acc = jnp.zeros((), jnp.float32)
    for p in range(P):
        y = sy[i, j * P + p]
        x = sx[i, j * P + p]
        # Incoherent intensity over modes, residual factor, objective.
        intensity = jnp.zeros_like(dat[0, p])
        for m in range(nmodes):
            intensity = intensity + gre[0, p, m] ** 2 + gim[0, p, m] ** 2
        d = jnp.maximum(dat[0, p], 0.0)
        if model == "gaussian":
            amp = jnp.sqrt(intensity + 1e-12)
            sq = jnp.sqrt(d)
            factor = 1.0 - sq / amp
            minf_acc = minf_acc + jnp.sum((amp - sq) ** 2)
        else:  # poisson
            factor = 1.0 - d / (intensity + 1e-8)
            minf_acc = minf_acc + jnp.sum(
                intensity - d * jnp.log(intensity + 1e-8))
        acc_re = jnp.zeros((nprb, nprb), jnp.float32)
        acc_im = jnp.zeros((nprb, nprb), jnp.float32)
        for m in range(nmodes):
            rr = gre[0, p, m] * factor
            ri = gim[0, p, m] * factor
            nr, ni = _idft2(rr, ri, fr[...], fi[...])
            br = bre[0, m]
            bi = bim[0, m]
            acc_re = acc_re + (br * nr + bi * ni)
            acc_im = acc_im + (br * ni - bi * nr)
        _accum_patch(ore, acc_re, y, x, nprb)
        _accum_patch(oim, acc_im, y, x, nprb)
    fsum[0, 0] += minf_acc


def adj_residual(farplane: jax.Array, data: jax.Array, scan_int: jax.Array,
                 prb: jax.Array, nz: int, n: int, model: str):
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
    # Padded frames have I=0 and d=0: zero objective and zero residual
    # contribution for both models.
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
        functools.partial(_adj_residual_kernel, P, nmodes, nprb, model),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interpret(),
    )(sy, sx, fr, fi, gre, gim, dat, bre, bim)
    return lax.complex(ore, oim)[:, :nz, :n], jnp.sum(fsum)
