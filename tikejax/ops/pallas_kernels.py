"""Pallas TPU kernels for the patch gather / overlap scatter hot ops.

TPU-native re-design of the reference's CUDA kernels
([R] src/cuda/ptychofft.cu: fwd gather-multiply ``mul``, adjoint
scatter-add ``mula`` with atomicAdd, probe-adjoint reduction; SURVEY.md
SS2/C2). Three fused kernels:

* :func:`gather_probe_mul` -- fwd pre-FFT: gather object patches at scan
  offsets and multiply by every probe mode in one pass.
* :func:`scatter_conj_probe` -- adj post-IFFT: conj(probe)-multiply each
  mode, sum modes, and scatter-add the overlapping patches into the
  object. Where the reference uses hardware atomicAdd (nondeterministic
  summation order), the TPU grid executes **sequentially** and the object
  block stays resident in VMEM across grid steps, so the accumulation is
  race-free and bitwise deterministic by construction (SURVEY.md SS5
  "race detection" row, SS7 hard parts).
* :func:`adj_probe_reduce` -- probe adjoint: gather object patches,
  conj-multiply with the incoming frames and reduce over all scan
  positions into the probe modes.

Mosaic constraints shape the addressing scheme: dynamic vector loads/
stores require the sublane offset to be a multiple of 8 and the lane
offset a multiple of 128 (fp32). Scan offsets are arbitrary integers, so
each access decomposes ``y = 8*(y//8) + ry``, ``x = 128*(x//128) + rx``
and touches an **aligned** power-of-two window (see ``_window_hw``); the
object array is padded by the window margins so windows never overrun.
The residual (ry, rx) shift is applied with dynamic sublane/lane rotates
(``pltpu.roll``); window shapes are power-of-two because v5e's dynamic
sublane rotate silently mis-shifts on non-pow2 row counts. The scatter
rotates a zero-margined placement the other way before an aligned
read-modify-write. Scan offsets arrive via scalar prefetch
(``PrefetchScalarGridSpec``).

Pallas TPU has no complex dtype: complex arrays cross the kernel boundary
as (real, imag) float32 pairs (split/recombined by XLA, which fuses the
conversions into neighbouring ops).

Off-TPU (CPU tests) the kernels run in interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUB = 8     # fp32 sublane alignment quantum
_LANE = 128  # lane alignment quantum


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _with_vma(out_shape, args):
    """Stamp each output struct with the union of the inputs' varying
    manual axes so the kernels type-check under ``jax.shard_map``'s
    ``check_vma=True`` (outputs derived from a sharded input vary over
    that input's mesh axes). Outside shard_map the union is empty and
    the structs pass through unchanged."""
    vma = frozenset()
    for a in args:
        vma = vma | getattr(jax.typeof(a), "vma", frozenset())
    if not vma:
        return out_shape
    mk = lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, vma=vma)
    if isinstance(out_shape, (list, tuple)):
        return type(out_shape)(mk(s) for s in out_shape)
    return mk(out_shape)


def _positions_per_step(nmodes: int) -> int:
    # Keep the per-step frame block (P * nmodes * nprb^2 * 8B) around <= 1MB
    # for 128^2 probes so double buffering fits VMEM comfortably.
    return max(1, 8 // nmodes)


def _pad_axis1(x, s_pad):
    s = x.shape[1]
    if s == s_pad:
        return x
    pad = [(0, 0)] * x.ndim
    pad[1] = (0, s_pad - s)
    return jnp.pad(x, pad)


def _split_c64(x):
    if not jnp.iscomplexobj(x):
        raise TypeError(f"pallas kernels expect complex input, got {x.dtype}")
    return (jnp.real(x).astype(jnp.float32), jnp.imag(x).astype(jnp.float32))



def _next_pow2(v):
    p = 1
    while p < v:
        p *= 2
    return p


def _window_hw(nprb):
    """v1 aligned window shape enclosing an nprb x nprb patch at any
    offset (both residual shifts applied with dynamic rotates).

    Power-of-two sizes, not just sublane/lane-aligned ones: v5e's dynamic
    sublane rotate (tpu.dynamic_rotate on axis 0) produces wrong results
    for non-power-of-two row counts (e.g. 72 rows mis-shifts by +32;
    empirically verified 32/64/128/256 correct, 40/72/136/144 wrong), and
    the lane dimension must be >= nprb + 128 for the offset remainder."""
    return (max(_next_pow2(nprb + _SUB), 2 * _SUB),
            max(_next_pow2(nprb + _LANE), 2 * _LANE))


def _window_hw2(nprb):
    """v2 addressing window (see pallas_fused): ~nprb+8 rows -- the
    sublane residual is folded into the DFT row factor instead of being
    applied with a dynamic sublane rotate, so there is no pow2 row-count
    constraint and the window over-read halves. Rows are rounded up to a
    sublane multiple so the dynamic window slice stays tile-clean for
    probe sides that are not multiples of 8. The lane dimension is
    unchanged (the lane residual is applied with ONE lane roll)."""
    rows = -(-nprb // _SUB) * _SUB + _SUB
    return (rows, max(_next_pow2(nprb + _LANE), 2 * _LANE))


def _pad_object(x, nprb, hw=None):
    """Pad (t, nz, n) by the window margins so aligned windows at any
    in-bounds scan offset stay inside the array."""
    h, w = hw or _window_hw(nprb)
    return jnp.pad(x, ((0, 0), (0, h - nprb), (0, w - nprb)))


def _aligned(y, x):
    y0 = pl.multiple_of((y // _SUB) * _SUB, _SUB)
    x0 = pl.multiple_of((x // _LANE) * _LANE, _LANE)
    return y0, y - y0, x0, x - x0


def _pos_ok(y):
    """Sentinel test for masked positions (scan row < 0 marks a dummy --
    see pallas_fused._pos_ok): returns (clamped_y, valid_f32_scalar)."""
    return jnp.maximum(y, 0), jnp.where(y >= 0, jnp.float32(1.0),
                                        jnp.float32(0.0))


# Timing-only ablation switch: 1 skips the dynamic rotates (WRONG
# results) to measure their share of kernel time; 2 additionally skips
# the aligned window read (loads a static window); 3 skips only the
# sublane (axis 0) rolls; 4 skips only the lane (axis 1) rolls. NOT an
# env knob (wrong-results switches stay off the production import path):
# benchmarks/addr_ablate.py sets this module global explicitly, before
# the first trace.
_NOROLL = 0


def _load_patch(ref, y, x, nprb):
    """Read the nprb x nprb patch at arbitrary (y, x) from a padded ref:
    aligned pow2 window + dynamic sublane/lane rotates (cheap VPU data
    movement; the window lives in VMEM so the over-read costs no HBM)."""
    y0, ry, x0, rx = _aligned(y, x)
    h, w = _window_hw(nprb)
    if _NOROLL == 2:
        return ref[0, :nprb, :nprb]
    win = ref[0, pl.ds(y0, h), pl.ds(x0, w)]
    if _NOROLL in (0, 4):
        win = pltpu.roll(win, -ry, axis=0)
    if _NOROLL in (0, 3):
        win = pltpu.roll(win, -rx, axis=1)
    return win[:nprb, :nprb]


def _accum_patch(ref, val, y, x, nprb):
    """ref[patch at (y, x)] += val via aligned read-modify-write; the
    rotated margins are exactly zero so the RMW adds nothing outside the
    patch."""
    y0, ry, x0, rx = _aligned(y, x)
    h, w = _window_hw(nprb)
    if _NOROLL == 2:
        ref[0, :nprb, :nprb] = ref[0, :nprb, :nprb] + val
        return
    padded = jnp.concatenate(
        [val, jnp.zeros((nprb, w - nprb), jnp.float32)], axis=1)
    padded = jnp.concatenate(
        [padded, jnp.zeros((h - nprb, w), jnp.float32)], axis=0)
    if _NOROLL in (0, 4):
        padded = pltpu.roll(padded, ry, axis=0)
    if _NOROLL in (0, 3):
        padded = pltpu.roll(padded, rx, axis=1)
    cur = ref[0, pl.ds(y0, h), pl.ds(x0, w)]
    ref[0, pl.ds(y0, h), pl.ds(x0, w)] = cur + padded


# --- v2 addressing (pallas_fused's default): no sublane rotates -----------
#
# The sublane residual ry is NOT applied to the data at all. The gather
# returns the row-EXTENDED patch (nprb+8, nprb) whose rows [ry, ry+nprb)
# hold the true patch; the static row-extended DFT factor contracts all
# rows and the resulting per-frame row phase is either cancelled
# algebraically or applied as a cheap (ndet, 1) phase column
# (pallas_fused._phase_rows), and the probe multiply uses an
# 8-variant row-placed probe table. Measured motivation: the dynamic
# sublane rotate is the dominant addressing cost on v5e (catastrophically
# so under some libtpu builds: 207 ms/iter with both rotates vs 4.9 with
# lane-only on the 512^2/16k headline).


def _load_patch_ext(ref, y, x, nprb):
    """v2 gather: aligned (nprb+8, WW) window read + ONE lane roll.

    Returns the (nprb+8, nprb) extended patch (rows [ry, ry+nprb) are the
    true patch, other rows are neighbouring object data to be masked by
    the row-placed probe variant) and the sublane residual ry."""
    y0, ry, x0, rx = _aligned(y, x)
    h, w = _window_hw2(nprb)
    win = ref[0, pl.ds(y0, h), pl.ds(x0, w)]
    if _NOROLL in (0, 3):  # ablation knobs 1/2/4 skip the lane roll
        win = pltpu.roll(win, -rx, axis=1)
    return win[:, :nprb], ry


def _accum_patch_ext(ref, val, y, x, nprb):
    """v2 scatter: val (nprb+8, nprb) with rows outside [ry, ry+nprb)
    already zeroed (by the conj probe-variant multiply); lane-pad, ONE
    lane roll, aligned read-modify-write."""
    y0, ry, x0, rx = _aligned(y, x)
    h, w = _window_hw2(nprb)
    padded = jnp.concatenate(
        [val, jnp.zeros((h, w - nprb), jnp.float32)], axis=1)
    if _NOROLL in (0, 3):
        padded = pltpu.roll(padded, rx, axis=1)
    cur = ref[0, pl.ds(y0, h), pl.ds(x0, w)]
    ref[0, pl.ds(y0, h), pl.ds(x0, w)] = cur + padded


# ---------------------------------------------------------------------------
# fwd: gather patches and multiply by probe modes.
# ---------------------------------------------------------------------------


def _gather_mul_kernel(P, nmodes, nprb, sy, sx, pre, pim, bre, bim, ore,
                       oim):
    i = pl.program_id(0)
    j = pl.program_id(1)
    for p in range(P):
        y = sy[i, j * P + p]
        x = sx[i, j * P + p]
        y, pv = _pos_ok(y)
        ar = _load_patch(pre, y, x, nprb) * pv
        ai = _load_patch(pim, y, x, nprb) * pv
        for m in range(nmodes):
            br = bre[0, m]
            bi = bim[0, m]
            ore[0, p, m] = ar * br - ai * bi
            oim[0, p, m] = ar * bi + ai * br


def gather_probe_mul(psi: jax.Array, scan_int: jax.Array,
                     prb: jax.Array) -> jax.Array:
    """Fused gather+multiply: nearplane[t,s,m] = psi[patch(s)] * prb[m].

    Args:
      psi: ``(ntheta, nz, n)`` complex64.
      scan_int: ``(ntheta, nscan, 2)`` int32 (y, x) in-bounds offsets.
      prb: ``(ntheta, nmodes, nprb, nprb)`` complex64.

    Returns:
      ``(ntheta, nscan, nmodes, nprb, nprb)`` complex64.
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
    wh, ww = _window_hw(nprb)
    hz, wn = nz + wh - nprb, n + ww - nprb

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t, s_pad // P),
        in_specs=[
            pl.BlockSpec((1, hz, wn), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((1, hz, wn), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((1, nmodes, nprb, nprb),
                         lambda i, j, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, nmodes, nprb, nprb),
                         lambda i, j, *_: (i, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, P, nmodes, nprb, nprb),
                         lambda i, j, *_: (i, j, 0, 0, 0)),
            pl.BlockSpec((1, P, nmodes, nprb, nprb),
                         lambda i, j, *_: (i, j, 0, 0, 0)),
        ],
    )
    args = (sy, sx, pre, pim, bre, bim)
    out_shape = [
        jax.ShapeDtypeStruct((t, s_pad, nmodes, nprb, nprb), jnp.float32),
        jax.ShapeDtypeStruct((t, s_pad, nmodes, nprb, nprb), jnp.float32),
    ]
    ore, oim = pl.pallas_call(
        functools.partial(_gather_mul_kernel, P, nmodes, nprb),
        grid_spec=grid_spec,
        out_shape=_with_vma(out_shape, args),
        interpret=_interpret(),
    )(*args)
    return lax.complex(ore, oim)[:, :s]


# ---------------------------------------------------------------------------
# adj (object): conj(probe)-multiply, mode-sum, overlap scatter-add.
# ---------------------------------------------------------------------------


def _scatter_kernel(P, nmodes, nprb, sy, sx, fre, fim, bre, bim, ore, oim):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        ore[...] = jnp.zeros_like(ore)
        oim[...] = jnp.zeros_like(oim)

    for p in range(P):
        y = sy[i, j * P + p]
        x = sx[i, j * P + p]
        y, pv = _pos_ok(y)
        acc_re = jnp.zeros((nprb, nprb), jnp.float32)
        acc_im = jnp.zeros((nprb, nprb), jnp.float32)
        for m in range(nmodes):
            fr = fre[0, p, m]
            fi = fim[0, p, m]
            br = bre[0, m]
            bi = bim[0, m]
            # conj(prb) * frame
            acc_re = acc_re + (br * fr + bi * fi)
            acc_im = acc_im + (br * fi - bi * fr)
        _accum_patch(ore, acc_re * pv, y, x, nprb)
        _accum_patch(oim, acc_im * pv, y, x, nprb)


def scatter_conj_probe(nearplane: jax.Array, scan_int: jax.Array,
                       prb: jax.Array, nz: int, n: int) -> jax.Array:
    """Adjoint-to-object accumulation (the reference's atomicAdd scatter,
    made deterministic): ``psi_acc[patch(s)] += sum_m conj(prb_m) *
    nearplane[s, m]``.

    Args:
      nearplane: ``(ntheta, nscan, nmodes, nprb, nprb)`` complex64
        (IFFT'd, cropped frames).

    Returns:
      ``(ntheta, nz, n)`` complex64.
    """
    t, s, nmodes, nprb, _ = nearplane.shape
    P = _positions_per_step(nmodes)
    s_pad = -(-s // P) * P
    sy = _pad_axis1(scan_int[..., 0].astype(jnp.int32), s_pad)
    sx = _pad_axis1(scan_int[..., 1].astype(jnp.int32), s_pad)
    # Zero-padded frames contribute zero to the scatter: no masking needed.
    fre, fim = _split_c64(nearplane)
    fre = _pad_axis1(fre, s_pad)
    fim = _pad_axis1(fim, s_pad)
    bre, bim = _split_c64(prb)
    wh, ww = _window_hw(nprb)
    hz, wn = nz + wh - nprb, n + ww - nprb

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t, s_pad // P),
        in_specs=[
            pl.BlockSpec((1, P, nmodes, nprb, nprb),
                         lambda i, j, *_: (i, j, 0, 0, 0)),
            pl.BlockSpec((1, P, nmodes, nprb, nprb),
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
    args = (sy, sx, fre, fim, bre, bim)
    out_shape = [
        jax.ShapeDtypeStruct((t, hz, wn), jnp.float32),
        jax.ShapeDtypeStruct((t, hz, wn), jnp.float32),
    ]
    ore, oim = pl.pallas_call(
        functools.partial(_scatter_kernel, P, nmodes, nprb),
        grid_spec=grid_spec,
        out_shape=_with_vma(out_shape, args),
        interpret=_interpret(),
    )(*args)
    return lax.complex(ore, oim)[:, :nz, :n]


# ---------------------------------------------------------------------------
# adj (probe): gather patches, conj-multiply, reduce over positions.
# ---------------------------------------------------------------------------


def _adj_probe_kernel(P, nmodes, nprb, sy, sx, fre, fim, pre, pim, ore,
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
        y, pv = _pos_ok(y)
        ar = _load_patch(pre, y, x, nprb) * pv
        ai = _load_patch(pim, y, x, nprb) * pv
        for m in range(nmodes):
            fr = fre[0, p, m]
            fi = fim[0, p, m]
            # conj(psi_patch) * frame
            ore[0, m] += ar * fr + ai * fi
            oim[0, m] += ar * fi - ai * fr


def adj_probe_reduce(nearplane: jax.Array, scan_int: jax.Array,
                     psi: jax.Array) -> jax.Array:
    """Probe adjoint: ``prb_acc[m] = sum_s conj(psi[patch(s)]) *
    nearplane[s, m]`` (the reference's probe atomicAdd reduction, made
    deterministic).

    Returns:
      ``(ntheta, nmodes, nprb, nprb)`` complex64.
    """
    t, s, nmodes, nprb, _ = nearplane.shape
    _, nz, n = psi.shape
    P = _positions_per_step(nmodes)
    s_pad = -(-s // P) * P
    sy = _pad_axis1(scan_int[..., 0].astype(jnp.int32), s_pad)
    sx = _pad_axis1(scan_int[..., 1].astype(jnp.int32), s_pad)
    fre, fim = _split_c64(nearplane)
    fre = _pad_axis1(fre, s_pad)
    fim = _pad_axis1(fim, s_pad)
    pre, pim = (_pad_object(a, nprb) for a in _split_c64(psi))
    wh, ww = _window_hw(nprb)
    hz, wn = nz + wh - nprb, n + ww - nprb

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t, s_pad // P),
        in_specs=[
            pl.BlockSpec((1, P, nmodes, nprb, nprb),
                         lambda i, j, *_: (i, j, 0, 0, 0)),
            pl.BlockSpec((1, P, nmodes, nprb, nprb),
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
    args = (sy, sx, fre, fim, pre, pim)
    out_shape = [
        jax.ShapeDtypeStruct((t, nmodes, nprb, nprb), jnp.float32),
        jax.ShapeDtypeStruct((t, nmodes, nprb, nprb), jnp.float32),
    ]
    ore, oim = pl.pallas_call(
        functools.partial(_adj_probe_kernel, P, nmodes, nprb),
        grid_spec=grid_spec,
        out_shape=_with_vma(out_shape, args),
        interpret=_interpret(),
    )(*args)
    return lax.complex(ore, oim)
