"""Fused multi-candidate line-search objective kernel.

The CG line search needs ``minf(psi + gamma_k * d)`` for a backtracking
sequence of K candidate steps. By linearity of the forward model the
per-pixel intensity at step gamma is the quadratic ``a + 2 gamma b +
gamma^2 c`` in three real sufficient statistics of the two farplanes
(solvers/cg.py). The XLA path materialises (a, b, c) and re-reads them
per backtracking probe; this kernel instead reads the two mode-resolved
farplanes and the data ONCE and emits the objective at ALL K candidates
-- the entire line search costs a single memory pass, independent of how
many halvings it takes.

Padded positions contribute exactly zero to either objective (I = 0 and
d = 0 give (sqrt(eps)-0)^2 ~ eps for gaussian -- subtracted via a
constant-free formulation below -- and 0 - 0*log(eps) = 0 for poisson).
For gaussian we accumulate (amp - sqrt(d))^2 with amp = sqrt(I); at I=0,
d=0 the term is 0 without any eps shenanigans because sqrt(0)=0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tikejax.ops.pallas_kernels import (_interpret, _pad_axis1,
                                        _split_c64, _with_vma)

_B = 8  # frames per grid step


def _ls_kernel(K, B, nmodes, model, gam, fpr, fpi, fdr, fdi, dat, out):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        for k in range(K):  # SMEM accepts scalar stores only
            out[0, 0, k] = jnp.float32(0.0)

    a = jnp.zeros_like(dat[0])
    b = jnp.zeros_like(dat[0])
    c = jnp.zeros_like(dat[0])
    for m in range(nmodes):
        a = a + fpr[0, :, m] ** 2 + fpi[0, :, m] ** 2
        b = b + fpr[0, :, m] * fdr[0, :, m] + fpi[0, :, m] * fdi[0, :, m]
        c = c + fdr[0, :, m] ** 2 + fdi[0, :, m] ** 2
    d = jnp.maximum(dat[0], 0.0)
    if model == "gaussian":
        sq = jnp.sqrt(d)
    for k in range(K):
        g = gam[0, k]
        intensity = jnp.maximum(a + 2.0 * g * b + g * g * c, 0.0)
        if model == "gaussian":
            amp = jnp.sqrt(intensity)
            out[0, 0, k] += jnp.sum((amp - sq) ** 2)
        else:  # poisson
            out[0, 0, k] += jnp.sum(
                intensity - d * jnp.log(intensity + 1e-8))


def ls_objectives(fpsi: jax.Array, fd: jax.Array, data: jax.Array,
                  gammas: jax.Array, model: str) -> jax.Array:
    """Objective values at all candidate steps in one pass.

    Args:
      fpsi, fd: ``(ntheta, nscan, nmodes, nd, nd)`` complex64 farplanes of
        the current iterate and the search direction.
      data: ``(ntheta, nscan, nd, nd)`` measured intensities.
      gammas: ``(K,)`` float32 candidate steps (dynamic values, static K).
      model: 'gaussian' or 'poisson'.

    Returns:
      ``(K,)`` float32 objective values.
    """
    t, s, nmodes, nd, _ = fpsi.shape
    k = gammas.shape[0]
    s_pad = -(-s // _B) * _B
    fpr, fpi = (_pad_axis1(x, s_pad) for x in _split_c64(fpsi))
    fdr, fdi = (_pad_axis1(x, s_pad) for x in _split_c64(fd))
    dat = _pad_axis1(data.astype(jnp.float32), s_pad)
    gam = gammas.astype(jnp.float32).reshape(1, k)
    grid_steps = s_pad // _B

    frame_spec = pl.BlockSpec((1, _B, nmodes, nd, nd),
                              lambda i, j: (i, j, 0, 0, 0))
    # Per-angle accumulator block revisited across the (sequential) scan
    # grid dimension, like the scatter kernels: race-free, deterministic.
    args = (gam, fpr, fpi, fdr, fdi, dat)
    out = pl.pallas_call(
        functools.partial(_ls_kernel, k, _B, nmodes, model),
        grid=(t, grid_steps),
        in_specs=[
            pl.BlockSpec((1, k), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            frame_spec, frame_spec, frame_spec, frame_spec,
            pl.BlockSpec((1, _B, nd, nd), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, k), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=_with_vma(
            jax.ShapeDtypeStruct((t, 1, k), jnp.float32), args),
        interpret=_interpret(),
    )(*args)
    return jnp.sum(out, axis=(0, 1))
