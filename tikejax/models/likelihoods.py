"""Data-fidelity objectives and their farplane-domain residuals.

Reimplements the reference solver's ``minf`` and gradient residuals
([R] libtike/cufft/ptycho.py; SURVEY.md SS2/C5):

Gaussian (amplitude matching):
    F(G) = sum over frames of ( A - sqrt(d) )^2,
    with A = sqrt(sum_m |G_m|^2) the incoherent multi-mode amplitude.
    dF/dconj(G_m) = G_m * (1 - sqrt(d) / A).

Poisson (maximum likelihood for counting noise):
    F(G) = sum ( I - d * log(I + eps) ),   I = sum_m |G_m|^2
    dF/dconj(G_m) = G_m * (1 - d / (I + eps)).

The residual factor is shared across modes (multi-mode incoherent model,
BASELINE.json:10); for nmodes=1 these reduce exactly to the reference's
single-mode formulas. Constant factors are absorbed into the line search.

All functions accept an optional ``axis_name`` for scan-position-sharded
execution: scalar objectives are ``psum``-ed over the mesh axis so every
device sees the global value (SURVEY.md SS5 parallelism plan).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

MODELS = ("gaussian", "poisson")


def total_intensity(farplane: jax.Array) -> jax.Array:
    """Incoherent intensity: sum over the mode axis of |G_m|^2.

    farplane ``(ntheta, nscan, nmodes, ndet, ndet)`` ->
    ``(ntheta, nscan, ndet, ndet)`` real.
    """
    return jnp.sum(jnp.abs(farplane)**2, axis=2)


def _psum(x, axis_name):
    return lax.psum(x, axis_name) if axis_name is not None else x


def gaussian_minf(farplane, data, eps: float = 1e-12, axis_name=None):
    amp = jnp.sqrt(total_intensity(farplane) + eps)
    sq = jnp.sqrt(jnp.maximum(data, 0.0))
    return _psum(jnp.sum((amp - sq)**2), axis_name)


def gaussian_residual(farplane, data, eps: float = 1e-12):
    intensity = total_intensity(farplane)
    amp = jnp.sqrt(intensity + eps)
    sq = jnp.sqrt(jnp.maximum(data, 0.0))
    factor = 1.0 - sq / amp
    return farplane * factor[:, :, None, :, :].astype(farplane.dtype)


def poisson_minf(farplane, data, eps: float = 1e-8, axis_name=None):
    intensity = total_intensity(farplane)
    d = jnp.maximum(data, 0.0)
    return _psum(jnp.sum(intensity - d * jnp.log(intensity + eps)), axis_name)


def poisson_perfect_minf(data, eps: float = 1e-8, axis_name=None):
    """Poisson objective at the perfect fit ``I = d``: the data-dependent
    constant ``sum(d - d*log(d + eps))`` (same eps as
    :func:`poisson_minf`, so ``poisson_minf - poisson_perfect_minf`` is
    the generalized KL divergence ``sum(I - d + d*log((d+eps)/(I+eps)))``
    -- nonnegative up to eps-level noise and zero iff I = d). The Poisson
    objective itself is strongly NEGATIVE near its optimum whenever
    counts exceed e, so convergence statistics must be measured as the
    excess over this value, not over zero (the solver's Poisson
    ``residual`` metric is ``sqrt(max(minf - this, 0) / sum(data))``).
    Near the optimum the excess is ``~ sum (I-d)^2 / (2d)``, i.e. ~2x
    the gaussian amplitude misfit ``sum (sqrt(I)-sqrt(d))^2 ~ sum
    (I-d)^2 / (4d)``, so residual targets are comparable across the two
    models (within sqrt(2))."""
    d = jnp.maximum(data, 0.0)
    return _psum(jnp.sum(d - d * jnp.log(d + eps)), axis_name)


def poisson_residual(farplane, data, eps: float = 1e-8):
    intensity = total_intensity(farplane)
    d = jnp.maximum(data, 0.0)
    factor = 1.0 - d / (intensity + eps)
    return farplane * factor[:, :, None, :, :].astype(farplane.dtype)


def get_model(model: str):
    """Return (minf, residual) functions for a likelihood model name."""
    if model == "gaussian":
        return gaussian_minf, gaussian_residual
    if model == "poisson":
        return poisson_minf, poisson_residual
    raise ValueError(f"unknown model {model!r}; expected one of {MODELS}")
