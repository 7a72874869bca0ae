"""Host <-> device array movement that is safe for complex dtypes.

Some TPU transports (including the tunnel this framework is developed
against) do not implement host<->device transfers of complex buffers --
and a single attempted complex transfer can wedge the transfer engine for
the rest of the process. Complex arrays are perfectly fine *on device*
(eager or jitted); only the host boundary is restricted.

These helpers move complex arrays across the boundary as (real, imag)
float pairs, and are no-ops in spirit (plain ``np.asarray`` /
``jnp.asarray``) for real dtypes. All host readbacks in benchmarks,
examples, and checkpointing go through them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _split(x):
    return jnp.real(x), jnp.imag(x)


@jax.jit
def _combine(re, im):
    return jax.lax.complex(re, im)


def to_host(x) -> np.ndarray:
    """Device array -> numpy array; complex moved as two float transfers.

    Already-host numpy arrays AND numpy scalars pass through untouched:
    ``jnp.asarray`` on a complex numpy array would be an eager complex
    UPLOAD, the exact transport hazard this module exists to avoid --
    and on TPU (no x64) a float64/int64 scalar would silently truncate
    to 32 bits on the device round-trip (this bit the split-driver
    checkpoint's target validation on hardware, round 4)."""
    if isinstance(x, np.ndarray):
        return x
    if isinstance(x, np.generic):
        return np.asarray(x)
    x = jnp.asarray(x)
    if jnp.iscomplexobj(x):
        re, im = _split(x)
        out = np.empty(x.shape, dtype=np.result_type(x.dtype))
        out.real = np.asarray(re)
        out.imag = np.asarray(im)
        return out
    return np.asarray(x)


def to_device(x, dtype=None) -> jax.Array:
    """Numpy (or any array) -> device array; complex uploaded as two float
    transfers recombined on device."""
    x = np.asarray(x)
    if dtype is not None:
        x = x.astype(dtype, copy=False)
    if np.iscomplexobj(x):
        re = jnp.asarray(np.ascontiguousarray(x.real))
        im = jnp.asarray(np.ascontiguousarray(x.imag))
        return _combine(re, im)
    return jnp.asarray(x)


def scalar(x) -> float:
    """Read back a real scalar from device."""
    return float(np.asarray(x))


@functools.partial(jax.jit, static_argnums=(0, 2))
def _full(shape, value_re_im, dtype):
    re, im = value_re_im
    return jnp.full(shape, re, np.empty(0, dtype).real.dtype).astype(
        dtype) + 1j * im


def cfull(shape, value, dtype=jnp.complex64) -> jax.Array:
    """Complex-filled device array built *inside* jit.

    Eager ``jnp.ones(shape, complex64)`` uploads a complex scalar constant
    host->device, which restricted TPU transports reject (and the failed
    attempt wedges the transfer engine). Building the constant inside a
    jitted program keeps it device-side. Use these for complex initial
    guesses on TPU.
    """
    value = complex(value)
    return _full(tuple(shape), (value.real, value.imag), jnp.dtype(dtype))


def cones(shape, dtype=jnp.complex64) -> jax.Array:
    return cfull(shape, 1.0, dtype)


def czeros(shape, dtype=jnp.complex64) -> jax.Array:
    return cfull(shape, 0.0, dtype)
