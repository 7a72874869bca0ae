"""Parity tests: Pallas kernels vs the XLA reference path.

On CPU the kernels run in Pallas interpreter mode (same program, emulated);
on TPU they compile to Mosaic. The XLA path is the oracle (itself verified
against jax.vjp and adjoint identities in test_adjoints.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tikejax import Geometry
from tikejax.ops import adj_probe_raw, adj_raw, fwd_raw
from tikejax.ops.patches import scan_to_int


def rand_c64(key, shape):
    kr, ki = jax.random.split(key)
    return (jax.random.normal(kr, shape, jnp.float32) +
            1j * jax.random.normal(ki, shape, jnp.float32)).astype(
                jnp.complex64)


GEOMS = [
    Geometry(nz=64, n=72, nscan=13, ndet=24, nprb=16),          # odd sizes
    Geometry(nz=64, n=64, nscan=8, ndet=16, nprb=16, ntheta=2,
             nmodes=3),                                          # modes+theta
    # probe side NOT a multiple of 8: exercises the v2 window row
    # rounding (_window_hw2) and the matching accumulator rows.
    Geometry(nz=64, n=64, nscan=9, ndet=32, nprb=20),
]


def make_inputs(key, g):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    psi = rand_c64(k1, g.psi_shape)
    prb = rand_c64(k2, g.prb_shape)
    farp = rand_c64(k3, g.farplane_shape)
    scan = jnp.stack([
        jax.random.randint(k4, (g.ntheta, g.nscan), 0, g.nz - g.nprb + 1),
        jax.random.randint(jax.random.fold_in(k4, 1), (g.ntheta, g.nscan), 0,
                           g.n - g.nprb + 1),
    ], axis=-1).astype(jnp.float32)
    return psi, scan, prb, farp


FAST_KERNELS = ["pallas", "fused"]


@pytest.mark.parametrize("kern", FAST_KERNELS)
@pytest.mark.parametrize("g", GEOMS)
def test_fwd_parity(rng, g, kern):
    psi, scan, prb, _ = make_inputs(rng, g)
    a = fwd_raw(psi, scan, prb, g.ndet, kernel="xla")
    b = fwd_raw(psi, scan, prb, g.ndet, kernel=kern)
    scale = float(jnp.max(jnp.abs(a)))
    assert float(jnp.max(jnp.abs(a - b))) < 1e-4 * scale


@pytest.mark.parametrize("kern", FAST_KERNELS)
@pytest.mark.parametrize("g", GEOMS)
def test_adj_parity(rng, g, kern):
    psi, scan, prb, farp = make_inputs(rng, g)
    a = adj_raw(farp, scan, prb, g.nz, g.n, kernel="xla")
    b = adj_raw(farp, scan, prb, g.nz, g.n, kernel=kern)
    scale = float(jnp.max(jnp.abs(a)))
    assert float(jnp.max(jnp.abs(a - b))) < 1e-4 * scale


@pytest.mark.parametrize("kern", FAST_KERNELS)
@pytest.mark.parametrize("g", GEOMS)
def test_adj_probe_parity(rng, g, kern):
    psi, scan, prb, farp = make_inputs(rng, g)
    a = adj_probe_raw(farp, scan, psi, g.nprb, kernel="xla")
    b = adj_probe_raw(farp, scan, psi, g.nprb, kernel=kern)
    scale = float(jnp.max(jnp.abs(a)))
    assert float(jnp.max(jnp.abs(a - b))) < 1e-4 * scale


@pytest.mark.parametrize("kern", FAST_KERNELS)
def test_fast_kernel_adjoint_identity(rng, kern):
    """End-to-end adjointness holds on each fast path itself."""
    g = GEOMS[1]
    psi, scan, prb, farp = make_inputs(rng, g)
    lhs = jnp.vdot(fwd_raw(psi, scan, prb, g.ndet, kernel=kern), farp)
    rhs = jnp.vdot(psi, adj_raw(farp, scan, prb, g.nz, g.n, kernel=kern))
    assert abs(lhs - rhs) / abs(lhs) < 1e-4
    rhs_p = jnp.vdot(prb, adj_probe_raw(farp, scan, psi, g.nprb,
                                        kernel=kern))
    assert abs(lhs - rhs_p) / abs(lhs) < 1e-4


def test_pallas_deterministic(rng):
    g = GEOMS[1]
    psi, scan, prb, farp = make_inputs(rng, g)
    a = adj_raw(farp, scan, prb, g.nz, g.n, kernel="pallas")
    b = adj_raw(farp, scan, prb, g.nz, g.n, kernel="pallas")
    assert jnp.all(a == b)


def test_pallas_grad_through_custom_vjp(rng):
    """jax.grad through ops.fwd with kernel='pallas' runs and matches xla."""
    from tikejax.ops import fwd

    g = GEOMS[1]
    psi, scan, prb, farp = make_inputs(rng, g)

    def loss(kernel):
        def f(ps, pr):
            r = fwd(ps, scan, pr, g.ndet, kernel) - farp
            return 0.5 * jnp.sum(jnp.abs(r)**2)
        return f

    dx = jax.grad(loss("xla"), argnums=(0, 1))(psi, prb)
    dp = jax.grad(loss("pallas"), argnums=(0, 1))(psi, prb)
    for a, b in zip(dx, dp):
        scale = float(jnp.max(jnp.abs(a)))
        assert float(jnp.max(jnp.abs(a - b))) < 5e-5 * scale


@pytest.mark.parametrize("g", GEOMS)
def test_addressing_v1_v2_parity(rng, g):
    """Both addressing schemes of the fused kernels (v1: dual dynamic
    rotates; v2: row-extended static factor + phase column, the default)
    compute the same operators, including the frameless mega-kernels."""
    from tikejax.ops import pallas_fused
    from tikejax.models import likelihoods

    psi, scan, prb, farp = make_inputs(rng, g)
    scan_i = scan_to_int(scan)
    # Data from a DIFFERENT field so the likelihood gradient at psi is
    # O(1) (at the optimum both schemes give ~0 and the relative
    # comparison is meaningless).
    psi2 = rand_c64(jax.random.fold_in(rng, 99), g.psi_shape)
    data = likelihoods.total_intensity(
        fwd_raw(psi2, scan, prb, g.ndet, kernel="xla"))

    for fn, args in [
        (pallas_fused.fwd, (psi, scan_i, prb, g.ndet)),
        (pallas_fused.adj, (farp, scan_i, prb, g.nz, g.n)),
        (pallas_fused.adj_probe, (farp, scan_i, psi, g.nprb)),
    ]:
        a = fn(*args, addressing="v1")
        b = fn(*args, addressing="v2")
        scale = float(jnp.max(jnp.abs(a))) + 1e-30
        assert float(jnp.max(jnp.abs(a - b))) < 2e-4 * scale, fn.__name__

    for fn, args in [
        (pallas_fused.grad_fused,
         (psi, data, scan_i, prb, g.ndet, "gaussian")),
        (pallas_fused.grad_prb_fused,
         (psi, data, scan_i, prb, g.ndet, "gaussian")),
    ]:
        ga, fa = fn(*args, addressing="v1")
        gb, fb = fn(*args, addressing="v2")
        scale = float(jnp.max(jnp.abs(ga))) + 1e-30
        assert float(jnp.max(jnp.abs(ga - gb))) < 2e-4 * scale, fn.__name__
        assert abs(float(fa) - float(fb)) < 2e-4 * (abs(float(fa)) + 1e-30)

    ma = pallas_fused.minf_fused(psi, data, scan_i, prb, g.ndet,
                                 "gaussian", addressing="v1")
    mb = pallas_fused.minf_fused(psi, data, scan_i, prb, g.ndet,
                                 "gaussian", addressing="v2")
    assert abs(float(ma) - float(mb)) < 2e-4 * (abs(float(ma)) + 1e-30)
