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

    # The paths with the trickiest phase bookkeeping (true->pf conversion
    # of HBM farplanes before in-kernel mixing; ADVICE r2 #3): the
    # materialized gradient tail, the quadratic line-search statistics,
    # and the base=-carrying split-operator variants.
    ga, fa = pallas_fused.adj_residual(farp, data, scan_i, prb, g.nz,
                                       g.n, "gaussian", addressing="v1")
    gb, fb = pallas_fused.adj_residual(farp, data, scan_i, prb, g.nz,
                                       g.n, "gaussian", addressing="v2")
    scale = float(jnp.max(jnp.abs(ga))) + 1e-30
    assert float(jnp.max(jnp.abs(ga - gb))) < 2e-4 * scale, "adj_residual"
    assert abs(float(fa) - float(fb)) < 2e-4 * (abs(float(fa)) + 1e-30)

    fpsi = fwd_raw(psi2, scan, prb, g.ndet, kernel="xla")  # true-phase
    qa = pallas_fused.fwd_quad_stats(psi, scan_i, prb, fpsi,
                                     addressing="v1")
    qb = pallas_fused.fwd_quad_stats(psi, scan_i, prb, fpsi,
                                     addressing="v2")
    for xa, xb, name in zip(qa, qb, "abc"):
        scale = float(jnp.max(jnp.abs(xa))) + 1e-30
        assert float(jnp.max(jnp.abs(xa - xb))) < 2e-4 * scale, (
            f"fwd_quad_stats[{name}]")

    base = fpsi  # any true-phase complex farplane works as a base
    oa_ = pallas_fused.fwd(psi, scan_i, prb, g.ndet, base=base,
                           addressing="v1")
    ob_ = pallas_fused.fwd(psi, scan_i, prb, g.ndet, base=base,
                           addressing="v2")
    scale = float(jnp.max(jnp.abs(oa_))) + 1e-30
    assert float(jnp.max(jnp.abs(oa_ - ob_))) < 2e-4 * scale, "fwd base="
    for fn in (pallas_fused.grad_fused, pallas_fused.minf_fused):
        ra = fn(psi, data, scan_i, prb, g.ndet, "gaussian", base=base,
                addressing="v1")
        rb = fn(psi, data, scan_i, prb, g.ndet, "gaussian", base=base,
                addressing="v2")
        fa_, fb_ = (ra[-1], rb[-1]) if isinstance(ra, tuple) else (ra, rb)
        assert abs(float(fa_) - float(fb_)) < 2e-4 * (
            abs(float(fa_)) + 1e-30), f"{fn.__name__} base= minf"
        if isinstance(ra, tuple):
            scale = float(jnp.max(jnp.abs(ra[0]))) + 1e-30
            assert float(jnp.max(jnp.abs(ra[0] - rb[0]))) < 2e-4 * scale, (
                f"{fn.__name__} base= grad")


@pytest.mark.parametrize("kern", ["xla", "pallas", "fused"])
def test_sentinel_masked_positions(rng, kern):
    """Scan row < 0 marks a masked dummy position (tiling padding): fwd
    emits zero frames for it, and the adjoints ignore its (arbitrary)
    frames entirely -- on every kernel path."""
    g = GEOMS[0]
    psi, scan, prb, farp = make_inputs(rng, g)
    # Append one dummy position with an arbitrary NONZERO farplane frame.
    dummy = jnp.full((g.ntheta, 1, 2), jnp.float32(0.0)).at[..., 0].set(
        -1.0)
    scan_ext = jnp.concatenate([scan, dummy], axis=1)
    extra = rand_c64(jax.random.fold_in(rng, 7),
                     (g.ntheta, 1) + g.farplane_shape[2:])
    farp_ext = jnp.concatenate([farp, extra], axis=1)

    f_ref = fwd_raw(psi, scan, prb, g.ndet, kernel=kern)
    f_ext = fwd_raw(psi, scan_ext, prb, g.ndet, kernel=kern)
    np.testing.assert_array_equal(np.asarray(jnp.abs(f_ext[:, -1])), 0.0)
    np.testing.assert_allclose(np.asarray(jnp.abs(f_ext[:, :-1] - f_ref)),
                               0.0, atol=1e-6)

    a_ref = adj_raw(farp, scan, prb, g.nz, g.n, kernel=kern)
    a_ext = adj_raw(farp_ext, scan_ext, prb, g.nz, g.n, kernel=kern)
    tol = 1e-5 * float(jnp.max(jnp.abs(a_ref)))
    assert float(jnp.max(jnp.abs(a_ext - a_ref))) <= tol

    p_ref = adj_probe_raw(farp, scan, psi, g.nprb, kernel=kern)
    p_ext = adj_probe_raw(farp_ext, scan_ext, psi, g.nprb, kernel=kern)
    tol = 1e-5 * float(jnp.max(jnp.abs(p_ref)))
    assert float(jnp.max(jnp.abs(p_ext - p_ref))) <= tol


def test_frames_per_step_guard(monkeypatch):
    """Frames-per-step defaults are tier-dependent since the round-4
    re-sweep (single-pass 16, multi-pass Karatsuba 32); env overrides
    off the measured default warn and fall back unless forced."""
    from tikejax.ops import pallas_fused

    monkeypatch.delenv("TIKEJAX_FRAMES_PER_STEP", raising=False)
    # Measured tier defaults (the TPU path; interpret mode clamps to 8).
    assert pallas_fused._default_frames() == 16
    assert pallas_fused._default_frames("kara_x3") == 32
    assert pallas_fused._default_frames("kara_hp") == 16
    assert pallas_fused._default_frames("bf16") == 16
    # On the CPU-interpret test platform the default clamps to 8.
    assert pallas_fused._positions_per_step(1) == 8
    assert pallas_fused._positions_per_step(4) == 2

    monkeypatch.setenv("TIKEJAX_FRAMES_PER_STEP", "16")
    with pytest.warns(UserWarning, match="tier default"):
        assert pallas_fused._positions_per_step(1) == 8
    monkeypatch.setenv("TIKEJAX_FRAMES_PER_STEP_FORCE", "1")
    assert pallas_fused._positions_per_step(1) == 16
    # The env value matching the default is accepted silently.
    monkeypatch.delenv("TIKEJAX_FRAMES_PER_STEP_FORCE")
    monkeypatch.setenv("TIKEJAX_FRAMES_PER_STEP", "8")
    assert pallas_fused._positions_per_step(1, "kara_x3") == 8


def test_fused_mx_asymmetric_tier(rng):
    """'fused_mx' runs the forward/objective half at the fused_mp tier
    and only the gradient IDFT at the single-pass tier: the scalar
    objective must be BITWISE identical to fused_mp's (same forward
    code at the same precision), the gradient within the single-pass
    tier's relative tolerance of the symmetric one, and the solver must
    accept the tier (resolving linesearch='auto' to backtracking like
    the other deep-objective tiers)."""
    from tikejax.ops import pallas_fused
    from tikejax.ops.diffraction import (_fused_adj_precision,
                                         _fused_precision)
    from tikejax.solvers.cg import CGOptions, _Engine

    g = GEOMS[1]
    psi, scan, prb, _ = make_inputs(rng, g)
    data = jnp.abs(fwd_raw(psi, scan, prb, g.ndet, kernel="xla")) ** 2
    data = jnp.sum(data, axis=2)
    scan_i = scan_to_int(scan)

    assert _fused_precision("fused_mx") == _fused_precision("fused_mp")
    assert _fused_precision("fused_hx") == _fused_precision("fused_hp")
    # The adjoint tag must be TRUTHY ('bf16'): a None would fall through
    # the kernel wrappers' `adj_precision or precision` chain and
    # silently run the adjoint at the forward precision (the round-3
    # first-A/B bug: mx measured bit-identical to mp).
    assert _fused_adj_precision("fused_mx") == "bf16"
    assert _fused_adj_precision("fused_hx") == "bf16"
    # Reverse asymmetry: cheap forward, accurate gradient IDFT.
    assert _fused_precision("fused_am") is None
    assert _fused_adj_precision("fused_am") == "kara_x3"
    assert (_fused_adj_precision("fused_mp")
            == _fused_precision("fused_mp"))

    g_mx, f_mx = pallas_fused.grad_fused(
        psi * 0.9, data, scan_i, prb, g.ndet, "gaussian",
        precision=_fused_precision("fused_mx"),
        adj_precision=_fused_adj_precision("fused_mx"))
    g_mp, f_mp = pallas_fused.grad_fused(
        psi * 0.9, data, scan_i, prb, g.ndet, "gaussian",
        precision=_fused_precision("fused_mp"))
    assert float(f_mx) == float(f_mp)  # identical forward half
    scale = float(jnp.max(jnp.abs(g_mp)))
    # The 'bf16' adjoint tag converts operands explicitly, so the tilt
    # is real bf16 rounding (~1e-3) on EVERY backend, CPU interpreter
    # included -- bound it at the single-pass tier's scale.
    assert float(jnp.max(jnp.abs(g_mx - g_mp))) < 5e-3 * scale

    p_mx, fp_mx = pallas_fused.grad_prb_fused(
        psi, data, scan_i, prb, g.ndet, "gaussian",
        precision=_fused_precision("fused_mx"),
        adj_precision=_fused_adj_precision("fused_mx"))
    p_mp, fp_mp = pallas_fused.grad_prb_fused(
        psi, data, scan_i, prb, g.ndet, "gaussian",
        precision=_fused_precision("fused_mp"))
    assert float(fp_mx) == float(fp_mp)
    scale = float(jnp.max(jnp.abs(p_mp)))
    assert float(jnp.max(jnp.abs(p_mx - p_mp))) < 5e-3 * scale

    eng = _Engine(g, CGOptions(kernel="fused_mx"))
    assert eng.ls == "backtracking"
    assert eng.merged and eng.frameless

    from tikejax.solvers import run
    psi0 = jnp.ones(g.psi_shape, jnp.complex64)
    _, _, m = run(data, psi0, scan, prb, g, piter=24, model="gaussian",
                  kernel="fused_mx")
    res = np.asarray(m["residual"])
    assert res[-1] < res[0]


def test_operator_default_is_symmetric_adjoint_pair(rng):
    """Round-4 (VERDICT r3 item 1): OPERATOR-level 'auto' resolves to the
    SYMMETRIC fused_mp tier on TPU, so the default Ptycho/compat bundle
    is always an exact Hermitian fwd/adj pair at its advertised ~8e-6
    accuracy (SURVEY SS4 item 1 -- the reference's operators are always
    a pair). The SOLVER's target-aware resolution keeps the asymmetric
    fused_mx, where the ~0.25% gradient tilt is measured-safe."""
    from tikejax.ops.diffraction import (Ptycho, _fused_adj_precision,
                                         _fused_precision, resolve_kernel,
                                         resolve_kernel_for_target)

    k = resolve_kernel("auto", backend="tpu")
    assert k == "fused_mp"
    assert _fused_adj_precision(k) == _fused_precision(k)  # symmetric
    # Solver resolution: asymmetric default, target-aware escalation.
    assert resolve_kernel_for_target("auto", None, backend="tpu") == "fused_mx"
    assert resolve_kernel_for_target("auto", 1e-6, backend="tpu") == "fused_hp"
    assert resolve_kernel_for_target("auto", 1e-1, backend="tpu") == "fused"
    assert resolve_kernel("auto", backend="cpu") == "xla"
    # Explicit choices pass through both resolutions unchanged.
    assert resolve_kernel("fused_mx", backend="tpu") == "fused_mx"
    assert resolve_kernel_for_target("fused", 1e-8, backend="tpu") == "fused"

    # Adjoint dot-product identity of the default bundle at the tier the
    # TPU default resolves to, ON the fused path (interpret mode here;
    # measured on hardware by benchmarks/run_all.py config 1).
    g = GEOMS[1]
    op = Ptycho(g, kernel=k)
    psi, scan, prb, farp = make_inputs(rng, g)
    lhs = jnp.vdot(fwd_raw(psi, scan, prb, g.ndet, kernel=k), farp)
    rhs_o = jnp.vdot(psi, op.adj(farp, scan, prb))
    rhs_p = jnp.vdot(prb, op.adj_probe(farp, scan, psi))
    assert abs(lhs - rhs_o) / abs(lhs) < 1e-4
    assert abs(lhs - rhs_p) / abs(lhs) < 1e-4


def test_fused_vmem_object_guard():
    """Objects whose resident VMEM planes exceed the budget are rejected
    with an actionable error (round 4: a 1024^2-object gradient kernel
    asked Mosaic for 22.6 MB of the 16 MB scoped VMEM and died deep in
    the compiler; the guard fires at trace time instead)."""
    from tikejax.ops import pallas_fused

    g = Geometry(nz=1024, n=1024, nscan=8, ndet=128, nprb=128)
    psi = jax.ShapeDtypeStruct(g.psi_shape, jnp.complex64)
    data = jax.ShapeDtypeStruct(g.data_shape, jnp.float32)
    scan_i = jax.ShapeDtypeStruct(g.scan_shape, jnp.int32)
    prb = jax.ShapeDtypeStruct(g.prb_shape, jnp.complex64)
    with pytest.raises(ValueError, match="run_tiled"):
        jax.eval_shape(lambda p, d, s, pr: pallas_fused.grad_fused(
            p, d, s, pr, g.ndet, "gaussian"), psi, data, scan_i, prb)
    # The 2-plane forward at the same size still fits the guard.
    out = jax.eval_shape(lambda p, s, pr: pallas_fused.fwd(
        p, s, pr, g.ndet), psi, scan_i, prb)
    assert out.shape == g.farplane_shape
