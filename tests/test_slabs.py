"""Object row-slab streaming tests (ops.slabs / CGOptions.obj_slabs):
the slab-streamed mega-kernels and the slab-mode solver must match the
whole-object fused path -- the single-chip answer to the VMEM object
cap (BASELINE.md round 4 "LIMIT FOUND"; the mesh answer is P3 tiling,
tests/test_tiling.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tikejax import Geometry
from tikejax.models import make_problem
from tikejax.ops import pallas_fused, patches, slabs
from tikejax.solvers import run
from tikejax.solvers.cg import CGOptions


def problem(ntheta=1, nscan=40, key=0):
    g = Geometry(ntheta=ntheta, nz=64, n=64, nscan=nscan, ndet=16,
                 nprb=16)
    psi_true, scan, prb, data = make_problem(jax.random.PRNGKey(key), g)
    return (g, psi_true.astype(jnp.complex64), scan,
            prb.astype(jnp.complex64), data.astype(jnp.float32))


@pytest.mark.parametrize("ntheta", [1, 2])
def test_ops_equivalence(ntheta):
    """grad/minf/grad_prb slab wrappers match the whole-object kernels
    (jittered scans, unequal per-slab counts, with and without a frozen
    base farplane)."""
    g, psi, scan, prb, data = problem(ntheta=ntheta, nscan=37)
    sc_i = patches.scan_to_int(scan)
    base = pallas_fused.fwd(psi * 0.5, sc_i, prb, g.ndet, split_out=True)
    scan_p, data_p, base_p, s_per = slabs.partition_slabs(
        scan, data, g, 4, f_base=base)
    assert scan_p.shape[1] == 4 * s_per
    sc_pi = patches.scan_to_int(jnp.asarray(scan_p))

    g0, f0 = pallas_fused.grad_fused(psi, data, sc_i, prb, g.ndet,
                                     "gaussian", base=base)
    g1, f1 = slabs.grad_fused_slabs(psi, data_p, sc_pi, prb, g.ndet,
                                    "gaussian", 4, base=base_p)
    assert abs(float(f1) - float(f0)) <= 1e-6 * abs(float(f0))
    assert float(jnp.linalg.norm(g1 - g0)
                 / jnp.linalg.norm(g0)) < 1e-6

    m0 = pallas_fused.minf_fused(psi, data, sc_i, prb, g.ndet, "poisson")
    m1 = slabs.minf_fused_slabs(psi, data_p, sc_pi, prb, g.ndet,
                                "poisson", 4)
    assert abs(float(m1) - float(m0)) <= 1e-6 * abs(float(m0))

    p0, fp0 = pallas_fused.grad_prb_fused(psi, data, sc_i, prb, g.ndet,
                                          "gaussian")
    p1, fp1 = slabs.grad_prb_fused_slabs(psi, data_p, sc_pi, prb,
                                         g.ndet, "gaussian", 4)
    assert abs(float(fp1) - float(fp0)) <= 1e-6 * abs(float(fp0))
    assert float(jnp.linalg.norm(p1 - p0)
                 / jnp.linalg.norm(p0)) < 1e-6


def test_solver_slab_equivalence():
    """A slab-streamed CG run follows the whole-object trajectory."""
    g, _, scan, prb, data = problem()
    psi0 = jnp.ones(g.psi_shape, jnp.complex64)
    p0, _, m0 = run(data, psi0, scan, prb, g, piter=10,
                    model="gaussian", kernel="fused_mp")
    p1, _, m1 = run(data, psi0, scan, prb, g, piter=10,
                    model="gaussian", kernel="fused_mp", obj_slabs=4)
    r0 = np.asarray(m0["residual"])
    r1 = np.asarray(m1["residual"])
    np.testing.assert_allclose(r1, r0, rtol=2e-4)
    assert float(jnp.linalg.norm(p1 - p0)
                 / jnp.linalg.norm(p0)) < 1e-3


def test_solver_slab_joint_recovery():
    """Joint probe recovery composes with slab streaming."""
    g, _, scan, prb, data = problem()
    psi0 = jnp.ones(g.psi_shape, jnp.complex64)
    prb0 = prb * 0.9
    _, b0, m0 = run(data, psi0, scan, prb0, g, piter=6,
                    model="gaussian", kernel="fused_mp",
                    recover_prb=True)
    _, b1, m1 = run(data, psi0, scan, prb0, g, piter=6,
                    model="gaussian", kernel="fused_mp",
                    recover_prb=True, obj_slabs=4)
    np.testing.assert_allclose(np.asarray(m1["residual"]),
                               np.asarray(m0["residual"]), rtol=2e-4)
    assert float(jnp.linalg.norm(b1 - b0)
                 / jnp.linalg.norm(b0)) < 1e-3


def test_auto_slab_selection(monkeypatch):
    """run() auto-selects slab streaming when the object overflows the
    fused kernels' VMEM budget instead of raising the kernel guard."""
    g, _, scan, prb, data = problem()
    psi0 = jnp.ones(g.psi_shape, jnp.complex64)
    p0, _, m0 = run(data, psi0, scan, prb, g, piter=6,
                    model="gaussian", kernel="fused_mp")
    # Shrink the budget so the whole 64-row object no longer fits but a
    # 2-slab split does (4 planes: whole 350 KB, 2-slab 272 KB).
    monkeypatch.setattr(pallas_fused, "_VMEM_WORKSPACE", 0)
    monkeypatch.setattr(pallas_fused, "_VMEM_BYTES", 300_000)
    assert not pallas_fused.obj_planes_fit(g.nz, g.n, g.nprb, 4)
    assert slabs.choose_slabs(g.nz, g.n, g.nprb, 4) == 2
    p1, _, m1 = run(data, psi0, scan, prb, g, piter=6,
                    model="gaussian", kernel="fused_mp")
    np.testing.assert_allclose(np.asarray(m1["residual"]),
                               np.asarray(m0["residual"]), rtol=2e-4)
    assert float(jnp.linalg.norm(p1 - p0)
                 / jnp.linalg.norm(p0)) < 1e-3


def test_slab_option_validation():
    g, _, scan, prb, data = problem()
    psi0 = jnp.ones(g.psi_shape, jnp.complex64)
    with pytest.raises(ValueError, match="fused kernel"):
        run(data, psi0, scan, prb, g, piter=2, kernel="xla", obj_slabs=2)
    with pytest.raises(ValueError, match="divide"):
        run(data, psi0, scan, prb, g, piter=2, kernel="fused_mp",
            obj_slabs=3)
    with pytest.raises(ValueError, match="frameless"):
        run(data, psi0, scan, prb, g, piter=2, kernel="fused_mp",
            obj_slabs=2, memory="materialized")
    with pytest.raises(ValueError, match="run_tiled"):
        from tikejax.solvers.cg import _Engine
        _Engine(g, dataclasses.replace(
            CGOptions(kernel="fused_mp", obj_slabs=2),
            axis_name="scan"))
    with pytest.raises(ValueError, match="too WIDE"):
        # A budget below even the thinnest slab's requirement.
        slabs.choose_slabs(2048, 1 << 16, 128, 4)


def test_partition_rejects_bad_slab_count():
    g, _, scan, prb, data = problem()
    with pytest.raises(ValueError, match="divide"):
        slabs.partition_slabs(scan, data, g, 5)
    sc_i = patches.scan_to_int(scan)
    with pytest.raises(ValueError, match="partition"):
        slabs.minf_fused_slabs(jnp.ones(g.psi_shape, jnp.complex64),
                               data, sc_i, prb, g.ndet, "gaussian", 7)
