"""Tests for the native (C++) scan-preprocessing layer and its fallbacks."""

import numpy as np
import pytest

from tikejax.native import scanprep


def test_native_builds():
    """The image ships g++; the native library must actually build here."""
    assert scanprep.have_native()


@pytest.mark.parametrize("native", [True, False])
def test_validate(monkeypatch, native):
    if not native:
        monkeypatch.setattr(scanprep, "_load", lambda: None)
    scan = np.array([[[3.7, 2.2], [0.0, 63.9], [-0.5, 1.0], [190.0, 5.0]]],
                    np.float32)
    out, bad = scanprep.validate_scan(scan, 256, 256, 64)
    assert out.dtype == np.int32
    np.testing.assert_array_equal(out[0, 0], [3, 2])
    np.testing.assert_array_equal(out[0, 1], [0, 63])
    assert bad == 1  # the -0.5 row floors to -1


def test_scan_report_and_check():
    """The native layer's production consumers: ingestion validation and
    coverage diagnostics (tikejax.models.diagnostics)."""
    import jax

    from tikejax import Geometry
    from tikejax.models import check_scan, make_problem, scan_report

    g = Geometry(ntheta=2, nz=96, n=96, nscan=64, ndet=32, nprb=24)
    _, scan, _, _ = make_problem(jax.random.PRNGKey(0), g)
    scan = np.asarray(scan)
    rep = scan_report(scan, g)
    assert rep["n_out_of_bounds"] == 0
    assert rep["coverage_max"] >= rep["coverage_mean"] > 1.0  # overlap
    assert rep["uncovered_fraction"] < 0.2
    check_scan(scan, g)  # no raise
    bad = scan.copy()
    bad[0, 3] = [-2.0, 5.0]
    assert scan_report(bad, g)["n_out_of_bounds"] == 1
    with pytest.raises(ValueError, match="out of bounds"):
        check_scan(bad, g)


def test_compat_rejects_bad_scan():
    import jax

    from tikejax import Geometry
    from tikejax.compat import CGPtychoSolver
    from tikejax.models import make_problem

    g = Geometry(nz=96, n=96, nscan=16, ndet=32, nprb=24)
    psi, scan, prb, data = make_problem(jax.random.PRNGKey(1), g)
    solver = CGPtychoSolver(ntheta=1, nz=96, n=96, nscan=16, ndet=32,
                            nprb=24, kernel="xla")
    bad = np.asarray(scan).copy()
    bad[0, 0] = [95.0, 0.0]  # probe window leaves the object
    with pytest.raises(ValueError, match="out of bounds"):
        solver.fwd(np.asarray(psi), bad, np.asarray(prb))


def test_overlap_counts_matches_device_scatter():
    import jax.numpy as jnp

    from tikejax.ops import overlap_counts, scan_to_int

    rng = np.random.default_rng(1)
    nz = n = 96
    nprb = 24
    scan = rng.integers(0, nz - nprb + 1, size=(1, 40, 2)).astype(np.float32)
    dev = overlap_counts(scan_to_int(jnp.asarray(scan)), nz, n, nprb)
    host = scanprep.overlap_counts_host(scan.astype(np.int32), nz, n, nprb)
    np.testing.assert_allclose(np.asarray(dev)[0], host, atol=1e-6)
    with np.testing.assert_raises(AssertionError):
        np.testing.assert_array_equal(host, 0)  # nonzero coverage


def test_overlap_counts_fallback_matches():
    import unittest.mock as mock
    rng = np.random.default_rng(2)
    scan = rng.integers(0, 72, size=(30, 2)).astype(np.int32)
    a = scanprep.overlap_counts_host(scan, 96, 96, 24)
    with mock.patch.object(scanprep, "_load", lambda: None):
        b = scanprep.overlap_counts_host(scan, 96, 96, 24)
    np.testing.assert_allclose(a, b)
