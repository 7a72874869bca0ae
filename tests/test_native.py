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


def test_morton_matches_fallback():
    rng = np.random.default_rng(0)
    scan = rng.integers(0, 400, size=(500, 2)).astype(np.int32)
    native = scanprep.morton_order(scan)
    import unittest.mock as mock
    with mock.patch.object(scanprep, "_load", lambda: None):
        fallback = scanprep.morton_order(scan)
    np.testing.assert_array_equal(native, fallback)
    # locality: consecutive positions should be nearby on average
    s = scan[native]
    d_sorted = np.abs(np.diff(s, axis=0)).sum(1).mean()
    d_orig = np.abs(np.diff(scan, axis=0)).sum(1).mean()
    assert d_sorted < d_orig


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
