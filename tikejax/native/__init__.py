"""Native (C++) host-runtime components, with pure-python fallbacks.

See scanprep.cpp for the rationale: the TPU compute path is JAX/Pallas,
but host-side scan conditioning (validation, locality sort, coverage
maps) is native, like the reference's C++ runtime layer. The library is
compiled on first import (g++, ~1s) and cached next to the source;
environments without a toolchain transparently fall back to numpy.
"""

from tikejax.native.scanprep import (have_native, morton_order,
                                     overlap_counts_host, validate_scan)

__all__ = ["validate_scan", "morton_order", "overlap_counts_host",
           "have_native"]
