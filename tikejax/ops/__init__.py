"""Operator layer: patch gather/scatter, batched FFT, diffraction fwd/adj."""

from tikejax.ops.diffraction import (Ptycho, adj_probe_raw, adj_raw, fwd,
                                     fwd_raw)
from tikejax.ops.fft import crop_from_det, fft2o, ifft2o, pad_to_det
from tikejax.ops.patches import (check_scan_in_bounds, gather_patches,
                                 overlap_counts, scan_to_int,
                                 scatter_patches_add)

__all__ = [
    "Ptycho", "fwd", "fwd_raw", "adj_raw", "adj_probe_raw",
    "fft2o", "ifft2o", "pad_to_det", "crop_from_det",
    "gather_patches", "scatter_patches_add", "scan_to_int",
    "check_scan_in_bounds", "overlap_counts",
]
