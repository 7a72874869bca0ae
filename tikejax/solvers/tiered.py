"""Tiered-precision reconstruction: time-to-deep-residual as a feature.

The fused MXU-DFT kernels come in three accuracy tiers (ops/diffraction):
'fused' (fastest, residual floor ~2e-3), 'fused_mp' (~3e-5 floor, ~half
rate), 'fused_hp' (fp32-floor, ~quarter rate). Chasing a deep residual
with a single tier wastes either accuracy (floor too high) or speed
(expensive iterations while still far from the floor). ``reconstruct``
chains the tiers: each runs with an early-exit ``target_residual`` just
above its floor and hands (psi, prb) to the next.

Crucially there are NO host round-trips between tiers: each tier is one
jitted program with an on-device stop condition, and the tiers chain as
async dispatches -- the host never reads back until the caller does.
This is the driver-metric machinery for "time-to-1e-6 residual"
(BASELINE.json:2); measured numbers live in BASELINE.md.
"""

from __future__ import annotations

import dataclasses

from tikejax.geometry import Geometry
from tikejax.ops import diffraction
from tikejax.solvers import cg as _cg

# (kernel, exit-residual floor, default max iterations) per tier. The
# exit floors sit above each tier's measured convergence floor so a tier
# never burns iterations grinding against its own operator noise.
DEFAULT_TIERS = (
    ("fused", diffraction.FUSED_RESIDUAL_FLOOR, 256),
    ("fused_mp", diffraction.FUSED_MP_RESIDUAL_FLOOR, 1024),
    ("fused_hp", 0.0, 8192),
)


def reconstruct(data, psi0, scan, prb0, geometry: Geometry,
                target_residual: float = 1e-6,
                tiers=DEFAULT_TIERS,
                options: _cg.CGOptions | None = None, **kw):
    """Reconstruct to a target relative residual via kernel-tier chaining.

    Args:
      target_residual: relative amplitude residual sqrt(minf / sum(data))
        to stop at. Tiers whose floor is already below the target are the
        last to run; shallower targets skip the expensive tiers entirely.
      tiers: sequence of (kernel, exit_floor, max_piter); a tier runs
        with target max(target_residual, exit_floor) and at most
        max_piter iterations, then hands off. Unreachable targets simply
        exhaust the last tier's budget.
      options / kw: base CGOptions (piter/kernel/target_residual are
        overridden per tier; everything else -- model, recover_prb,
        linesearch, nchunks, memory -- applies to every tier).
        Measured note: the 'parabolic' line search HURTS deep-tail
        convergence on the headline config (8.6e-5 vs 1.7e-5 at 512
        fused_hp iterations -- the vertex fit chases objective noise
        once f(gamma) flattens), so tiers keep the caller's linesearch
        (default backtracking).

    Returns:
      (psi, prb, stages) where stages is a list of (kernel, metrics) per
      executed tier; metrics['iters_run'] holds each tier's actual
      iteration count (device scalar). No host synchronisation happens
      inside this function.
    """
    if options is None:
        options = _cg.CGOptions(**kw)
    elif kw:
        options = dataclasses.replace(options, **kw)
    if target_residual <= 0:
        raise ValueError("target_residual must be > 0; for fixed-count "
                         "runs use tikejax.solvers.run")

    psi, prb = psi0, prb0
    stages = []
    for kernel, floor, max_piter in tiers:
        tier_target = max(target_residual, floor)
        # Cap single dispatches at 512 iterations: one longer device
        # program risks tripping the transport's execution deadline
        # (observed worker crash on a 2048-iteration dispatch); segments
        # chain asynchronously, and a segment dispatched after the target
        # was already reached exits after one iteration.
        remaining = max_piter
        while remaining > 0:
            seg = min(remaining, 512)
            tier_opts = dataclasses.replace(
                options, kernel=kernel, piter=seg,
                target_residual=tier_target)
            psi, prb, metrics = _cg.run(data, psi, scan, prb, geometry,
                                        tier_opts)
            stages.append((kernel, metrics))
            remaining -= seg
        if floor <= target_residual:
            break  # this tier could reach the target; we're done
    return psi, prb, stages
