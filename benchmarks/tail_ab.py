"""Deep-tail A/B on the real TPU: time-to-target for split-operator
reconstruct variants (VERDICT r2 next #4 -- attack the 1e-6 tail).

Each variant is timed over a FULL reconstruct from flat start (warm-up
run first so compile is excluded), reporting wall time, total
iterations, and stage count.

Usage: python benchmarks/tail_ab.py [target] [variant ...]
Variants: carry512 (default on), nocarry512 (round-2 baseline),
carry256, carry384, nocarry256.
"""

import sys
import time

import jax

from tikejax import Geometry
from tikejax.models import make_problem
from tikejax.solvers import reconstruct
from tikejax.utils import cones, device_sync as sync, \
    sync_overhead_seconds, to_host

VARIANTS = {
    # Shipped defaults (direction='auto' -> L-BFGS refinement since
    # round 3; the dy/carry/anderson variants pin direction='dy' so
    # they keep measuring the round-3 Dai-Yuan baselines they were
    # recorded as in BASELINE.md).
    "default256": dict(segment=256),
    "carry512": dict(segment=512, segment_carry=True, direction="dy"),
    "nocarry512": dict(segment=512, segment_carry=False, direction="dy"),
    "carry256": dict(segment=256, segment_carry=True, direction="dy"),
    "carry384": dict(segment=384, segment_carry=True, direction="dy"),
    "carry192": dict(segment=192, segment_carry=True, direction="dy"),
    "carry128": dict(segment=128, segment_carry=True, direction="dy"),
    "nocarry256": dict(segment=256, segment_carry=False, direction="dy"),
    # Anderson/AA-II depth-3 mixing over the segment sequence with a
    # device-side safeguarded selection (VERDICT r2 next #4)
    "anderson256": dict(segment=256, accelerate="anderson",
                        direction="dy"),
    "anderson128": dict(segment=128, accelerate="anderson",
                        direction="dy"),
    "anderson192": dict(segment=192, accelerate="anderson",
                        direction="dy"),
    "anderson256d2": dict(segment=256, accelerate="anderson:2",
                          direction="dy"),
    "anderson256d4": dict(segment=256, accelerate="anderson:4",
                          direction="dy"),
    "anderson256d5": dict(segment=256, accelerate="anderson:5",
                          direction="dy"),
    # L-BFGS refinement-segment direction (CGOptions.direction; the
    # early stage always stays Dai-Yuan -- see tiered.py basin note)
    "lbfgs256": dict(segment=256, direction="lbfgs"),
    "lbfgs256m5": dict(segment=256, direction="lbfgs:5"),
    "lbfgs256m12": dict(segment=256, direction="lbfgs:12"),
    "lbfgs512": dict(segment=512, direction="lbfgs"),
    "lbfgs128": dict(segment=128, direction="lbfgs"),
    "lbfgs256noaa": dict(segment=256, direction="lbfgs",
                         accelerate=None),
    # Full L-BFGS ring carry across split-segment re-bases (CGOptions.
    # carry_lbfgs): the default seeds only ONE cross-segment curvature
    # pair; this hands the whole (S, Y) ring forward instead.
    "ring256": dict(segment=256, carry_lbfgs=True),
    "ring128": dict(segment=128, carry_lbfgs=True),
    # Reverse-asymmetric refinement kernel: single-pass forward (same
    # objective/floor as 'fused') + bf16x3 gradient IDFT, probing
    # whether cleaner L-BFGS curvature pairs cut deep iterations.
    "amfast256": dict(segment=256, fast_kernel="fused_am"),
    # Track-style warm start for the L-BFGS natural step: after a
    # backtracked accept, start the next search at the accepted step
    # (ceiling 1) instead of 1 -- probes the ~0.5 extra evals/iter the
    # deep segments spend rejecting the natural step.
    "lbfgstrack256": dict(segment=256, step_policy="track"),
    # low-frequency-boosting SPD Fourier preconditioner variants
    # (CGOptions.precondition='illum_lowk'); b<boost>f<frac*100>
    "lowk256": dict(segment=256, precondition="illum_lowk",
                    direction="dy"),
    "lowk256b8": dict(segment=256, precondition="illum_lowk",
                      lowk_boost=8.0, direction="dy"),
    "lowk256b2": dict(segment=256, precondition="illum_lowk",
                      lowk_boost=2.0, direction="dy"),
    "lowk256f10": dict(segment=256, precondition="illum_lowk",
                       lowk_frac=0.10, direction="dy"),
    "lowk256f3": dict(segment=256, precondition="illum_lowk",
                      lowk_frac=0.03, direction="dy"),
}


def main():
    target = float(sys.argv[1]) if len(sys.argv) > 1 else 1e-6
    names = sys.argv[2:] or ["nocarry512", "carry512"]
    g = Geometry(nz=512, n=512, nscan=16384, ndet=128, nprb=128)
    _, scan, prb, data = make_problem(jax.random.PRNGKey(0), g)
    sync(data)
    psi0 = cones(g.psi_shape)
    overhead = sync_overhead_seconds()

    for name in names:
        kw = VARIANTS[name]
        # Warm-up (compile); then the timed official run.
        reconstruct(data, psi0, scan, prb, g, target_residual=target,
                    **kw)
        t0 = time.time()
        psi, _, stages = reconstruct(data, psi0, scan, prb, g,
                                     target_residual=target, **kw)
        sync(psi)
        dt = time.time() - t0 - overhead
        iters = sum(int(to_host(m["iters_run"])) for _, m in stages)
        import numpy as np
        last = stages[-1][1]
        k = max(int(to_host(last["iters_run"])) - 1, 0)
        res = float(np.asarray(to_host(last["residual"]))[k])
        print(f"{name:>11s}: {dt:6.1f}s  {iters:5d} iters  "
              f"{len(stages):2d} stages  residual {res:.2e}", flush=True)


if __name__ == "__main__":
    main()
