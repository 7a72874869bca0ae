"""Line-search A/B on the default solver tier (VERDICT r3 next #8).

The 'auto' line search resolves to pure backtracking on the fused_mx
default (the deep-tier rule inherited from fused_mp, cg.py); mx's
headline runs ~1.02 evals/iter so the interp ceiling is small -- this
harness measures instead of assuming: full-trajectory rate AND the
residual trajectory (interp's slightly smaller accepted steps hurt deep
descent on the mp/hp tiers, round-2 measurement).

Usage: python benchmarks/ls_ab.py [variant ...]
Variants: backtracking (shipped auto), interp, parabolic.
Protocol: bench.py's honest protocol -- warm-up run, then 3 windows of
two chained 400-iteration dispatches between two readback syncs, median
rate; the flat-start residual at iteration 400 is reported for the
trajectory comparison (both dispatches start from psi0).
"""

import sys
import time

import numpy as np

from tikejax import Geometry
from tikejax.models import make_problem
from tikejax.solvers import run
from tikejax.utils import cones, device_sync as sync, \
    sync_overhead_seconds, to_host

VARIANTS = ("backtracking", "interp", "parabolic")


def main(variants):
    import jax

    g = Geometry(nz=512, n=512, nscan=16384, ndet=128, nprb=128)
    _, scan, prb, data = make_problem(jax.random.PRNGKey(0), g)
    sync(data)
    psi0 = cones(g.psi_shape)
    overhead = sync_overhead_seconds()
    print(f"# sync overhead {overhead * 1000:.0f} ms", file=sys.stderr)

    piter = 400
    for ls in variants:
        opts = dict(piter=piter, model="gaussian", linesearch=ls)
        t0 = time.time()
        psi, _, m = run(data, psi0, scan, prb, g, **opts)
        sync(psi)
        compile_s = time.time() - t0
        rates, res4 = [], None
        for _ in range(3):
            t0 = time.time()
            _, _, m1 = run(data, psi0, scan, prb, g, **opts)
            psi, _, m2 = run(data, psi0, scan, prb, g, **opts)
            sync(psi)
            dt = max(time.time() - t0 - overhead, 1e-9)
            it1 = int(to_host(m1["iters_run"]))
            it2 = int(to_host(m2["iters_run"]))
            rates.append((it1 + it2) / dt)
            r2 = np.asarray(to_host(m2["residual"]))
            res4 = float(r2[min(it2, piter) - 1])
            print(f"#   window {it1}+{it2} iters {dt:.2f}s "
                  f"({rates[-1]:.1f} it/s)", file=sys.stderr)
        med = float(np.median(rates))
        print(f"{ls}: {med:.2f} iters/s (windows "
              f"{'/'.join(f'{r:.1f}' for r in sorted(rates))}), "
              f"res@{piter} {res4:.3e}, compile+first {compile_s:.1f}s")


if __name__ == "__main__":
    main(sys.argv[1:] or list(VARIANTS))
