"""Timing-only ablation of the patch-addressing cost on the real TPU.

Runs the headline CG config (512^2 / 16k / 128^2, gaussian, fused
frameless) under one TIKEJAX_NOROLL knob value and prints the rate.
The production kernel modules no longer read these WRONG-RESULTS
switches from the environment (VERDICT r2 weak #5); this benchmark is
the only place they exist, and it installs them as module globals BELOW,
before the first kernel trace. Knob meanings (ops/pallas_kernels.py):
  0 full addressing (correct)      1 no rolls (wrong results)
  2 static window (wrong)          3 skip sublane rolls only (wrong)
  4 skip lane rolls only (wrong)
TIKEJAX_V2ABL=1 additionally statics out the v2 probe-variant selects
and row phases (wrong results; ops/pallas_fused.py).
Usage: TIKEJAX_NOROLL=k python benchmarks/addr_ablate.py [piter]
"""

import os
import sys
import time

import jax

from tikejax.ops import pallas_fused as _pf
from tikejax.ops import pallas_kernels as _pk

# Install the timing-only (wrong-results) ablation switches before any
# kernel is traced; jitted callers cache the value they see at trace.
_pk._NOROLL = int(os.environ.get("TIKEJAX_NOROLL", "0"))
_pf._V2ABL = int(os.environ.get("TIKEJAX_V2ABL", "0"))

from tikejax import Geometry
from tikejax.models import make_problem
from tikejax.solvers import run
from tikejax.utils import cones, device_sync as sync, scalar, \
    sync_overhead_seconds


def main():
    piter = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    merged = os.environ.get("TIKEJAX_MERGED", "auto")  # 'auto' | 'off'
    g = Geometry(nz=512, n=512, nscan=16384, ndet=128, nprb=128)
    _, scan, prb, data = make_problem(jax.random.PRNGKey(0), g)
    sync(data)
    psi0 = cones(g.psi_shape)
    overhead = sync_overhead_seconds()

    t0 = time.time()
    psi, _, m = run(data, psi0, scan, prb, g, piter=piter,
                    model="gaussian", kernel="fused",
                    merged_linesearch=merged)
    sync(psi)
    compile_s = time.time() - t0
    # Steady state: two back-to-back dispatches (in-order device
    # stream) between two syncs so the ~0.4s readback overhead distorts
    # < 10% (each dispatch stays <= 512 iters per the transport limit).
    t0 = time.time()
    psi1, _, m = run(data, psi0, scan, prb, g, piter=piter,
                     model="gaussian", kernel="fused",
                    merged_linesearch=merged)
    # Second dispatch ALSO from psi0 (a run chained from the converged
    # psi1 stalls after ~2 iterations and voids the windowing).
    psi2, _, m2 = run(data, psi0, scan, prb, g, piter=piter,
                      model="gaussian", kernel="fused",
                      merged_linesearch=merged)
    sync(psi2)
    dt = max(time.time() - t0 - overhead, 1e-9)
    from tikejax.utils import to_host
    n = int(to_host(m["iters_run"])) + int(to_host(m2["iters_run"]))
    import numpy as np
    minf_l = float(np.asarray(to_host(m["minf"]))[
        max(int(to_host(m["iters_run"])) - 1, 0)])
    print(f"NOROLL={os.environ.get('TIKEJAX_NOROLL', '0'):>2s}  "
          f"{n/dt:6.1f} iters/s  ({dt/n*1000:.2f} ms/iter, {n} iters, "
          f"compile+1st {compile_s:.0f}s)  "
          f"minf_last={minf_l:.4e}", flush=True)


if __name__ == "__main__":
    main()
