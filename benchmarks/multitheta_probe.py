"""First multi-theta fused-solver run on real TPU (round 5).

ntheta > 1 could never compile the fused objective kernels on real TPU
before the round-5 rank-branched minf-output fix (the SMEM scalar form
only lowers at leading-axis 1 -- found when the stacked slab path first
pushed t*D > 1 blocks through Mosaic). This probe records the first
hardware numbers: ntheta=4, 256^2 object, 4096 positions/angle, 64^2
frames, 200-iteration gaussian CG, honest protocol.
"""

import sys
import time

import numpy as np

from tikejax import Geometry
from tikejax.models import make_problem
from tikejax.solvers import run
from tikejax.utils import cones, device_sync as sync, \
    sync_overhead_seconds, to_host


def main():
    import jax

    g = Geometry(ntheta=4, nz=256, n=256, nscan=4096, ndet=64, nprb=64)
    _, scan, prb, data = make_problem(jax.random.PRNGKey(0), g)
    sync(data)
    psi0 = cones(g.psi_shape)
    overhead = sync_overhead_seconds()
    print(f"# sync overhead {overhead*1000:.0f} ms", file=sys.stderr)
    opts = dict(piter=200, model="gaussian")
    t0 = time.time()
    psi, _, m = run(data, psi0, scan, prb, g, **opts)
    sync(psi)
    print(f"# compile+first {time.time()-t0:.1f}s", file=sys.stderr)
    rates = []
    for _ in range(3):
        t0 = time.time()
        _, _, m1 = run(data, psi0, scan, prb, g, **opts)
        psi, _, m2 = run(data, psi0, scan, prb, g, **opts)
        sync(psi)
        dt = max(time.time() - t0 - overhead, 1e-9)
        it = (int(to_host(m1["iters_run"]))
              + int(to_host(m2["iters_run"])))
        rates.append(it / dt)
    ran = int(to_host(m2["iters_run"]))
    res = np.asarray(to_host(m2["residual"]))[max(ran - 1, 0)]
    print(f"ntheta=4 256^2/4k/64^2: {np.median(rates):.1f} iters/s "
          f"(windows {'/'.join(f'{r:.1f}' for r in sorted(rates))}), "
          f"res@{ran} {res:.3e}")


if __name__ == "__main__":
    main()
