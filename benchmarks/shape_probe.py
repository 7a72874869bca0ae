"""Measure a NON-acceptance geometry on real hardware: compile time and
CG rate for shapes outside the 64/128 power-of-two class (VERDICT r2
next #6: the shape-support table in docs/design.md needs at least one
measured non-pow2 point; non-pow2 sides "can hit very slow Mosaic
compiles").

Usage: python benchmarks/shape_probe.py [nprb ndet piter]
Defaults: nprb=96 ndet=192 piter=100 on a 384^2 object / 2k positions.

Prints compile+first-run time and the steady iteration rate. Run under
an external `timeout`: a pathological Mosaic compile is exactly the
failure mode being probed.
"""

import sys
import time

import jax

from tikejax import Geometry
from tikejax.models import make_problem
from tikejax.solvers import run
from tikejax.utils import cones, device_sync as sync, \
    sync_overhead_seconds, to_host


def main():
    nprb = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    ndet = int(sys.argv[2]) if len(sys.argv) > 2 else 192
    piter = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    kernel = sys.argv[4] if len(sys.argv) > 4 else "fused_mp"
    g = Geometry(nz=384, n=384, nscan=2048, ndet=ndet, nprb=nprb)
    _, scan, prb, data = make_problem(jax.random.PRNGKey(0), g)
    sync(data)
    psi0 = cones(g.psi_shape)
    overhead = sync_overhead_seconds()

    t0 = time.time()
    psi, _, m = run(data, psi0, scan, prb, g, piter=piter,
                    model="gaussian", kernel=kernel)
    sync(psi)
    compile_s = time.time() - t0
    print(f"compile+first: {compile_s:.1f}s", flush=True)

    t0 = time.time()
    p1, _, m1 = run(data, psi0, scan, prb, g, piter=piter,
                    model="gaussian", kernel=kernel)
    p2, _, m2 = run(data, psi0, scan, prb, g, piter=piter,
                    model="gaussian", kernel=kernel)
    sync(p2)
    dt = max(time.time() - t0 - overhead, 1e-9)
    n = int(to_host(m1["iters_run"])) + int(to_host(m2["iters_run"]))
    import numpy as np
    res = np.asarray(to_host(m2["residual"]))
    k = max(int(to_host(m2["iters_run"])) - 1, 0)
    print(f"nprb={nprb} ndet={ndet} kernel={kernel}: "
          f"{n/dt:.1f} iters/s ({dt/n*1000:.2f} ms/iter, {n} iters), "
          f"residual {res[k]:.2e}, compile {compile_s:.0f}s", flush=True)


if __name__ == "__main__":
    main()
