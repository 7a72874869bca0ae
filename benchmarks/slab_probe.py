"""Large-object single-chip probe: row-slab streaming on the real TPU.

Round 4 found the fused kernels' VMEM object cap the hard way (the
1024^2 gradient mega-kernel asks for 22.6 MB and is rejected by Mosaic
-- BASELINE.md "LIMIT FOUND"). ops.slabs lifts it; this probe measures
the configs that previously could not compile at all:

  * 1024^2 object / 16k positions / 128^2 probe+det (auto -> 2 slabs)
  * 2048^2 object / 16k positions / 128^2 (auto -> 16 slabs)
  * optional: 1024^2 / 64k positions (pass 'big')

plus the 512^2 headline config FORCED through 2 slabs, to isolate the
slab-streaming overhead against the whole-object kernel on identical
work.

Usage: python benchmarks/slab_probe.py [cfg ...]
Configs: 1024, 2048, 512x2, big. Honest protocol per BASELINE.md: two
chained full dispatches between two readback syncs, 3 windows, median
(transport noise is bimodal).
"""

import sys
import time

import numpy as np

from tikejax import Geometry
from tikejax.models import make_problem
from tikejax.solvers import run
from tikejax.utils import cones, device_sync as sync, \
    sync_overhead_seconds, to_host

CFGS = {
    "1024": dict(g=dict(nz=1024, n=1024, nscan=16384, ndet=128,
                        nprb=128), opts={}),
    "2048": dict(g=dict(nz=2048, n=2048, nscan=16384, ndet=128,
                        nprb=128), opts={}),
    "512x2": dict(g=dict(nz=512, n=512, nscan=16384, ndet=128,
                         nprb=128), opts=dict(obj_slabs=2)),
    "1024x2": dict(g=dict(nz=1024, n=1024, nscan=16384, ndet=128,
                          nprb=128), opts=dict(obj_slabs=2)),
    # tall-narrow control: same height/positions as 1024 but headline
    # WIDTH -- discriminates object-width cost (gather stride) from
    # height/slab cost in the 1024's 40-vs-75 iters/s gap.
    "1024tall": dict(g=dict(nz=1024, n=512, nscan=16384, ndet=128,
                            nprb=128), opts=dict(obj_slabs=2)),
    # wide-short control: headline height, 1024 width, no slabs needed?
    # (nz=512 n=1024 whole-object: 4 planes of 520x1160 f32 = 9.7 MB --
    # fits; isolates pure width cost at D=1.)
    "512wide": dict(g=dict(nz=512, n=1024, nscan=16384, ndet=128,
                           nprb=128), opts={}),
    # 2-D quantile tiles (round-5 late): column windows drop the
    # gather's parent width back to headline scale.
    "512wide2c": dict(g=dict(nz=512, n=1024, nscan=16384, ndet=128,
                             nprb=128),
                      opts=dict(obj_slabs=1, obj_slab_cols=2)),
    "1024t22": dict(g=dict(nz=1024, n=1024, nscan=16384, ndet=128,
                           nprb=128),
                    opts=dict(obj_slabs=2, obj_slab_cols=2)),
    "2048t84": dict(g=dict(nz=2048, n=2048, nscan=16384, ndet=128,
                           nprb=128),
                    opts=dict(obj_slabs=8, obj_slab_cols=4)),
    "big": dict(g=dict(nz=1024, n=1024, nscan=65536, ndet=128,
                       nprb=128), opts={}),
}


def main(names):
    import jax

    overhead = sync_overhead_seconds()
    print(f"# sync overhead {overhead * 1000:.0f} ms", file=sys.stderr)
    piter = 400
    for name in names:
        cfg = CFGS[name]
        g = Geometry(**cfg["g"])
        _, scan, prb, data = make_problem(jax.random.PRNGKey(0), g)
        sync(data)
        psi0 = cones(g.psi_shape)
        opts = dict(piter=piter, model="gaussian", **cfg["opts"])
        t0 = time.time()
        psi, _, m = run(data, psi0, scan, prb, g, **opts)
        sync(psi)
        compile_s = time.time() - t0
        ran = max(int(to_host(m["iters_run"])), 1)
        res = np.asarray(to_host(m["residual"]))
        print(f"# {name}: compile+first {compile_s:.1f}s, {ran} iters, "
              f"res {res[ran - 1]:.3e}", file=sys.stderr)
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
            print(f"#   window {it} iters {dt:.2f}s "
                  f"({rates[-1]:.1f} it/s)", file=sys.stderr)
        ran = int(to_host(m2["iters_run"]))
        res = np.asarray(to_host(m2["residual"]))
        print(f"{name}: {np.median(rates):.2f} iters/s (windows "
              f"{'/'.join(f'{r:.1f}' for r in sorted(rates))}), "
              f"res@{ran} {res[ran - 1]:.3e}, "
              f"compile+first {compile_s:.1f}s")
        del data, psi, psi0, scan, prb, m, m1, m2


if __name__ == "__main__":
    main(sys.argv[1:] or ["1024", "512x2"])
