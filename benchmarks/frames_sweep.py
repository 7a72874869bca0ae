"""Frames-per-step sweep on the headline mx solver via the API knob.

VERDICT r4 next #6: the round-4 sweep's endpoint was 32 (vs 8/16); 48
and 64 were never measured. CGOptions.kernel_frames (round 5) makes the
sweep a plain API call -- no env knob, no guard interaction.

Usage: python benchmarks/frames_sweep.py [frames ...]   (default 32 48 64)
Honest protocol: 2x400-iter chained dispatches between syncs, 3
windows, median.
"""

import sys
import time

import numpy as np

from tikejax import Geometry
from tikejax.models import make_problem
from tikejax.solvers import run
from tikejax.utils import cones, device_sync as sync, \
    sync_overhead_seconds, to_host


def main(frames_list):
    import jax

    g = Geometry(nz=512, n=512, nscan=16384, ndet=128, nprb=128)
    _, scan, prb, data = make_problem(jax.random.PRNGKey(0), g)
    sync(data)
    psi0 = cones(g.psi_shape)
    overhead = sync_overhead_seconds()
    print(f"# sync overhead {overhead*1000:.0f} ms", file=sys.stderr)
    for f in frames_list:
        opts = dict(piter=400, model="gaussian")
        if f is not None:
            opts["kernel_frames"] = f
        psi, _, m = run(data, psi0, scan, prb, g, **opts)
        sync(psi)
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
        print(f"frames={f}: {np.median(rates):.2f} iters/s (windows "
              f"{'/'.join(f'{r:.1f}' for r in sorted(rates))}), "
              f"res@{ran} {res:.3e}", flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]] or [32, 48, 64]
    main(args)
