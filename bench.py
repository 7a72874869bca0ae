"""Headline benchmark: CG iterations/second on the 512^2-object /
16k-position configuration (BASELINE.json:2), single chip.

Prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "iters/s", "vs_baseline": N, ...}

vs_baseline compares against an engineering ESTIMATE of libtike-cufft on a
V100 for the same configuration (~40 CG iters/s); the upstream publishes no
numbers (BASELINE.json:13 "published": {}; BASELINE.md). Extra diagnostic
fields ride along in the same JSON object.
"""

import json
import sys
import time

import jax

from tikejax import Geometry
from tikejax.models import make_problem
from tikejax.solvers import run
from tikejax.utils import (cones, device_sync as sync, scalar,
                           sync_overhead_seconds)

# Estimated reference-on-V100 iteration rate for the headline config; see
# BASELINE.md for the derivation (FFT FLOPs + atomicAdd scatter bandwidth).
BASELINE_ITERS_PER_SEC_V100_EST = 40.0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")

    g = Geometry(nz=512, n=512, nscan=16384, ndet=128, nprb=128)
    psi_true, scan, prb, data = make_problem(jax.random.PRNGKey(0), g)
    sync(data)
    psi0 = cones(g.psi_shape)
    log("problem simulated")

    # Long enough that the ~0.4s readback-sync overhead distorts <2%.
    piter = 50
    opts = dict(piter=piter, model="gaussian")

    # Warm-up: compile + one full run.
    t0 = time.time()
    psi, _, metrics = run(data, psi0, scan, prb, g, **opts)
    sync(psi)
    log(f"compile+first run: {time.time() - t0:.1f}s; "
        f"minf {scalar(metrics['minf'][0]):.4e} -> "
        f"{scalar(metrics['minf'][-1]):.4e}")

    # Subtract the readback-sync RPC overhead from the steady-state timing
    # (~0.4s on tunneled transports, ~0 locally).
    sync_overhead = sync_overhead_seconds()
    log(f"sync overhead: {sync_overhead * 1000:.0f} ms")

    # Steady state.
    t0 = time.time()
    psi, _, metrics = run(data, psi0, scan, prb, g, **opts)
    sync(psi)
    dt = max(time.time() - t0 - sync_overhead, 1e-9)
    iters_per_sec = piter / dt

    minf0 = scalar(metrics["minf"][0])
    minf_last = scalar(metrics["minf"][-1])
    res_last = scalar(metrics["residual"][-1])
    result = {
        "metric": "cg_iters_per_sec_512obj_16kpos",
        "value": round(iters_per_sec, 3),
        "unit": "iters/s",
        "vs_baseline": round(iters_per_sec / BASELINE_ITERS_PER_SEC_V100_EST,
                             3),
        "config": "512^2 object, 16384 positions, 128^2 probe/det, "
                  "gaussian",
        "device": f"{dev.platform}:{dev.device_kind}",
        "seconds_for_50_iters": round(dt, 3),
        "minf_first_iter": minf0,
        "minf_last_iter": minf_last,
        "rel_residual_last_iter": res_last,
        "baseline_note": "V100 estimate, no published numbers "
                         "(BASELINE.md)",
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
