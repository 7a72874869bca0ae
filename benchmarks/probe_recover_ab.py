"""Headline-scale joint probe recovery A/B on the real TPU.

512^2 object / 16k positions / 128^2 frames, probe perturbed by complex
gaussian noise at 3% of its max amplitude, target 1e-6,
``reconstruct(recover_prb=True)``: joint recovery -> freeze -> split
refinement with on-demand probe refreshes. Variants select the kernel
of the joint escalation / refresh chains (the asymmetric 'fused_hx'
vs the symmetric 'fused_hp' default — the A/B that REJECTED hx there,
BASELINE.md round 3).

Usage: python benchmarks/probe_recover_ab.py [variant ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tikejax import Geometry
from tikejax.models import make_problem
from tikejax.solvers import reconstruct
from tikejax.utils import cones, device_sync as sync, \
    sync_overhead_seconds, to_host

VARIANTS = {
    "jointhx": dict(joint_kernel="fused_hx"),   # measured & rejected
    "jointhp": dict(joint_kernel="fused_hp"),   # the (kept) default
}


@jax.jit
def _perturb(prb, key):
    # 3%-of-max complex gaussian perturbation, built ON DEVICE (complex
    # host->device transfers wedge this transport).
    kr, ki = jax.random.split(key)
    noise = (jax.random.normal(kr, prb.shape) +
             1j * jax.random.normal(ki, prb.shape)).astype(prb.dtype)
    return prb + 0.03 * jnp.max(jnp.abs(prb)) * noise


def main():
    names = sys.argv[1:] or ["jointhx", "jointhp"]
    g = Geometry(nz=512, n=512, nscan=16384, ndet=128, nprb=128)
    _, scan, prb, data = make_problem(jax.random.PRNGKey(0), g)
    prb_p = _perturb(prb, jax.random.PRNGKey(7))
    sync(data)
    psi0 = cones(g.psi_shape)
    overhead = sync_overhead_seconds()

    for name in names:
        kw = VARIANTS[name]
        reconstruct(data, psi0, scan, prb_p, g, target_residual=1e-6,
                    recover_prb=True, **kw)  # warm-up (compile)
        t0 = time.time()
        psi, prb_rec, stages = reconstruct(data, psi0, scan, prb_p, g,
                                           target_residual=1e-6,
                                           recover_prb=True, **kw)
        sync(psi)
        dt = time.time() - t0 - overhead
        iters = sum(int(to_host(m["iters_run"])) for _, m in stages)
        last = stages[-1][1]
        k = max(int(to_host(last["iters_run"])) - 1, 0)
        res = float(np.asarray(to_host(last["residual"]))[k])
        # Recovery QUALITY (distance to the true probe) and the distance
        # moved from the perturbed start -- the first is the statistic
        # that distinguishes variants.
        err_true = float(to_host(jax.jit(
            lambda a, b: jnp.max(jnp.abs(a - b)))(prb_rec, prb)))
        moved = float(to_host(jax.jit(
            lambda a, b: jnp.max(jnp.abs(a - b)))(prb_rec, prb_p)))
        print(f"{name:>8s}: {dt:6.1f}s  {iters:5d} iters  "
              f"{len(stages):2d} stages  residual {res:.2e}  "
              f"max|prb_rec-prb_true| {err_true:.4f}  "
              f"moved {moved:.3f}", flush=True)


if __name__ == "__main__":
    main()
