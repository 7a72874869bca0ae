"""A/B harness for fused-kernel complex-matmul variants on the real TPU.

Measures, per kernel tier:
  - operator accuracy: max-rel error of fwd vs the XLA oracle (small cfg)
  - headline CG rate: 512^2 object / 16k positions / 128^2 frames

Usage: python benchmarks/kernel_ab.py [tier ...]   (default: all tiers)
Prints one line per tier; honest timing per BASELINE.md (chained run
between two readback syncs, sync overhead subtracted).
"""

import sys
import time

import jax
import jax.numpy as jnp

from tikejax import Geometry
from tikejax.models import make_problem
from tikejax.solvers import run
from tikejax.utils import cones, device_sync as sync, scalar, \
    sync_overhead_seconds

# Measured 2026-08-16 (v5e, this harness), schoolbook vs Karatsuba
# complex mm per tier -- the basis for the adopted mapping in
# ops.diffraction._fused_precision:
#   fast  (1 bf16 pass):  63.1 vs 63.6 iters/s, acc 2.5e-3 vs 4.1e-3
#   mp    (bf16x3):       30.2 vs 35.7 iters/s, acc 4.5e-6 vs 7.8e-6
#   hp    (full f32):     16.6 vs 21.0 iters/s, acc 3.75e-7 vs 3.79e-7
# (explicit one-shot bf16 operand conversion on the fast tier: 65.2,
# within the +-20% transport noise of 63.1 -> not adopted).
TIERS = ("fused", "fused_mp", "fused_hp", "fused_mx")


def op_accuracy(tier, g, psi, scan, prb):
    from tikejax.ops import fwd_raw

    @jax.jit
    def err(psi, scan, prb):
        a = fwd_raw(psi, scan, prb, g.ndet, kernel=tier)
        b = fwd_raw(psi, scan, prb, g.ndet, kernel="xla")
        return jnp.linalg.norm(a - b) / jnp.linalg.norm(b)

    return scalar(err(psi, scan, prb))


def main(tiers):
    gs = Geometry(nz=256, n=256, nscan=256, ndet=64, nprb=64)
    psi_s, scan_s, prb_s, _ = make_problem(jax.random.PRNGKey(1), gs)
    sync(scan_s)

    g = Geometry(nz=512, n=512, nscan=16384, ndet=128, nprb=128)
    _, scan, prb, data = make_problem(jax.random.PRNGKey(0), g)
    sync(data)
    psi0 = cones(g.psi_shape)
    overhead = sync_overhead_seconds()
    print(f"# sync overhead {overhead*1000:.0f} ms", file=sys.stderr)

    piter = 400
    for tier in tiers:
        acc = op_accuracy(tier, gs, psi_s, scan_s, prb_s)
        t0 = time.time()
        psi, _, m = run(data, psi0, scan, prb, g, piter=piter,
                        model="gaussian", kernel=tier)
        sync(psi)
        compile_s = time.time() - t0
        # Three steady windows: the transport's timing noise is BIMODAL
        # (occasional runs land ~10 s slow wholesale; BASELINE.md round
        # 3), so report every window and compare medians.
        import numpy as np
        from tikejax.utils import to_host
        rates = []
        for _ in range(3):
            t0 = time.time()
            psi, _, m = run(data, psi0, scan, prb, g, piter=piter,
                            model="gaussian", kernel=tier)
            sync(psi)
            dt = max(time.time() - t0 - overhead, 1e-9)
            ran = max(int(to_host(m["iters_run"])), 1)
            rates.append(ran / dt)
        minf_l = float(np.asarray(to_host(m["minf"]))[ran - 1])
        res_l = float(np.asarray(to_host(m["residual"]))[ran - 1])
        med = sorted(rates)[1]
        print(f"{tier:10s} acc={acc:.2e}  {med:6.1f} iters/s median "
              f"(windows {' '.join(f'{r:.1f}' for r in rates)}; "
              f"{ran} iters, compile+1st {compile_s:.0f}s)  minf_last="
              f"{minf_l:.4e} res_last={res_l:.2e}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or TIERS)
