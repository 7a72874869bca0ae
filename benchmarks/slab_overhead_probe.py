"""Attribute the slab-streaming overhead (round 5).

The 512^2 headline FORCED through 2 slabs runs 51.3 iters/s vs 74.4
whole-object (slab_probe 512x2 A/B) -- ~6 ms/iter of overhead whose
mechanism matters: if it is per-pallas-call fixed cost (prologue DMAs
of the probe table / DFT factors, Mosaic pipeline warmup), a 3-D-grid
"megaslab" kernel (slab id as a middle grid axis, one dispatch) would
reclaim it; if it is the XLA glue (object pad/slice, accumulator
overlap-add), it would not.

Times ISOLATED kernel chains (N back-to-back data-dependent evals in
one jit between two syncs, honest protocol):
  minf   whole-object vs 2-slab vs 4-slab
  grad   whole-object vs 2-slab vs 4-slab

Usage: timeout 600 python benchmarks/slab_overhead_probe.py [N]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tikejax import Geometry
from tikejax.models import make_problem
from tikejax.ops import pallas_fused, patches, slabs
from tikejax.utils import cones, device_sync as sync, \
    sync_overhead_seconds, to_host

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100
PREC = "kara_x3"  # the headline mx forward tier


def main():
    g = Geometry(nz=512, n=512, nscan=16384, ndet=128, nprb=128)
    _, scan, prb, data = make_problem(jax.random.PRNGKey(0), g)
    sync(data)
    psi0 = cones(g.psi_shape)
    overhead = sync_overhead_seconds()
    print(f"# sync overhead {overhead*1000:.0f} ms", file=sys.stderr)

    cases = []
    sc_i = jax.jit(patches.scan_to_int)(scan)
    cases.append(("whole", sc_i, data, 1, "auto"))
    for d in (2, 4):
        scan_p, data_p, _, _ = slabs.partition_slabs(scan, data, g, d)
        sc_pi = jax.jit(patches.scan_to_int)(jnp.asarray(scan_p))
        cases.append((f"slab{d}", sc_pi, data_p, d, "stacked"))
        # PRE-STACKED: the (t*D, s_per, nd, nd) data reshape done ONCE
        # outside the loop -- isolates whether the flat ~3.4 ms/eval
        # stacked overhead is an unhoisted per-call relayout copy of
        # the constant data array.
        dstk = jax.jit(lambda x, d=d: x.reshape(
            (x.shape[0] * d, x.shape[1] // d) + x.shape[2:]))(data_p)
        cases.append((f"slab{d}pre", sc_pi, dstk, d, "stacked"))
        # WINDOW control: no reshape at all (prefetch-scalar offsets),
        # D separate dispatches -- separates relayout cost from
        # per-dispatch cost.
        cases.append((f"slab{d}win", sc_pi, data_p, d, "window"))

    for kind in ("minf", "grad"):
        for name, sc, dat, d, impl in cases:
            if kind == "minf":
                def one(p, prb_, dat_, sc_, d=d, impl=impl):
                    if d == 1:
                        m = pallas_fused.minf_fused(
                            p, dat_, sc_, prb_, g.ndet, "gaussian",
                            precision=PREC)
                    else:
                        m = slabs.minf_fused_slabs(
                            p, dat_, sc_, prb_, g.ndet, "gaussian", d,
                            precision=PREC, impl=impl)
                    # serialize: multiply by exactly 1 carrying m
                    return p * (1.0 + 0.0 * m)
            else:
                def one(p, prb_, dat_, sc_, d=d, impl=impl):
                    if d == 1:
                        gr, m = pallas_fused.grad_fused(
                            p, dat_, sc_, prb_, g.ndet, "gaussian",
                            precision=PREC, adj_precision=None)
                    else:
                        gr, m = slabs.grad_fused_slabs(
                            p, dat_, sc_, prb_, g.ndet, "gaussian", d,
                            precision=PREC, adj_precision=None,
                            impl=impl)
                    return p + 0.0 * gr

            @jax.jit
            def chain(p, prb_, dat_, sc_):
                def body(i, p):
                    return one(p, prb_, dat_, sc_)
                return jax.lax.fori_loop(0, N, body, p)

            out = chain(psi0, prb, dat, sc)   # compile + warm
            sync(out)
            t0 = time.time()
            out = chain(psi0, prb, dat, sc)
            out = chain(out, prb, dat, sc)
            sync(out)
            dt = max(time.time() - t0 - overhead, 1e-9)
            ms = dt / (2 * N) * 1000
            print(f"{kind} {name}: {ms:.2f} ms/eval "
                  f"({2*N} evals in {dt:.2f}s)", flush=True)


if __name__ == "__main__":
    main()
