"""Isolate the P=4/16/32 pathological Mosaic compile (VERDICT r3 weak #5).

Round-3 observation: TIKEJAX_FRAMES_PER_STEP values other than 8 sent
the merged-line-search solver's compile past 8 minutes on v5e (and a
wedged tunnel). This probe AOT-compiles each suspect compilation unit
SEPARATELY at a given P so the guilty structure can be identified, one
unit per process invocation (a pathological compile then burns only its
own subprocess, bounded by the caller's `timeout`):

    timeout 240 python benchmarks/mosaic_compile_probe.py <unit> <P>

units: fwd | adj | minf | grad | quad | solver_merged | solver_classic
P: frames per kernel step (sets TIKEJAX_FRAMES_PER_STEP + FORCE).

Prints one line: `<unit> P=<P> compile_s=<t>` (or dies on timeout).
All compiles are `jit(...).lower(shapes).compile()` -- no device data,
no execution, so probes are safe to run back-to-back on the tunnel.
"""

import os
import sys
import time

# Must be set before the first _positions_per_step call (trace time).
P = int(sys.argv[2]) if len(sys.argv) > 2 else 8
os.environ["TIKEJAX_FRAMES_PER_STEP"] = str(P)
os.environ["TIKEJAX_FRAMES_PER_STEP_FORCE"] = "1"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tikejax import Geometry  # noqa: E402
from tikejax.solvers import cg as _cg  # noqa: E402

# Headline config (where the pathology was observed).
G = Geometry(nz=512, n=512, nscan=16384, ndet=128, nprb=128)

C = jax.ShapeDtypeStruct
psi_s = C(G.psi_shape, jnp.complex64)
scan_s = C(G.scan_shape, jnp.float32)
scan_i_s = C(G.scan_shape, jnp.int32)
prb_s = C(G.prb_shape, jnp.complex64)
data_s = C(G.data_shape, jnp.float32)
farp_s = C(G.farplane_shape, jnp.complex64)


def compile_unit(unit: str):
    from tikejax.ops import pallas_fused as pf

    if unit == "fwd":
        fn = jax.jit(lambda p, s, pr: pf.fwd(p, s, pr, G.ndet))
        return fn.lower(psi_s, scan_i_s, prb_s)
    if unit == "adj":
        fn = jax.jit(lambda f, s, pr: pf.adj(f, s, pr, G.nz, G.n))
        return fn.lower(farp_s, scan_i_s, prb_s)
    if unit == "minf":
        fn = jax.jit(lambda p, d, s, pr: pf.minf_fused(
            p, d, s, pr, G.ndet, "gaussian"))
        return fn.lower(psi_s, data_s, scan_i_s, prb_s)
    if unit == "grad":
        fn = jax.jit(lambda p, d, s, pr: pf.grad_fused(
            p, d, s, pr, G.ndet, "gaussian"))
        return fn.lower(psi_s, data_s, scan_i_s, prb_s)
    if unit == "quad":
        fn = jax.jit(lambda dp, s, pr, f: pf.fwd_quad_stats(dp, s, pr, f))
        return fn.lower(psi_s, scan_i_s, prb_s, farp_s)
    if unit in ("solver_merged", "solver_classic"):
        opts = _cg.normalize_options(_cg.CGOptions(
            kernel="fused", piter=8,
            merged_linesearch="auto" if unit == "solver_merged" else "off"))
        fn = jax.jit(_cg.run_impl, static_argnums=(0, 1))
        return fn.lower(G, opts, data_s, psi_s, scan_s, prb_s, None, None)
    if unit in ("solver_while", "solver_while_mx", "solver_while_lbfgs"):
        # The while-loop form (target early-exit + stall stop) the real
        # bench/driver compiles, at the round-3-era and current tiers.
        kern = "fused_mx" if unit.endswith("mx") else "fused"
        opts = _cg.normalize_options(_cg.CGOptions(
            kernel=kern, piter=512, target_residual=1e-6,
            direction="lbfgs" if unit.endswith("lbfgs") else "dy",
            carry_state=unit.endswith("lbfgs"),
            carry_lbfgs=unit.endswith("lbfgs")))
        fn = jax.jit(_cg.run_impl, static_argnums=(0, 1))
        return fn.lower(G, opts, data_s, psi_s, scan_s, prb_s, None, None)
    raise SystemExit(f"unknown unit {unit!r}")


if __name__ == "__main__":
    unit = sys.argv[1]
    lowered = compile_unit(unit)
    t0 = time.perf_counter()
    lowered.compile()
    print(f"{unit} P={P} compile_s={time.perf_counter() - t0:.1f}",
          flush=True)
