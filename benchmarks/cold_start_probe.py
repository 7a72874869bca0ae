"""Attribute the headline cold start (VERDICT r4 weak #4).

`BENCH_r03` recorded compile+first-run = 12.4 s at the headline config;
`BENCH_r04` recorded 104.0 s after the tier-dependent frames default
moved `fused_mx` from P=8 to P=32 (BASELINE.md row 24 attributes ~43 s
to a P=32 compile+first -- 104 is 2.4x that and was uninvestigated).
This probe splits the first `bench.py` result into its stages, each
timed separately, at a chosen P:

    timeout 600 python benchmarks/cold_start_probe.py [P]

stages (printed one line each):
  upload    -- make_problem + data sync (host->device + sim compiles)
  trace     -- jit trace+lower of the bench's exact solver program
  compile   -- AOT compile of the lowered program (remote Mosaic/XLA)
  execute   -- first dispatch of the compiled program + readback sync
               (400 iterations; steady-state is ~5.4 s at P=32)

The bench's own "compile+first run" ~= trace + compile + execute (its
jit cache misses once; the AOT compile here uses the same executable
path). Run serialized with other TPU work.
"""

import os
import sys
import time

if len(sys.argv) > 1:
    os.environ["TIKEJAX_FRAMES_PER_STEP"] = sys.argv[1]
    os.environ["TIKEJAX_FRAMES_PER_STEP_FORCE"] = "1"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tikejax import Geometry  # noqa: E402
from tikejax.models import make_problem  # noqa: E402
from tikejax.solvers import cg as _cg  # noqa: E402
from tikejax.utils import cones, device_sync as sync  # noqa: E402


def main():
    g = Geometry(nz=512, n=512, nscan=16384, ndet=128, nprb=128)

    t0 = time.perf_counter()
    _, scan, prb, data = make_problem(jax.random.PRNGKey(0), g)
    sync(data)
    print(f"upload_s={time.perf_counter() - t0:.1f}", flush=True)

    opts = _cg.normalize_options(_cg.CGOptions(piter=400,
                                               model="gaussian"))
    C = jax.ShapeDtypeStruct
    psi_s = C(g.psi_shape, jnp.complex64)
    scan_s = C(g.scan_shape, jnp.float32)
    prb_s = C(g.prb_shape, jnp.complex64)
    data_s = C(g.data_shape, jnp.float32)

    t0 = time.perf_counter()
    lowered = jax.jit(_cg.run_impl, static_argnums=(0, 1)).lower(
        g, opts, data_s, psi_s, scan_s, prb_s, None, None)
    print(f"trace_s={time.perf_counter() - t0:.1f}", flush=True)

    t0 = time.perf_counter()
    compiled = lowered.compile()
    print(f"compile_s={time.perf_counter() - t0:.1f}", flush=True)

    psi0 = cones(g.psi_shape)
    t0 = time.perf_counter()
    # The AOT-compiled callable takes the exact lowered signature,
    # including the (None, None) f_base/cg_init slots.
    psi, prb_out, metrics = compiled(data, psi0, scan, prb, None, None)
    sync(psi)
    print(f"execute_s={time.perf_counter() - t0:.1f} "
          f"(P={os.environ.get('TIKEJAX_FRAMES_PER_STEP', 'default')})",
          flush=True)


if __name__ == "__main__":
    main()
