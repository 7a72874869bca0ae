"""Cost bound for the 8-variant probe-table build (VERDICT r3 next #8).

The v2 addressing builds an 8-variant row-placed probe table
(`pallas_fused._probe_variants`) in the traced XLA prologue of every
fused kernel call. The hoist question: is rebuilding it per gradient
call (vs hoisting one build out of the CG loop) worth engineering? This
probe measures the standalone build cost at headline scale and turns it
into a per-iteration share bound: the merged search runs ~1.02
grad-kernel calls/iter at 13.2 ms/iter, so the possible saving is
~1.02 x build_cost / 13.2 ms (zero if XLA's loop-invariant code motion
already hoists it, which this bound cannot distinguish -- it is an
UPPER bound on the win).

Timing: N data-dependent builds chained inside ONE jitted
``lax.fori_loop`` dispatch between two readback syncs (the table is
sliced back to probe shape and fed forward so the chain cannot be
elided), per BASELINE.md protocol — host-queued per-build dispatches
measured only transport overhead.
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

from tikejax.utils import device_sync as sync, sync_overhead_seconds


def main():
    from tikejax.ops.pallas_fused import _probe_variants, _window_hw2

    nprb = 128
    wh = _window_hw2(nprb)[0]
    overhead = sync_overhead_seconds()
    print(f"# sync overhead {overhead * 1000:.0f} ms", file=sys.stderr)
    n = 20000
    for nmodes in (1, 4):
        key = jax.random.PRNGKey(0)
        br = jax.random.normal(key, (1, nmodes, nprb, nprb), jnp.float32)
        bi = br * 0.5

        def step(_, carry):
            br, bi = carry
            tr, ti = _probe_variants(br, bi, wh)
            # Feed a variant row-block back so successive builds chain.
            return (tr[:, 0, :, :nprb, :] * 0.999 + br * 0.001,
                    ti[:, 0, :, :nprb, :] * 0.999 + bi * 0.001)

        @jax.jit
        def chain(br, bi):
            return lax.fori_loop(0, n, step, (br, bi))

        out = chain(br, bi)  # compile
        sync(out[1])
        t0 = time.time()
        out = chain(br, bi)
        sync(out[1])
        dt = time.time() - t0 - overhead
        per = dt / n * 1e6
        share = 1.02 * (dt / n) / 13.2e-3 * 100
        print(f"nmodes={nmodes}: {per:.1f} us/build+slice, upper-bound "
              f"headline share {share:.2f}% of 13.2 ms/iter")


if __name__ == "__main__":
    main()
