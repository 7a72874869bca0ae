"""Tracing / profiling hooks.

The reference has no in-repo profiling (users run nvprof/nsys externally;
SURVEY.md SS5). Here: a context manager around ``jax.profiler`` producing
a Perfetto/TensorBoard-readable trace, and a tiny wall-clock timer for
steady-state measurements that forces device completion correctly.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp
import numpy as np


def device_sync(x) -> None:
    """Force completion of everything leading to ``x`` via a dependent
    host readback. On some TPU transports ``jax.block_until_ready``
    returns before execution finishes; a readback is the only reliable
    barrier. (Costs one RPC round-trip, ~0.4 s on tunneled transports.)
    """
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.jit(
        lambda v: jnp.abs(v).ravel()[0:1].astype(jnp.float32))(leaf))


def sync_overhead_seconds() -> float:
    """Measure the fixed cost of one :func:`device_sync` readback so
    benchmarks can subtract it."""
    tiny = jnp.ones((8, 128))
    device_sync(tiny)
    t0 = time.time()
    device_sync(tiny)
    return time.time() - t0


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard/Perfetto:

    >>> with trace("/tmp/tikejax-trace"):
    ...     run(...)  # traced
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timing of jitted calls with proper device sync.

    >>> timer = Timer()
    >>> with timer("cg"):
    ...     out = run(...)        # async dispatch
    ...     jax.block_until_ready(out)
    >>> timer.times["cg"]
    """

    def __init__(self):
        self.times: dict[str, float] = {}

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] = time.perf_counter() - t0


def summarize_metrics(metrics, every: int = 1) -> str:
    """Human-readable convergence table from the solver's metric arrays
    (the TPU-native replacement for the reference's in-loop prints)."""
    from tikejax.utils.hostio import to_host

    minf = to_host(metrics["minf"])
    gamma = to_host(metrics["gamma"])
    gnorm = to_host(metrics["grad_norm"])
    lines = ["iter       minf        gamma    |grad|"]
    for i in range(0, len(minf), every):
        lines.append(
            f"{i:4d}  {minf[i]: .6e}  {gamma[i]:6.3f}  {gnorm[i]:.3e}")
    return "\n".join(lines)
