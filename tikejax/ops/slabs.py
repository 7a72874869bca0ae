"""Object row-slab streaming for the fused mega-kernels (single chip).

The fused kernels keep the whole padded object plane pair -- and, in the
gradient mega-kernel, the gradient accumulator pair -- resident in VMEM
(ops.pallas_fused), which caps the object height: the round-4 memory
campaign measured the cap directly (a 1024^2 gradient kernel wants
22.6 MB against v5e's ~16 MB scoped VMEM and is rejected by Mosaic;
BASELINE.md round 4 "LIMIT FOUND"). The mesh answer is object-domain
tiling (parallel.run_tiled, SURVEY SS5 P3) -- but the bench reality is
one chip, and the reference itself reconstructs large fields of view on
one GPU ([R] SURVEY.md SS2: the object lives in global memory there, so
its size is HBM-bound, not SRAM-bound).

This module lifts the single-chip cap by time-multiplexing the object
over ROW SLABS, reusing the owner-partition scheme parallel.tiling uses
across mesh devices:

* host side (:func:`partition_slabs`), once per reconstruction: sort the
  positions by owner slab ``k = floor(y) // H`` (``H = nz / n_slabs``)
  and pad every (theta, slab) group to the global maximum count with
  sentinel positions (scan row -1, zero data frames) -- the documented
  operator-level mask every kernel zeroes exactly (ops.patches);
* in jit (:func:`grad_fused_slabs` & friends): ``lax.scan`` over slabs;
  each step slices the slab's rows plus the probe-window overlap
  (``H + nprb`` rows -- a frame owned by slab ``k`` touches rows
  ``< (k+1)H + nprb``), localises the scan rows, and runs the UNCHANGED
  fused kernel on the sub-object; gradient slabs overlap-add back into
  an object-sized accumulator (adjacent outputs overlap by ``nprb``
  rows).

FLOPs are identical to the whole-object kernels -- each frame is
processed exactly once, in its owner slab, by the same MXU-DFT pipeline
-- and the kernel is compiled ONCE (every slab call has the same static
shapes). The extra cost is object-sized slice/update pairs plus the
per-slab re-slice of the data frames, all tiny against the frame DFTs.
The remaining ceiling is the object WIDTH (the sub-object keeps full
rows): ``(H + nprb)``-row slabs fit v5e VMEM up to ``n`` ~ 2k-3k columns
at 128^2 probes; wider objects need the mesh tiling path, which also
splits columnwise traffic across chips.

The solver enables this via ``CGOptions.obj_slabs`` (``run()``
auto-selects the smallest fitting slab count when the object exceeds
the fused kernels' VMEM budget, and applies the host partition).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tikejax.ops import pallas_fused


def choose_slabs(nz: int, n: int, nprb: int, planes: int = 4) -> int:
    """Smallest slab count ``D`` (dividing ``nz``) whose ``nz/D + nprb``
    row sub-object fits the fused kernels' VMEM budget with ``planes``
    resident object-sized f32 planes. Returns 1 when the whole object
    already fits; raises when even the thinnest slab is too WIDE (the
    slab keeps full rows -- use parallel.run_tiled across a mesh)."""
    if pallas_fused.obj_planes_fit(nz, n, nprb, planes):
        return 1
    for d in range(2, nz // 8 + 1):
        if nz % d:
            continue
        if pallas_fused.obj_planes_fit(nz // d + nprb, n, nprb, planes):
            return d
    raise ValueError(
        f"object {nz}x{n} is too WIDE for row-slab streaming at probe "
        f"{nprb} (the thinnest slab still keeps {n} columns and "
        "overflows VMEM); shard the object over a mesh with "
        "tikejax.parallel.run_tiled instead")


def partition_slabs(scan, data, geometry, n_slabs: int, f_base=None):
    """Host-side owner partition of the positions for slab streaming.

    Sorts positions (and their data frames / frozen base farplane
    frames, gathered on device) into ``n_slabs`` contiguous groups along
    the scan axis by owner slab ``floor(y) // (nz / n_slabs)``, padding
    every (theta, slab) group to the global maximum count with sentinel
    positions (scan row -1, zero frames). The returned scan keeps GLOBAL
    coordinates -- the slab wrappers localise rows on the fly -- so
    everything outside the kernels (preconditioners, metrics) works
    unchanged on the partitioned problem.

    Returns ``(scan_p, data_p, f_base_p, s_per)`` with scan axis length
    ``n_slabs * s_per``. ``scan`` must be concrete (host-reachable).
    """
    from tikejax.utils import hostio

    g = geometry
    if g.nz % n_slabs:
        raise ValueError(f"obj_slabs={n_slabs} must divide nz={g.nz}")
    h = g.nz // n_slabs
    sc = np.asarray(hostio.to_host(scan))
    t, s = sc.shape[:2]
    y = np.floor(sc[..., 0]).astype(np.int64)
    owner = np.clip(y // h, 0, n_slabs - 1)
    s_per = max(int(np.bincount(owner[ti], minlength=n_slabs).max())
                for ti in range(t))
    order = np.full((t, n_slabs * s_per), -1, np.int64)
    for ti in range(t):
        for k in range(n_slabs):
            idx = np.nonzero(owner[ti] == k)[0]
            order[ti, k * s_per:k * s_per + len(idx)] = idx
    scan_p = np.zeros((t, n_slabs * s_per, 2), sc.dtype)
    scan_p[..., 0] = -1  # sentinel: masked position
    valid = order >= 0
    tt = np.arange(t)[:, None]
    scan_p[valid] = sc[tt.repeat(order.shape[1], 1)[valid],
                       order[valid]]

    idx_dev = jnp.asarray(np.maximum(order, 0))
    mask_dev = jnp.asarray(valid)

    @jax.jit
    def take(x):
        out = x[jnp.arange(t)[:, None], idx_dev]
        m = mask_dev.reshape(t, -1, *([1] * (x.ndim - 2)))
        return jnp.where(m, out, jnp.zeros((), x.dtype))

    data_p = take(data)
    f_base_p = (jax.tree.map(take, f_base)
                if f_base is not None else None)
    return scan_p, data_p, f_base_p, s_per


def _slab_unrolled(psi, scan_int, data, base, n_slabs, nprb, kernel_call):
    """Python-unrolled slab loop with STATIC slices: slab counts are
    small (<= ~16) and static slicing lets XLA fuse the per-slab data
    re-slices and overlap-adds instead of paying ``lax.scan``'s
    dynamic xs slicing (a full data-sized copy per pass -- measured
    slower, see grad_fused_slabs). Calls ``kernel_call(sub, datk, sck,
    basek)`` per slab and returns the list of results."""
    t, nz, n = psi.shape
    s = scan_int.shape[1]
    if s % n_slabs:
        raise ValueError(
            f"scan axis {s} is not partitioned into {n_slabs} slab "
            "groups -- build the problem with ops.slabs.partition_slabs")
    s_per = s // n_slabs
    h = nz // n_slabs
    ext = h + nprb
    psi_p = jnp.pad(psi, ((0, 0), (0, ext - h), (0, 0)))
    out = []
    for k in range(n_slabs):
        sl = slice(k * s_per, (k + 1) * s_per)
        sck = scan_int[:, sl]
        y = sck[..., 0]
        y_loc = jnp.where(y < 0, y, y - k * h)
        sck = jnp.stack([y_loc, sck[..., 1]], axis=-1)
        sub = psi_p[:, k * h:k * h + ext]
        basek = (jax.tree.map(lambda b: b[:, sl], base)
                 if base is not None else None)
        out.append(kernel_call(sub, data[:, sl], sck, basek))
    return out


def grad_fused_slabs(psi, data, scan_int, prb, ndet: int, model: str,
                     n_slabs: int, precision=None, base=None,
                     addressing=None, adj_precision=None):
    """Slab-streamed :func:`pallas_fused.grad_fused`: same (grad, minf)
    on objects whose gradient mega-kernel would overflow VMEM. Requires
    a slab-partitioned problem (see :func:`partition_slabs`).

    The slab loop is PYTHON-UNROLLED (static slices): the first cut was
    a ``lax.scan``, whose per-step xs slicing re-copied the slab's data
    frames every pass -- measured 42.2 vs 74.9 iters/s on the 512^2
    headline forced through 2 slabs (round 4); the unrolled form lets
    XLA alias the static data re-slices instead."""
    t, nz, n = psi.shape
    nprb = prb.shape[-1]
    h = nz // n_slabs
    ext = h + nprb

    def call(sub, datk, sck, basek):
        return pallas_fused.grad_fused(
            sub, datk, sck, prb, ndet, model, precision=precision,
            base=basek, addressing=addressing,
            adj_precision=adj_precision)

    outs = _slab_unrolled(psi, scan_int, data, base, n_slabs, nprb, call)
    acc = jnp.zeros((t, nz + nprb, n), psi.dtype)
    f = jnp.zeros((), jnp.float32)
    for k, (gslab, fk) in enumerate(outs):
        acc = acc.at[:, k * h:k * h + ext].add(gslab)
        f = f + fk
    return acc[:, :nz], f


def minf_fused_slabs(psi, data, scan_int, prb, ndet: int, model: str,
                     n_slabs: int, precision=None, base=None,
                     addressing=None):
    """Slab-streamed :func:`pallas_fused.minf_fused` (frameless
    line-search objective) for oversized objects."""
    def call(sub, datk, sck, basek):
        return pallas_fused.minf_fused(
            sub, datk, sck, prb, ndet, model, precision=precision,
            base=basek, addressing=addressing)

    outs = _slab_unrolled(psi, scan_int, data, base, n_slabs,
                          prb.shape[-1], call)
    return sum(outs[1:], outs[0])


def grad_prb_fused_slabs(psi, data, scan_int, prb, ndet: int, model: str,
                         n_slabs: int, precision=None,
                         addressing=None, adj_precision=None):
    """Slab-streamed :func:`pallas_fused.grad_prb_fused` (joint probe
    recovery): probe gradients accumulate across slabs (the probe is
    global; each frame contributes once, in its owner slab)."""
    def call(sub, datk, sck, basek):
        return pallas_fused.grad_prb_fused(
            sub, datk, sck, prb, ndet, model, precision=precision,
            addressing=addressing, adj_precision=adj_precision)

    outs = _slab_unrolled(psi, scan_int, data, None, n_slabs,
                          prb.shape[-1], call)
    g = sum((o[0] for o in outs[1:]), outs[0][0])
    f = sum((o[1] for o in outs[1:]), outs[0][1])
    return g, f
