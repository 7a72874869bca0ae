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


def choose_slabs(nz: int, n: int, nprb: int, planes: int = 4,
                 nmodes: int = 1, ndet: int | None = None,
                 precision=None, start: int = 1) -> int:
    """Smallest slab count ``D >= start`` (dividing ``nz``) whose
    ``nz/D + nprb`` row sub-object fits the fused kernels' VMEM budget
    with ``planes`` resident object-sized f32 planes plus the
    P-dependent frame workspace (pass ``nmodes``/``ndet``/``precision``
    -- the planes-only model undercounted a 2048^2/16-slab kernel by
    ~3.3 MB, round 4). Returns 1 when the whole object already fits;
    raises when even the thinnest slab is too WIDE (the slab keeps full
    rows -- use parallel.run_tiled across a mesh). ``start > 1``
    resumes the search after a count Mosaic rejected (the solver's
    compile-retry backstop)."""
    extra = (pallas_fused.frames_workspace_bytes(nmodes, ndet, nprb,
                                                 precision)
             if ndet is not None else 0)
    if start <= 1 and pallas_fused.obj_planes_fit(nz, n, nprb, planes,
                                                  extra_bytes=extra):
        return 1
    for d in range(max(2, start), nz // 8 + 1):
        if nz % d:
            continue
        if pallas_fused.obj_planes_fit(nz // d + nprb, n, nprb, planes,
                                       extra_bytes=extra):
            return d
    raise ValueError(
        f"object {nz}x{n} is too WIDE for row-slab streaming at probe "
        f"{nprb} (the thinnest slab still keeps {n} columns and "
        "overflows VMEM); shard the object over a mesh with "
        "tikejax.parallel.run_tiled instead")


def partition_slabs(scan, data, geometry, n_slabs: int, f_base=None,
                    align: int = 32):
    """Host-side owner partition of the positions for slab streaming.

    Sorts positions (and their data frames / frozen base farplane
    frames, gathered on device) into ``n_slabs`` contiguous groups along
    the scan axis by owner slab ``floor(y) // (nz / n_slabs)``, padding
    every (theta, slab) group to the global maximum count with sentinel
    positions (scan row -1, zero frames). The returned scan keeps GLOBAL
    coordinates -- the slab wrappers localise rows on the fly -- so
    everything outside the kernels (preconditioners, metrics) works
    unchanged on the partitioned problem.

    Each group is additionally padded up to a multiple of ``align``
    (default 32: every production frames-per-step P divides it), which
    lets the slab wrappers take the ZERO-COPY kernel path -- the
    mega-kernels window the FULL data/base arrays via a prefetch-scalar
    block offset (``pallas_fused._window_args``) instead of slicing a
    slab's frames into a fresh HBM copy every call.

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
    s_per = -(-s_per // align) * align
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


def _slab_unrolled(psi, scan_int, data, base, n_slabs, nprb, P,
                   kernel_call):
    """Python-unrolled slab loop: slab counts are small (<= ~16) and
    every slab call has identical static shapes, so the mega-kernel is
    compiled ONCE. When the partition's per-slab group size is a
    multiple of the kernel's frames-per-step ``P`` (partition_slabs
    aligns to 32, which every production P divides), the loop takes the
    ZERO-COPY path: the full data/base arrays ride into every call and
    the kernel windows its slab via a prefetch-scalar block offset
    (``scan_window=``), so nothing frame-sized is ever sliced into a
    fresh HBM copy -- the earlier slicing variants paid the full data
    array in r+w copy traffic per gradient call (lax.scan xs: 42.2
    iters/s; unrolled static slices: 42.1; zero-copy window: see
    BASELINE.md round 4) on the 512^2 headline forced through 2 slabs.
    Only the object sub-plane (a few MB) and the tiny scan coordinates
    are sliced per slab. Calls ``kernel_call(sub, datk, sck, basek,
    window)`` per slab and returns the list of results."""
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
    zero_copy = (s_per % P == 0)
    if zero_copy:
        # Localise the scan rows for ALL slabs in one vectorized pass
        # over the (tiny) coordinate array; sentinels (y < 0) stay put.
        y = scan_int[..., 0]
        k_of = (jnp.arange(s, dtype=y.dtype) // s_per) * h
        y_loc = jnp.where(y < 0, y, y - k_of[None, :])
        scan_loc = jnp.stack([y_loc, scan_int[..., 1]], axis=-1)
    out = []
    for k in range(n_slabs):
        sub = psi_p[:, k * h:k * h + ext]
        if zero_copy:
            out.append(kernel_call(sub, data, scan_loc, base,
                                   (k * s_per, s_per)))
            continue
        sl = slice(k * s_per, (k + 1) * s_per)
        sck = scan_int[:, sl]
        y = sck[..., 0]
        y_loc = jnp.where(y < 0, y, y - k * h)
        sck = jnp.stack([y_loc, sck[..., 1]], axis=-1)
        basek = (jax.tree.map(lambda b: b[:, sl], base)
                 if base is not None else None)
        out.append(kernel_call(sub, data[:, sl], sck, basek, None))
    return out


def grad_fused_slabs(psi, data, scan_int, prb, ndet: int, model: str,
                     n_slabs: int, precision=None, base=None,
                     addressing=None, adj_precision=None):
    """Slab-streamed :func:`pallas_fused.grad_fused`: same (grad, minf)
    on objects whose gradient mega-kernel would overflow VMEM. Requires
    a slab-partitioned problem (see :func:`partition_slabs`).

    The slab loop is PYTHON-UNROLLED and ZERO-COPY on aligned
    partitions (the default): data/base ride into every call whole and
    the kernel windows its slab via a prefetch-scalar block offset --
    see _slab_unrolled for the measured history of the slicing
    variants it replaces."""
    t, nz, n = psi.shape
    nmodes, nprb = prb.shape[-3], prb.shape[-1]
    h = nz // n_slabs
    ext = h + nprb
    P = pallas_fused._positions_per_step(nmodes, precision)

    def call(sub, datk, sck, basek, window):
        return pallas_fused.grad_fused(
            sub, datk, sck, prb, ndet, model, precision=precision,
            base=basek, addressing=addressing,
            adj_precision=adj_precision, scan_window=window)

    outs = _slab_unrolled(psi, scan_int, data, base, n_slabs, nprb, P,
                          call)
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
    P = pallas_fused._positions_per_step(prb.shape[-3], precision)

    def call(sub, datk, sck, basek, window):
        return pallas_fused.minf_fused(
            sub, datk, sck, prb, ndet, model, precision=precision,
            base=basek, addressing=addressing, scan_window=window)

    outs = _slab_unrolled(psi, scan_int, data, base, n_slabs,
                          prb.shape[-1], P, call)
    return sum(outs[1:], outs[0])


def grad_prb_fused_slabs(psi, data, scan_int, prb, ndet: int, model: str,
                         n_slabs: int, precision=None,
                         addressing=None, adj_precision=None):
    """Slab-streamed :func:`pallas_fused.grad_prb_fused` (joint probe
    recovery): probe gradients accumulate across slabs (the probe is
    global; each frame contributes once, in its owner slab)."""
    P = pallas_fused._positions_per_step(prb.shape[-3], precision)

    def call(sub, datk, sck, basek, window):
        return pallas_fused.grad_prb_fused(
            sub, datk, sck, prb, ndet, model, precision=precision,
            addressing=addressing, adj_precision=adj_precision,
            scan_window=window)

    outs = _slab_unrolled(psi, scan_int, data, None, n_slabs,
                          prb.shape[-1], P, call)
    g = sum((o[0] for o in outs[1:]), outs[0][0])
    f = sum((o[1] for o in outs[1:]), outs[0][1])
    return g, f
