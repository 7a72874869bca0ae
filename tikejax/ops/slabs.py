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
* in jit (:func:`grad_fused_slabs` & friends), STACKED single dispatch
  (the round-5 default, ``_stacked_args``): the slab axis folds into
  the kernels' leading (theta) grid axis -- block ``ti*D + k`` sees
  slab k's sub-object rows (``H + nprb`` rows: a frame owned by slab
  ``k`` touches rows ``< (k+1)H + nprb``), its localised scan group,
  and its reshaped data/base frames (zero-copy: the partition made the
  scan axis ``(D, s_per)``-contiguous). One kernel dispatch, identical
  per-step VMEM; gradient slabs overlap-add back into an object-sized
  accumulator (adjacent outputs overlap by ``nprb`` rows). The
  per-slab loop variants ('window'/'sliced', ``impl=``) remain for
  unaligned partitions and A/B probes.

FLOPs are identical to the whole-object kernels -- each frame is
processed exactly once, in its owner slab, by the same MXU-DFT
pipeline. The remaining ceiling is the object WIDTH (the sub-object
keeps full rows); for very wide objects the planner additionally
LOWERS the kernels' frames-per-step (:func:`plan_slabs` -- the
P-proportional VMEM frame workspace is the only width-independent term
it can shrink); wider still needs the mesh tiling path, which also
splits columnwise traffic across chips.

The solver enables this via ``CGOptions.obj_slabs`` (``run()``
auto-selects the smallest fitting (slabs, frames) plan when the object
exceeds the fused kernels' VMEM budget, and applies the host
partition); the deep driver hoists the partition to once per
reconstruction (``CGOptions.obj_slabs_partitioned``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tikejax.ops import pallas_fused


def choose_slabs(nz: int, n: int, nprb: int, planes: int = 4,
                 nmodes: int = 1, ndet: int | None = None,
                 precision=None, start: int = 1,
                 addressing: str | None = None,
                 joint: bool = False,
                 frames: int | None = None) -> int:
    """Smallest slab count ``D >= start`` (dividing ``nz``) whose
    ``nz/D + nprb`` row sub-object fits the fused kernels' VMEM budget
    with ``planes`` resident object-sized f32 planes plus the
    P-dependent frame workspace (pass ``nmodes``/``ndet``/``precision``
    -- the planes-only model undercounted a 2048^2/16-slab kernel by
    ~3.3 MB, round 4). Returns 1 when the whole object already fits;
    raises when even the thinnest slab is too WIDE (the slab keeps full
    rows -- use parallel.run_tiled across a mesh). ``start > 1``
    resumes the search after a count Mosaic rejected (the solver's
    compile-retry backstop). ``joint``/``addressing`` thread through to
    :func:`pallas_fused.frames_workspace_bytes` -- pass ``joint=True``
    for joint-probe (grad_prb) runs so the probe-gradient accumulators
    are counted (round-4 advisor finding)."""
    extra = (pallas_fused.frames_workspace_bytes(nmodes, ndet, nprb,
                                                 precision,
                                                 addressing=addressing,
                                                 joint=joint,
                                                 frames=frames)
             if ndet is not None else 0)
    if start <= 1 and pallas_fused.obj_planes_fit(nz, n, nprb, planes,
                                                  addressing=addressing,
                                                  extra_bytes=extra):
        return 1
    for d in range(max(2, start), nz // 8 + 1):
        if nz % d:
            continue
        if pallas_fused.obj_planes_fit(nz // d + nprb, n, nprb, planes,
                                       addressing=addressing,
                                       extra_bytes=extra):
            return d
    raise ValueError(
        f"object {nz}x{n} is too WIDE for row-slab streaming at probe "
        f"{nprb} (the thinnest slab still keeps {n} columns and "
        "overflows VMEM); shard the object over a mesh with "
        "tikejax.parallel.run_tiled instead")


def plan_slabs(nz: int, n: int, nprb: int, *, planes: int = 4,
               nmodes: int = 1, ndet: int | None = None,
               precision=None, addressing: str | None = None,
               joint: bool = False, frames: int | None = None,
               start: int = 1):
    """``(n_slabs, frames)`` fitting plan for a slab-streamed run.

    Tries ``frames`` (None = the measured tier default) first; when
    even the thinnest slab overflows at that P (:func:`choose_slabs`
    raises too-WIDE), halves frames down to 8 and retries -- the
    P-proportional frame workspace is the only width-independent VMEM
    term the planner can shrink, and the measured P sensitivity is
    small (mx 32 vs 8: +5.4%, BASELINE.md round-4 sweep) against not
    compiling at all. 2048^2 at 128^2 probes is the motivating case:
    every slab count was Mosaic-rejected at the tier-default P=32
    (round-5 slab probe)."""
    f = frames
    while True:
        try:
            return choose_slabs(nz, n, nprb, planes, nmodes, ndet,
                                precision, start=start,
                                addressing=addressing, joint=joint,
                                frames=f), f
        except ValueError:
            eff = (f if f is not None
                   else pallas_fused._default_frames(precision))
            if eff <= 8:
                raise
            f = max(8, eff // 2)
            start = 1


def partition_slabs(scan, data, geometry, n_slabs: int, f_base=None,
                    align: int = 32, n_cols: int = 1):
    """Host-side EQUAL-COUNT (quantile) partition of the positions for
    slab streaming.

    Sorts positions by y and splits them into ``n_slabs`` contiguous
    groups of (nearly) equal COUNT; group k's sub-object is the row
    window ``[row_starts[k], row_starts[k] + ext)`` covering its y-range
    plus the probe window. This replaced the round-4 owner-by-fixed-row
    partition, whose groups were structurally IMBALANCED: positions can
    only start in ``y in [0, nz - nprb)``, so fixed nz/D row strips
    starve the last slab(s) and every group pads to the largest --
    measured +33% sentinel-slot FLOPs at D=2 on the 512^2 headline
    (s_per 10880 vs the balanced 8224), which was the bulk of the
    "slab overhead" the round-5 mechanism hunt chased (BASELINE.md).
    Quantile groups also come out y-sorted within, which the same hunt
    measured as required at high D (+134% at 64 slabs).

    The returned scan keeps GLOBAL coordinates -- the slab wrappers
    localise rows against ``row_starts`` on the fly -- so everything
    outside the kernels (preconditioners, metrics) works unchanged on
    the partitioned problem. Each group is padded to a multiple of
    ``align`` (default 32: every production frames-per-step divides it)
    with sentinel positions (scan row -1, zero frames), enabling the
    stacked/zero-copy kernel paths.

    Returns ``(scan_p, data_p, f_base_p, s_per, slab_rows)`` with scan
    axis length ``n_slabs * s_per`` and ``slab_rows = (row_starts
    tuple, ext)`` -- pass it to the slab wrappers (and the solver does,
    via ``CGOptions.obj_slab_rows``); a wrapper called WITHOUT it
    assumes the legacy uniform ``k*(nz/D)`` rows, which does NOT match
    this partition. ``scan`` must be concrete (host-reachable).
    """
    from tikejax.utils import hostio

    g = geometry
    sc = np.asarray(hostio.to_host(scan))
    t, s = sc.shape[:2]
    ngrp = n_slabs * n_cols
    per_r = -(-s // n_slabs)        # ceil: per y-group before x split
    per = -(-per_r // n_cols)       # ceil: final group size
    s_per = -(-per // align) * align
    order = np.full((t, ngrp * s_per), -1, np.int64)
    ylo = np.zeros(ngrp, np.int64)
    yhi = np.zeros(ngrp, np.int64)
    xlo = np.zeros(ngrp, np.int64)
    xhi = np.zeros(ngrp, np.int64)
    for ti in range(t):
        srt = np.argsort(sc[ti, :, 0], kind="stable")
        for kr in range(n_slabs):
            ridx = srt[kr * per_r:(kr + 1) * per_r]
            # x-quantile split WITHIN the y-group (n_cols == 1 is the
            # plain row partition); each tile stays y-sorted within by
            # using a stable x-majority... keep y-sort inside each
            # x-chunk via stable argsort on x then re-sort chunks by y.
            if n_cols > 1 and len(ridx):
                xsrt = ridx[np.argsort(sc[ti, ridx, 1], kind="stable")]
            else:
                xsrt = ridx
            for kc in range(n_cols):
                k = kr * n_cols + kc
                idx = xsrt[kc * per:(kc + 1) * per]
                if n_cols > 1 and len(idx):
                    # restore y-order within the tile (the measured
                    # high-D ordering win).
                    idx = idx[np.argsort(sc[ti, idx, 0],
                                         kind="stable")]
                order[ti, k * s_per:k * s_per + len(idx)] = idx
                if len(idx):
                    ys = np.floor(sc[ti, idx, 0]).astype(np.int64)
                    xs = np.floor(sc[ti, idx, 1]).astype(np.int64)
                    ylo[k] = min(ylo[k], ys.min()) if ti else ys.min()
                    yhi[k] = max(yhi[k], ys.max()) if ti else ys.max()
                    xlo[k] = min(xlo[k], xs.min()) if ti else xs.min()
                    xhi[k] = max(xhi[k], xs.max()) if ti else xs.max()
                elif ti == 0:
                    ylo[k] = yhi[k] = max(0, g.nz - g.nprb)
                    xlo[k] = xhi[k] = 0
    row_starts = tuple(int(max(0, v)) for v in ylo)
    ext = int(max(yhi[k] + g.nprb - row_starts[k]
                  for k in range(ngrp)))
    # Round the window up to a sublane multiple (cheap; keeps the
    # padded sub-object heights friendly) and never past the padded
    # object the wrappers build.
    ext = -(-ext // 8) * 8
    if n_cols > 1:
        col_starts = tuple(int(max(0, v)) for v in xlo)
        ext_w = int(max(xhi[k] + g.nprb - col_starts[k]
                        for k in range(ngrp)))
        ext_w = -(-ext_w // 128) * 128  # lane-group multiple
        slab_rows = (row_starts, col_starts, ext, ext_w)
    else:
        slab_rows = (row_starts, ext)
    n_slabs = ngrp
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
    return scan_p, data_p, f_base_p, s_per, slab_rows


def _slab_geometry(nz, nprb, n_slabs, slab_rows, n=None):
    """Per-group windows for the wrappers:
    ``(row_starts, col_starts, ext_h, ext_w)``. Accepts the partition's
    2-tuple (rows only) or 4-tuple (2-D tiles) forms; None = the legacy
    uniform ``k*(nz/D)`` full-width rows (hand-built partitions).
    ``n`` (object width) is needed for the full-width forms."""
    if slab_rows is None:
        h = nz // n_slabs
        return (tuple(k * h for k in range(n_slabs)),
                (0,) * n_slabs, h + nprb, n)
    if len(slab_rows) == 2:
        starts, ext = slab_rows
        return (tuple(int(x) for x in starts), (0,) * len(starts),
                int(ext), n)
    sy, sx, eh, ew = slab_rows
    return (tuple(int(x) for x in sy), tuple(int(x) for x in sx),
            int(eh), int(ew))


def _stacked_args(psi, scan_int, data, base, prb, n_slabs,
                  slab_rows=None):
    """Single-dispatch STACKED-SLAB operands: fold the slab axis into
    the kernels' leading (theta) grid axis.

    The mega-kernels treat their leading axis as independent blocks --
    the object plane spec indexes it, the scan/data/base specs index it,
    and nothing couples adjacent blocks -- so a slab-partitioned
    problem can run as ONE kernel dispatch on grid
    ``(t * n_slabs, s_per // P)``: block ``ti*D + k`` sees slab k's
    sub-object (rows ``k*h .. k*h + h + nprb``), its localized scan
    group, and its (reshaped, zero-copy -- the partition made the scan
    axis ``(D, s_per)``-contiguous) data/base frames. Identical
    per-step VMEM and total grid work to the per-slab loop, but D-1
    kernel dispatches, their prologue DMAs, and the per-call XLA glue
    disappear. Measured round 5 (benchmarks/slab_overhead_probe.py,
    BASELINE.md): the per-call path cost ~6 ms/iter at the headline
    512^2 forced through 2 slabs; stacking reclaims it.

    Returns ``(psi_st, scan_st, data_st, base_st, prb_st, ext)``.
    """
    t, nz, n = psi.shape
    nprb = prb.shape[-1]
    s = scan_int.shape[1]
    s_per = s // n_slabs
    sy_st, sx_st, ext, ext_w = _slab_geometry(nz, nprb, n_slabs,
                                              slab_rows, n)
    need_h = max(st + ext for st in sy_st)
    need_w = max(st + ext_w for st in sx_st)
    psi_p = jnp.pad(psi, ((0, 0), (0, max(0, need_h - nz)),
                          (0, max(0, need_w - n))))
    psi_st = jnp.stack([psi_p[:, sy_st[k]:sy_st[k] + ext,
                              sx_st[k]:sx_st[k] + ext_w]
                        for k in range(n_slabs)],
                       axis=1).reshape(t * n_slabs, ext, ext_w)
    y = scan_int[..., 0]
    x = scan_int[..., 1]
    k_of = jnp.asarray(np.repeat(np.asarray(sy_st, np.int64), s_per),
                       dtype=y.dtype)
    y_loc = jnp.where(y < 0, y, y - k_of[None, :])
    kx_of = jnp.asarray(np.repeat(np.asarray(sx_st, np.int64), s_per),
                        dtype=x.dtype)
    # Sentinels are masked by y < 0 but their x still feeds the raw
    # gather addressing -- clamp it to 0 instead of localizing.
    x_loc = jnp.where(y < 0, 0, x - kx_of[None, :])
    scan_st = jnp.stack([y_loc, x_loc],
                        axis=-1).reshape(t * n_slabs, s_per, 2)

    def stk(b):
        # PRE-STACKED frame arrays pass through untouched: the
        # (t, D*s_per) -> (t*D, s_per) reshape of a gigabyte-class
        # constant operand measured as an UNHOISTED per-kernel-call
        # relayout copy (~3.4 ms/eval flat in D at the headline scale,
        # benchmarks/slab_overhead_probe.py round 5), so the solver
        # partitions data/base straight into the stacked layout and the
        # wrappers only reshape when handed the flat form.
        if b.shape[0] == t * n_slabs:
            return b
        return b.reshape((t * n_slabs, s_per) + b.shape[2:])

    data_st = stk(data)
    base_st = (jax.tree.map(stk, base) if base is not None else None)
    # Per-block probe: block ti*D + k uses theta ti's probe.
    prb_st = jnp.repeat(prb, n_slabs, axis=0)
    return psi_st, scan_st, data_st, base_st, prb_st, ext


def _overlap_add(g_st, t, n_slabs, nz, n, nprb, dtype,
                 slab_rows=None):
    """Reassemble the stacked per-slab gradients (t*D, ext, n) into the
    whole-object gradient by overlap-add at each slab's row start
    (windows may overlap arbitrarily under the quantile partition)."""
    sy_st, sx_st, ext, ext_w = _slab_geometry(nz, nprb, n_slabs,
                                              slab_rows, n)
    need_h = max(st + ext for st in sy_st)
    need_w = max(st + ext_w for st in sx_st)
    g = g_st.reshape(t, n_slabs, ext, ext_w)
    acc = jnp.zeros((t, max(need_h, nz), max(need_w, n)), dtype)
    for k in range(n_slabs):
        acc = acc.at[:, sy_st[k]:sy_st[k] + ext,
                     sx_st[k]:sx_st[k] + ext_w].add(g[:, k])
    return acc[:, :nz, :n]


def _slab_unrolled(psi, scan_int, data, base, n_slabs, nprb, P,
                   kernel_call, force_sliced=False, slab_rows=None):
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
    iters/s; unrolled static slices: 42.1; zero-copy window: 51.3 --
    BASELINE.md round-5 "Slab campaign measured" row) on the 512^2
    headline forced through 2 slabs (whole-object kernel: 74.4).
    Only the object sub-plane (a few MB) and the tiny scan coordinates
    are sliced per slab. Calls ``kernel_call(sub, datk, sck, basek,
    window)`` per slab and returns the list of results.
    ``force_sliced`` disables the window path (A/B ablation)."""
    t, nz, n = psi.shape
    s = scan_int.shape[1]
    if s % n_slabs:
        raise ValueError(
            f"scan axis {s} is not partitioned into {n_slabs} slab "
            "groups -- build the problem with ops.slabs.partition_slabs")
    s_per = s // n_slabs
    sy_st, sx_st, ext, ext_w = _slab_geometry(nz, nprb, n_slabs,
                                              slab_rows, n)
    need_h = max(st + ext for st in sy_st)
    need_w = max(st + ext_w for st in sx_st)
    psi_p = jnp.pad(psi, ((0, 0), (0, max(0, need_h - nz)),
                          (0, max(0, need_w - n))))
    zero_copy = (s_per % P == 0) and not force_sliced
    if zero_copy:
        # Localise the scan coords for ALL slabs in one vectorized pass
        # over the (tiny) coordinate array; sentinels (y < 0) stay put.
        y = scan_int[..., 0]
        x = scan_int[..., 1]
        k_of = jnp.asarray(np.repeat(np.asarray(sy_st, np.int64),
                                     s_per), dtype=y.dtype)
        kx_of = jnp.asarray(np.repeat(np.asarray(sx_st, np.int64),
                                      s_per), dtype=x.dtype)
        y_loc = jnp.where(y < 0, y, y - k_of[None, :])
        x_loc = jnp.where(y < 0, 0, x - kx_of[None, :])
        scan_loc = jnp.stack([y_loc, x_loc], axis=-1)
    out = []
    for k in range(n_slabs):
        sub = psi_p[:, sy_st[k]:sy_st[k] + ext,
                    sx_st[k]:sx_st[k] + ext_w]
        if zero_copy:
            out.append(kernel_call(sub, data, scan_loc, base,
                                   (k * s_per, s_per)))
            continue
        sl = slice(k * s_per, (k + 1) * s_per)
        sck = scan_int[:, sl]
        y = sck[..., 0]
        y_loc = jnp.where(y < 0, y, y - sy_st[k])
        x_loc = jnp.where(y < 0, 0, sck[..., 1] - sx_st[k])
        sck = jnp.stack([y_loc, x_loc], axis=-1)
        basek = (jax.tree.map(lambda b: b[:, sl], base)
                 if base is not None else None)
        out.append(kernel_call(sub, data[:, sl], sck, basek, None))
    return out


def _pick_impl(impl, scan_int, n_slabs, P):
    """Resolve the slab implementation: 'stacked' (one dispatch, slab
    axis folded into the leading grid axis -- the measured default) when
    the partition is P-aligned, else the per-slab loop ('window' /
    'sliced' select its flavour explicitly for A/B probes)."""
    if impl not in ("auto", "stacked", "window", "sliced"):
        raise ValueError(f"unknown slab impl {impl!r}")
    s = scan_int.shape[1]
    aligned = (s % n_slabs == 0) and ((s // n_slabs) % P == 0)
    if impl == "stacked" and not aligned:
        raise ValueError(
            "impl='stacked' needs a P-aligned slab partition "
            "(partition_slabs aligns to 32, which every production "
            f"frames-per-step divides; got scan axis {s} over "
            f"{n_slabs} slabs at P={P})")
    if impl == "auto":
        return "stacked" if aligned else "window"
    return impl


def grad_fused_slabs(psi, data, scan_int, prb, ndet: int, model: str,
                     n_slabs: int, precision=None, base=None,
                     addressing=None, adj_precision=None,
                     impl: str = "auto", frames: int | None = None,
                     slab_rows=None):
    """Slab-streamed :func:`pallas_fused.grad_fused`: same (grad, minf)
    on objects whose gradient mega-kernel would overflow VMEM. Requires
    a slab-partitioned problem (see :func:`partition_slabs`).

    Default path: STACKED single dispatch (``_stacked_args`` -- the
    slab axis rides the kernel's leading grid axis, so per-slab
    dispatch prologues and XLA glue vanish); per-slab loop retained for
    unaligned partitions and A/B (``impl='window'``/``'sliced'``, see
    _slab_unrolled for the measured history)."""
    t, nz, n = psi.shape
    nmodes, nprb = prb.shape[-3], prb.shape[-1]
    sy_st, sx_st, ext, ext_w = _slab_geometry(nz, nprb, n_slabs,
                                              slab_rows, n)
    P = pallas_fused._positions_per_step(nmodes, precision, frames)
    mode = _pick_impl(impl, scan_int, n_slabs, P)
    if mode == "stacked":
        psi_st, scan_st, data_st, base_st, prb_st, _ = _stacked_args(
            psi, scan_int, data, base, prb, n_slabs,
            slab_rows=slab_rows)
        g_st, f = pallas_fused.grad_fused(
            psi_st, data_st, scan_st, prb_st, ndet, model,
            precision=precision, base=base_st, addressing=addressing,
            adj_precision=adj_precision, frames=frames)
        return _overlap_add(g_st, t, n_slabs, nz, n, nprb,
                            psi.dtype, slab_rows=slab_rows), f

    def call(sub, datk, sck, basek, window):
        return pallas_fused.grad_fused(
            sub, datk, sck, prb, ndet, model, precision=precision,
            base=basek, addressing=addressing,
            adj_precision=adj_precision, scan_window=window,
            frames=frames)

    outs = _slab_unrolled(psi, scan_int, data, base, n_slabs, nprb, P,
                          call, force_sliced=(mode == "sliced"),
                          slab_rows=slab_rows)
    need_h = max(st + ext for st in sy_st)
    need_w = max(st + ext_w for st in sx_st)
    acc = jnp.zeros((t, max(need_h, nz), max(need_w, n)), psi.dtype)
    f = jnp.zeros((), jnp.float32)
    for k, (gslab, fk) in enumerate(outs):
        acc = acc.at[:, sy_st[k]:sy_st[k] + ext,
                     sx_st[k]:sx_st[k] + ext_w].add(gslab)
        f = f + fk
    return acc[:, :nz, :n], f


def minf_fused_slabs(psi, data, scan_int, prb, ndet: int, model: str,
                     n_slabs: int, precision=None, base=None,
                     addressing=None, impl: str = "auto",
                     frames: int | None = None, slab_rows=None):
    """Slab-streamed :func:`pallas_fused.minf_fused` (frameless
    line-search objective) for oversized objects; stacked single
    dispatch by default (see :func:`grad_fused_slabs`)."""
    P = pallas_fused._positions_per_step(prb.shape[-3], precision,
                                         frames)
    mode = _pick_impl(impl, scan_int, n_slabs, P)
    if mode == "stacked":
        psi_st, scan_st, data_st, base_st, prb_st, _ = _stacked_args(
            psi, scan_int, data, base, prb, n_slabs,
            slab_rows=slab_rows)
        return pallas_fused.minf_fused(
            psi_st, data_st, scan_st, prb_st, ndet, model,
            precision=precision, base=base_st, addressing=addressing,
            frames=frames)

    def call(sub, datk, sck, basek, window):
        return pallas_fused.minf_fused(
            sub, datk, sck, prb, ndet, model, precision=precision,
            base=basek, addressing=addressing, scan_window=window,
            frames=frames)

    outs = _slab_unrolled(psi, scan_int, data, base, n_slabs,
                          prb.shape[-1], P, call,
                          force_sliced=(mode == "sliced"),
                          slab_rows=slab_rows)
    return sum(outs[1:], outs[0])


def fwd_fused_slabs(psi, scan_int, prb, ndet: int, n_slabs: int,
                    precision=None, addressing=None,
                    split_out: bool = False, impl: str = "auto",
                    frames: int | None = None, slab_rows=None):
    """Slab-streamed :func:`pallas_fused.fwd` for oversized objects:
    the forward farplane of a slab-partitioned problem (the deep
    driver's base re-freeze at slab scale -- the whole-object fwd
    kernel holds 2 object planes in VMEM and overflows around side
    ~1400 at 128^2 probes). Each position's frame is computed in its
    owner slab, so the output frame order matches the partitioned scan
    axis; sentinel positions (scan row -1) emit zero frames (the
    kernel's `_pos_ok` mask). Stacked single dispatch by default (see
    :func:`grad_fused_slabs`); the per-slab loop remains for unaligned
    partitions. ``split_out`` returns the raw (re, im) f32 pair
    (memory-bound split-operator path)."""
    t, nz, n = psi.shape
    nprb = prb.shape[-1]
    s = scan_int.shape[1]
    if s % n_slabs:
        raise ValueError(
            f"scan axis {s} is not partitioned into {n_slabs} slab "
            "groups -- build the problem with ops.slabs.partition_slabs")
    s_per = s // n_slabs
    P = pallas_fused._positions_per_step(prb.shape[-3], precision,
                                         frames)
    mode = _pick_impl(impl, scan_int, n_slabs, P)
    if mode == "stacked":
        psi_st, scan_st, _, _, prb_st, _ = _stacked_args(
            psi, scan_int, scan_int[..., :1], None, prb, n_slabs,
            slab_rows=slab_rows)
        ore, oim = pallas_fused.fwd(psi_st, scan_st, prb_st, ndet,
                                    precision=precision,
                                    addressing=addressing,
                                    split_out=True, frames=frames)
        ore = ore.reshape((t, n_slabs * s_per) + ore.shape[2:])
        oim = oim.reshape((t, n_slabs * s_per) + oim.shape[2:])
        if split_out:
            return ore, oim
        return lax.complex(ore, oim)
    sy_st, sx_st, ext, ext_w = _slab_geometry(nz, nprb, n_slabs,
                                              slab_rows, n)
    need_h = max(st + ext for st in sy_st)
    need_w = max(st + ext_w for st in sx_st)
    psi_p = jnp.pad(psi, ((0, 0), (0, max(0, need_h - nz)),
                          (0, max(0, need_w - n))))
    outs_re, outs_im = [], []
    for k in range(n_slabs):
        sub = psi_p[:, sy_st[k]:sy_st[k] + ext,
                    sx_st[k]:sx_st[k] + ext_w]
        sck = scan_int[:, k * s_per:(k + 1) * s_per]
        y = sck[..., 0]
        y_loc = jnp.where(y < 0, y, y - sy_st[k])
        x_loc = jnp.where(y < 0, 0, sck[..., 1] - sx_st[k])
        sck = jnp.stack([y_loc, x_loc], axis=-1)
        ore, oim = pallas_fused.fwd(sub, sck, prb, ndet,
                                    precision=precision,
                                    addressing=addressing, split_out=True,
                                    frames=frames)
        outs_re.append(ore)
        outs_im.append(oim)
    ore = jnp.concatenate(outs_re, axis=1)
    oim = jnp.concatenate(outs_im, axis=1)
    if split_out:
        return ore, oim
    return lax.complex(ore, oim)


def grad_prb_fused_slabs(psi, data, scan_int, prb, ndet: int, model: str,
                         n_slabs: int, precision=None,
                         addressing=None, adj_precision=None,
                         impl: str = "auto", frames: int | None = None,
                         slab_rows=None):
    """Slab-streamed :func:`pallas_fused.grad_prb_fused` (joint probe
    recovery): probe gradients accumulate across slabs (the probe is
    global; each frame contributes once, in its owner slab). Stacked
    single dispatch by default (see :func:`grad_fused_slabs`); the
    per-slab probe gradients reduce over the folded slab axis."""
    t = psi.shape[0]
    P = pallas_fused._positions_per_step(prb.shape[-3], precision,
                                         frames)
    mode = _pick_impl(impl, scan_int, n_slabs, P)
    if mode == "stacked":
        psi_st, scan_st, data_st, _, prb_st, _ = _stacked_args(
            psi, scan_int, data, None, prb, n_slabs,
            slab_rows=slab_rows)
        g_st, f = pallas_fused.grad_prb_fused(
            psi_st, data_st, scan_st, prb_st, ndet, model,
            precision=precision, addressing=addressing,
            adj_precision=adj_precision, frames=frames)
        g = g_st.reshape((t, n_slabs) + g_st.shape[1:]).sum(axis=1)
        return g, f

    def call(sub, datk, sck, basek, window):
        return pallas_fused.grad_prb_fused(
            sub, datk, sck, prb, ndet, model, precision=precision,
            addressing=addressing, adj_precision=adj_precision,
            scan_window=window, frames=frames)

    outs = _slab_unrolled(psi, scan_int, data, None, n_slabs,
                          prb.shape[-1], P, call,
                          force_sliced=(mode == "sliced"),
                          slab_rows=slab_rows)
    g = sum((o[0] for o in outs[1:]), outs[0][0])
    f = sum((o[1] for o in outs[1:]), outs[0][1])
    return g, f
