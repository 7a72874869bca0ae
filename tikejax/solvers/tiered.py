"""Deep-residual reconstruction drivers: time-to-target as a feature.

Two mechanisms compose here (this is the machinery behind the driver
metric "time-to-1e-6 residual", BASELINE.json:2; numbers in BASELINE.md):

1. **Kernel-tier chaining** (:func:`reconstruct` with
   ``method='tiers'``): the fused MXU-DFT kernels come in three accuracy
   tiers (ops/diffraction) -- 'fused' (fastest, residual floor ~2e-3),
   'fused_mp' (~1e-5 floor, ~60% rate), 'fused_hp' (fp32-floor,
   ~30% rate). Each tier runs with an early-exit ``target_residual``
   just above its floor and hands (psi, prb) to the next.

2. **Split-operator refinement** (default, ``method='split'``): after
   the fast tier reaches its floor, freeze the object as a base, compute
   its farplane ONCE with the accurate tier, and run CG on the small
   correction ``delta`` with the FAST kernels (cg.run's ``f_base``).
   Operator error scales with ``||delta||``, so the fast tier sustains
   hp-level accuracy at ~3.6x the iteration rate; the base is re-frozen
   between segments. This is how mixed precision is supposed to work on
   the MXU: full precision only where the magnitude lives.

Tier boundaries are async dispatches (no host round-trip); split
segments read back one int32 (iters_run) to decide termination.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from tikejax.geometry import Geometry
from tikejax.models import likelihoods
from tikejax.ops import diffraction
from tikejax.solvers import cg as _cg
from tikejax.utils import checkpoint as _checkpoint
from tikejax.utils import hostio

# (kernel, exit-residual floor, default max iterations) per tier. The
# exit floors sit above each tier's measured convergence floor so a tier
# never burns iterations grinding against its own operator noise.
DEFAULT_TIERS = (
    ("fused", diffraction.FUSED_RESIDUAL_FLOOR, 256),
    # The asymmetric mx tier shares fused_mp's objective accuracy and
    # floor at 3/4 of the MXU work (round-3 A/B: identical trajectory,
    # 73.5 vs 55.3 iters/s on the headline config).
    ("fused_mx", diffraction.FUSED_MP_RESIDUAL_FLOOR, 1024),
    ("fused_hp", 0.0, 8192),
)


_fwd_jit = jax.jit(diffraction.fwd_raw, static_argnums=(3, 4))


def reconstruct(data, psi0, scan, prb0, geometry: Geometry,
                target_residual: float = 1e-6,
                tiers=DEFAULT_TIERS, method: str = "split",
                segment: int = 256, max_segments: int = 48,
                base_kernel: str | None = None,
                fast_kernel: str | None = None,
                joint_kernel: str | None = None,
                segment_carry: bool = True,
                floor_patience: int = 3,
                accelerate: str | None = "anderson",
                mesh=None,
                checkpoint_path: str | None = None,
                checkpoint_every: int = 4,
                options: _cg.CGOptions | None = None, **kw):
    """Reconstruct to a target relative residual.

    Args:
      target_residual: relative amplitude residual sqrt(minf / sum(data))
        to stop at.
      method: 'split' (default; fast tier to its floor, then
        split-operator refinement at fast-tier speed) or 'tiers'
        (escalate through the accuracy tiers).
      tiers: for method='tiers': sequence of (kernel, exit_floor,
        max_piter). Unreachable targets simply exhaust the last tier's
        budget.
      segment / max_segments: split-mode refinement segment length (CG
        iterations between base re-freezes) and budget.
      base_kernel / fast_kernel: split-mode kernels (defaults:
        fused_hp / fused on TPU, the XLA oracle elsewhere).
      joint_kernel: kernel for the joint escalation / probe-refresh
        chains under recover_prb (default: base_kernel). Swapping in
        the asymmetric 'fused_hx' was measured and REJECTED as the
        default: despite +48% per-iteration rate, the joint chain's
        tail is a slow-contraction regime where the gradient tilt
        costs iterations, and the slightly-worse frozen probe triggers
        extra refresh cycles — headline recover_prb A/B 120.2 s /
        1815 iters / 14 stages vs 109.6 s / 1469 / 9 with fused_hp
        (benchmarks/probe_recover_ab.py; BASELINE.md round 3). Kept as
        an explicit knob.
      segment_carry: continue the conjugate-gradient trajectory across
        split-segment re-bases (the terminal direction/gradient/step
        state seeds the next segment via cg.run's ``cg_init``) instead
        of restarting each segment from steepest descent. The re-base
        keeps psi_total unchanged, but it DOES shift the effective
        objective by the fast tier's operator error at the old delta,
        so the carry is only consistent when segments are short enough
        that ||delta|| stays small: measured on the headline config,
        carry at segment=256 wins (29.9 s vs 31.5 s to 1e-6) while
        carry at segment=512 is catastrophic (102 s -- BASELINE.md).
        The defaults pair carry with the short segment; segments that
        end early (stall/target) always restart fresh.
      accelerate: 'anderson' (default), 'anderson:<depth>' (history
        depth 2..8), or None — Anderson/AA-II mixing over the
        split-segment iterate sequence (default depth 3): after each
        segment, solve the constrained least-squares problem on the
        Gram matrix of the last segment corrections and form the mixed
        iterate; a device-side safeguard evaluates BOTH candidates'
        residuals with the base kernel and keeps the better one (no
        extra host readbacks — the choice is a jnp.where). A taken mix
        invalidates the carried CG state, which restarts fresh.
        Measured on the headline 1e-6 config: 1699 vs 1761 iterations
        (deterministic) and ~0.6 s faster within either transport
        timing mode; at the 3e-7 deep grind 107.6 s / 3683 iters /
        3.08e-7 vs 118.9 s / 3856 / 3.26e-7 (BASELINE.md round 3).
        Ignored by method='tiers' (no outer iterate sequence to mix).
      mesh: optional position-sharding mesh (tikejax.parallel.make_mesh):
        every stage -- tier runs, split segments (with CG carry and the
        frozen base farplane), the Anderson safeguard, and the joint
        probe chains -- executes sharded over the scan axis via
        tikejax.parallel.run_sharded, with the base farplane frozen by
        a sharded forward and kept sharded end-to-end. The scan axis is
        sentinel-padded once up front to a multiple of the mesh axis.
        2-D ('theta', 'scan') meshes compose too (round 4, VERDICT r3
        weak #3): psi/prb/the carried cg_state's object-domain entries
        stay sharded per-angle end-to-end (run_sharded routes the carry
        as a sharded output), and the host-side Anderson mixing /
        selection / psi updates are plain jits whose sharding follows
        the per-angle operands; ``ntheta`` must divide by the theta
        axis size. Object-tiled ('obj', ...) meshes remain
        run_tiled-only: the driver's host-side iterate algebra works on
        whole-object arrays, not overlapping slabs.
      checkpoint_path / checkpoint_every: split-mode outer-loop
        restartability (the driver runs 20-500 s host-controlled
        trajectories; a transport crash used to lose the run -- VERDICT
        r3 missing #4). With a path set, the driver atomically saves
        its complete outer state (psi, prb, segment budget, flat/refresh
        counters, residual history, Anderson history, carried cg_state,
        and the previous segment's termination scalars) via
        utils.checkpoint every ``checkpoint_every`` refinement segments,
        plus once right after the stage-1 chain. Re-calling reconstruct
        with the SAME arguments and the same path resumes from the last
        checkpoint and reproduces the remaining trajectory exactly
        (the save captures everything the host loop carries); stages
        from before the resume point are not re-reported. The file is
        removed on successful completion, so a crash-restart wrapper can
        simply re-run the same call. Geometry/segment/target mismatches
        against the checkpoint raise. Each save forces one device sync
        (it reads back the just-dispatched segment), so small
        ``checkpoint_every`` trades pipelining for durability.
        Split-mode only (method='tiers' stages are single dispatches;
        use utils.checkpoint directly there).
      floor_patience: stop after this many CONSECUTIVE refinement
        segments that each contracted the residual by less than 0.5%
        (the solver is pinned at the base kernel's operator floor or
        the data's noise floor; an unreachable target would otherwise
        burn the whole max_segments budget). The threshold is
        deliberately below the legitimate deep grind's ~3%/segment
        (BASELINE.md round-3 3e-7 A/B). 0 disables the floor stop.
      options / kw: base CGOptions (piter/kernel/target_residual are
        overridden per stage; everything else -- model, nchunks, memory,
        linesearch, direction -- applies where compatible). NOTE on
        ``direction``: the default 'auto' resolves to two-loop L-BFGS
        (m=8) for the refinement segments -- the measured TPU dominant
        (1e-6: 23.2 s / 1048 iters vs 29.0 s / 1699 with Dai-Yuan,
        3x-reproducible; BASELINE.md round 3) -- and any requested
        direction applies to the refinement segments only: the early
        (and joint) stages are always forced to Dai-Yuan, because an
        L-BFGS-warmed flat start measurably lands in bad local basins
        of the nonconvex objective (every later optimizer then stalls
        at 3.09e-4 on the CPU A/B where DY-warmed runs reach <1e-4;
        BASELINE.md round 3). Pass direction='dy' to keep Dai-Yuan
        refinement. Measured note: the
        'parabolic' line search HURTS deep-tail convergence (8.6e-5 vs
        1.7e-5 at 512 fused_hp iterations -- the vertex fit chases
        objective noise once f(gamma) flattens); keep the default.
        With recover_prb=True, split mode runs stage 1 as JOINT
        object+probe CG (escalating to the base tier for deep targets),
        then freezes the recovered probe for the split refinement. If
        the object-only refinement floor-stalls above the target --
        detected either by the flat counter or EARLY, by two
        consecutive Aitken extrapolations of the per-segment residuals
        both predicting a limit above 1.2x target (the approach to a
        frozen-probe floor is near-geometric, measured ratio ~0.45) --
        the probe is re-opened with a chain of joint base-tier
        dispatches and the refinement resumes (alternating
        minimization on demand, up to 4 refreshes); a refresh that
        itself makes no progress marks the genuine floor.

    Returns:
      (psi, prb, stages): stages is a list of (stage_name, metrics);
      metrics['iters_run'] holds each stage's actual iteration count.
      method='tiers' performs no host synchronisation; method='split'
      reads back one scalar per refinement segment.
    """
    if options is None:
        options = _cg.CGOptions(**kw)
    elif kw:
        options = dataclasses.replace(options, **kw)
    if target_residual <= 0:
        raise ValueError("target_residual must be > 0; for fixed-count "
                         "runs use tikejax.solvers.run")
    if method not in ("split", "tiers"):
        raise ValueError(f"unknown method {method!r}")
    if checkpoint_path is not None:
        if method != "split":
            raise ValueError("checkpoint_path applies to method='split' "
                             "only (tier stages are single dispatches)")
        if checkpoint_every < 1:
            raise ValueError("checkpoint_every must be >= 1")
    if accelerate is not None:
        if _parse_anderson_depth(accelerate) is None:
            raise ValueError(f"unknown accelerate {accelerate!r}; use "
                             "None, 'anderson', or 'anderson:<depth>'")
    if mesh is not None:
        from tikejax.parallel.sharding import (_axes, pad_scan_problem,
                                               shard_problem)
        theta_ax, scan_ax = _axes(mesh)  # validates 1-D/2-D
        if (theta_ax is not None
                and geometry.ntheta % mesh.shape[theta_ax] != 0):
            raise ValueError(
                f"ntheta ({geometry.ntheta}) must be divisible by the "
                f"theta mesh axis size ({mesh.shape[theta_ax]})")
        data, scan, geometry = pad_scan_problem(
            data, scan, geometry, mesh.shape[scan_ax])
        data, scan = shard_problem(mesh, data, scan)
    else:
        # Slab-scale objects (single device): decide the row-slab count
        # and apply the host owner-partition ONCE for the whole
        # reconstruction -- every per-stage cg.run then sees
        # obj_slabs_partitioned and skips its own partition (the
        # per-segment re-partition used to re-gather the full data
        # array on device each refinement segment; round-4 advisor).
        # The pre-partitioned stages skip cg.run's per-call VMEM
        # compile-retry, so the driver carries its own backstop: a
        # Mosaic scoped-memory rejection at ANY stage's first compile
        # re-plans (halve frames, then add slabs -- the measured 2048^2
        # ladder) and restarts from the original inputs; a success
        # seeds cg._SLAB_PLAN_MEMO so per-stage run() calls and later
        # processes in this session skip the failed compiles.
        from tikejax.ops import pallas_fused, slabs as _slabs

        orig = (data, scan, geometry, options)
        attempt = 0
        while True:
            data, scan, geometry, options = _maybe_slab_partition(
                *orig[:2], orig[2], prb0, orig[3], method, tiers,
                base_kernel, fast_kernel, joint_kernel)
            try:
                out = _reconstruct_method(
                    data, psi0, scan, prb0, geometry, target_residual,
                    tiers, method, segment, max_segments, base_kernel,
                    fast_kernel, joint_kernel, segment_carry,
                    floor_patience, accelerate, None, checkpoint_path,
                    checkpoint_every, options)
            except jax.errors.JaxRuntimeError as e:
                msg = str(e).lower()
                vmem_like = any(w in msg for w in ("vmem", "scoped",
                                                   "scratch"))
                if (not vmem_like or attempt >= 4
                        or options.obj_slabs <= 1):
                    raise
                attempt += 1
                kf = options.kernel_frames
                precs = {diffraction._fused_precision(
                    diffraction.resolve_kernel(k)) for k in
                    ([fast_kernel or "fused", base_kernel or "fused_hp"]
                     if method == "split"
                     else [k for k, _, _ in tiers])}
                eff = (kf if kf is not None else
                       max(pallas_fused._default_frames(p)
                           for p in precs))
                if eff > 8:
                    nslab, kf = options.obj_slabs, max(8, eff // 2)
                else:
                    nslab, kf = _slabs.plan_slabs(
                        orig[2].nz, orig[2].n, orig[2].nprb, planes=4,
                        nmodes=prb0.shape[-3], ndet=orig[2].ndet,
                        precision=next(iter(precs)),
                        joint=orig[3].recover_prb, frames=kf,
                        start=options.obj_slabs + 1)
                import warnings

                warnings.warn(
                    "reconstruct: fused kernel exceeded Mosaic's scoped "
                    f"VMEM at obj_slabs={options.obj_slabs}, frames="
                    f"{options.kernel_frames}; re-planning with "
                    f"obj_slabs={nslab}, frames={kf} and restarting",
                    stacklevel=2)
                orig = (orig[0], orig[1], orig[2], dataclasses.replace(
                    orig[3], obj_slabs=nslab, kernel_frames=kf))
                continue
            if options.obj_slabs > 1 or options.kernel_frames is not None:
                for pr in {diffraction._fused_precision(
                        diffraction.resolve_kernel(k)) for k in
                        ([fast_kernel or "fused",
                          base_kernel or "fused_hp"]
                         if method == "split"
                         else [k for k, _, _ in tiers])}:
                    _cg._SLAB_PLAN_MEMO[
                        (orig[2].nz, orig[2].n, orig[2].nprb,
                         orig[2].ndet, prb0.shape[-3], pr,
                         orig[3].recover_prb)] = (
                        options.obj_slabs, options.kernel_frames)
            return out
    return _reconstruct_method(data, psi0, scan, prb0, geometry,
                               target_residual, tiers, method, segment,
                               max_segments, base_kernel, fast_kernel,
                               joint_kernel, segment_carry,
                               floor_patience, accelerate, mesh,
                               checkpoint_path, checkpoint_every,
                               options)


def _reconstruct_method(data, psi0, scan, prb0, geometry,
                        target_residual, tiers, method, segment,
                        max_segments, base_kernel, fast_kernel,
                        joint_kernel, segment_carry, floor_patience,
                        accelerate, mesh, checkpoint_path,
                        checkpoint_every, options):
    """Dispatch to the split or tier-chaining method (the body of
    :func:`reconstruct` after problem preparation -- factored out so
    the single-device slab backstop can re-plan and restart it)."""
    run_fn = _make_run_fn(mesh)
    if method == "split":
        return _reconstruct_split(data, psi0, scan, prb0, geometry,
                                  target_residual, segment, max_segments,
                                  base_kernel, fast_kernel, options, tiers,
                                  segment_carry, floor_patience, accelerate,
                                  joint_kernel, mesh, checkpoint_path,
                                  checkpoint_every)

    psi, prb = psi0, prb0
    stages = []
    for tier_i, (kernel, floor, max_piter) in enumerate(tiers):
        tier_target = max(target_residual, floor)
        # Cap single dispatches at 512 iterations: one longer device
        # program risks tripping the transport's execution deadline
        # (observed worker crash on a 2048-iteration dispatch); segments
        # chain asynchronously, and a segment dispatched after the target
        # was already reached exits after one iteration.
        remaining = max_piter
        while remaining > 0:
            seg = min(remaining, 512)
            tier_opts = dataclasses.replace(
                options, kernel=kernel, piter=seg,
                target_residual=tier_target,
                # First tier from the flat start stays Dai-Yuan (see
                # the basin note in _reconstruct_split).
                direction="dy" if tier_i == 0 else options.direction)
            psi, prb, metrics = run_fn(data, psi, scan, prb, geometry,
                                       tier_opts)
            stages.append((kernel, metrics))
            remaining -= seg
        if floor <= target_residual:
            break  # this tier could reach the target; we're done
    return psi, prb, stages


def _maybe_slab_partition(data, scan, g, prb0, options, method, tiers,
                          base_kernel, fast_kernel, joint_kernel):
    """Row-slab setup for oversized objects, hoisted to the driver.

    Decides the slab count once (the max over every stage kernel's
    :func:`ops.slabs.choose_slabs` pick -- a finer slab fits wherever a
    coarser one does, and counts must divide nz), applies the host
    owner-partition once, and marks the options
    ``obj_slabs_partitioned`` so each per-stage cg.run goes straight to
    the solver on the partitioned problem.

    Returns (data, scan, geometry, options) -- unchanged when the
    object fits every stage's VMEM budget and no explicit ``obj_slabs``
    was forced, or when any stage kernel is non-fused (those paths are
    not VMEM-capped; an explicit obj_slabs with a non-fused stage
    raises, since that stage's cg.run would reject the option).
    """
    from tikejax.ops import pallas_fused
    from tikejax.ops import slabs as _slabs

    on_tpu = jax.default_backend() == "tpu"
    recover = options.recover_prb
    if method == "split":
        kernels = [fast_kernel or ("fused" if on_tpu else "xla"),
                   base_kernel or ("fused_hp" if on_tpu else "xla")]
        if recover:
            kernels.append(joint_kernel or kernels[1])
    else:
        kernels = [k for k, _, _ in tiers]
    resolved = [diffraction.resolve_kernel(k) for k in kernels]
    if not all(r.startswith("fused") for r in resolved):
        if options.obj_slabs > 1:
            raise ValueError(
                "obj_slabs > 1 requires every driver stage kernel to be "
                f"a fused tier; this call would run {kernels!r}")
        return data, scan, g, options
    import math

    nmodes = prb0.shape[-3]
    nslab = options.obj_slabs
    kframes = options.kernel_frames
    precs = [diffraction._fused_precision(r) for r in resolved]
    if nslab == 1:
        need = any(not pallas_fused.obj_planes_fit(
            g.nz, g.n, g.nprb, 4,
            extra_bytes=pallas_fused.frames_workspace_bytes(
                nmodes, g.ndet, g.nprb, pr, joint=recover,
                frames=kframes))
            for pr in precs)
        if not need:
            return data, scan, g, options
        # Per-stage-kernel plans; if ANY stage needed a lowered frames
        # count (very wide objects -- see slabs.plan_slabs), adopt the
        # minimum across stages as the uniform kernel_frames and
        # re-plan the slab counts at it; the slab count is the max
        # (finer slabs fit wherever coarser ones do).
        def stage_plan(pr, frames):
            # Consult the plans run()'s Mosaic-retry backstop already
            # proved on this config (cg._SLAB_PLAN_MEMO): the driver's
            # pre-partitioned stages skip the retry, so starting from a
            # learned plan is what keeps 2048^2-class deep runs from
            # dying on the fit model's optimism.
            key = (g.nz, g.n, g.nprb, g.ndet, nmodes, pr, recover)
            if frames is None and key in _cg._SLAB_PLAN_MEMO:
                return _cg._SLAB_PLAN_MEMO[key]
            return _slabs.plan_slabs(g.nz, g.n, g.nprb, planes=4,
                                     nmodes=nmodes, ndet=g.ndet,
                                     precision=pr, joint=recover,
                                     frames=frames)

        plans = [stage_plan(pr, kframes) for pr in precs]
        lowered = [f for _, f in plans if f is not None]
        if lowered:
            kframes = min(lowered)
            plans = [_slabs.plan_slabs(g.nz, g.n, g.nprb, planes=4,
                                       nmodes=nmodes, ndet=g.ndet,
                                       precision=pr, joint=recover,
                                       frames=kframes) for pr in precs]
        nslab = max(d for d, _ in plans)
    if isinstance(scan, jax.core.Tracer):
        raise ValueError(
            "obj_slabs needs concrete scan positions for the host-side "
            "owner partition; call reconstruct() outside jit for "
            "slab-streamed objects")
    eff = max((kframes if kframes is not None
               else pallas_fused._default_frames(pr)) for pr in precs)
    align = 32 * eff // math.gcd(32, eff)
    scan, data, _, s_per, rows = _slabs.partition_slabs(
        scan, data, g, nslab, align=align)
    g = dataclasses.replace(g, nscan=nslab * s_per)
    options = dataclasses.replace(options, obj_slabs=nslab,
                                  obj_slabs_partitioned=True,
                                  kernel_frames=kframes,
                                  obj_slab_rows=rows)
    return data, scan, g, options


def _make_run_fn(mesh):
    """CG-stage runner: plain single-device cg.run, or run_sharded bound
    to the mesh (identical call signature incl. f_base / cg_init)."""
    if mesh is None:
        return _cg.run

    from tikejax.parallel.sharding import run_sharded

    def run_fn(data, psi0, scan, prb0, geometry, options,
               f_base=None, cg_init=None):
        return run_sharded(data, psi0, scan, prb0, geometry, mesh,
                           options, f_base=f_base, cg_init=cg_init)

    return run_fn


def _reconstruct_split(data, psi0, scan, prb, g, target, segment,
                       max_segments, base_kernel, fast_kernel, options,
                       tiers, segment_carry=True, floor_patience=3,
                       accelerate=None, joint_kernel=None, mesh=None,
                       checkpoint_path=None, checkpoint_every=4):
    """Fast tier to its floor, then split-operator refinement segments.

    With ``mesh`` (1-D scan mesh; data/scan arrive pre-padded and
    sharded from :func:`reconstruct`), every stage runs through
    parallel.run_sharded and the base farplane is frozen by a sharded
    forward -- it stays sharded over the scan axis end-to-end."""
    on_tpu = jax.default_backend() == "tpu"
    fast = fast_kernel or ("fused" if on_tpu else "xla")
    base = base_kernel or ("fused_hp" if on_tpu else "xla")
    joint_kern = joint_kernel or base
    run_fn = _make_run_fn(mesh)
    nslab = options.obj_slabs if mesh is None else 1
    if mesh is None:
        if nslab > 1:
            # Slab-partitioned problem (reconstruct hoisted the
            # partition): the whole-object fwd kernel holds 2 object
            # planes in VMEM and overflows past side ~1400, so the base
            # freeze streams over the same row slabs as the solver.
            fwd_base = _make_fwd_base_slabs(g, base, nslab,
                                            options.kernel_frames,
                                            options.obj_slab_rows)
        else:
            def fwd_base(psi_, scan_, prb_):
                return _fwd_jit(psi_, scan_, prb_, g.ndet, base)
    else:
        from tikejax.parallel.sharding import fwd_sharded

        def fwd_base(psi_, scan_, prb_):
            return fwd_sharded(psi_, scan_, prb_, g.ndet, base, mesh)
    floor = tiers[0][1] if tiers else diffraction.FUSED_RESIDUAL_FLOOR
    stages = []

    # Outer-loop restartability (VERDICT r3 missing #4): an existing
    # checkpoint at checkpoint_path means a prior identical call crashed
    # mid-refinement -- validate it and skip straight to the refinement
    # loop with the saved outer state. Stages before the resume point
    # are not re-reported (their arrays died with the crashed process).
    ck = None
    if checkpoint_path is not None and os.path.exists(checkpoint_path):
        ck = _checkpoint.load(checkpoint_path)
        _ckpt_validate(ck, g, segment, target)

    # Stage 1: plain CG on the fast tier down to its reliable floor.
    # With recover_prb, this stage recovers the probe JOINTLY; the probe
    # is then frozen for the split refinement (the refinement's accuracy
    # gain targets the object -- the probe converges at the fast tier's
    # accuracy long before the object's deep tail; SURVEY SS2/C5 joint
    # recovery composed with the deep-residual driver).
    # The EARLY stage always runs Dai-Yuan regardless of the requested
    # direction: L-BFGS's aggressive early steps (unit-scaled
    # quasi-Newton from a flat start) measurably steer the iterate into
    # bad local basins of the nonconvex phase-retrieval objective --
    # measured on CPU (96^2/64 positions): an L-BFGS-warmed start
    # stalls EVERY later optimizer (dy or lbfgs, direct or split) at
    # 3.09e-4 where the DY-warmed start reaches <1e-4. CG's smaller
    # early steps act as the globalization phase; the user's direction
    # choice applies to the refinement segments, where the basin is
    # settled and L-BFGS's curvature memory shines.
    recover = options.recover_prb
    # Joint escalation/refresh segments run 512 accurate-tier joint
    # iterations as FOUR chained 128-iteration dispatches: a joint
    # iteration costs ~3x an object-only one, and a single 512-joint-
    # iteration device program exceeded the tunneled transport's
    # execution deadline at the headline scale (TPU worker crash,
    # round 3 — same failure class as the documented 2048-iter object
    # dispatch). The chain is dispatched back-to-back asynchronously;
    # early-exited tails cost one iteration each.
    joint_opts = dataclasses.replace(options, kernel=joint_kern,
                                     piter=128, target_residual=target,
                                     direction="dy")
    if ck is None:
        opts1 = dataclasses.replace(options, kernel=fast, direction="dy",
                                    piter=tiers[0][2] if tiers else 256,
                                    target_residual=max(target, floor))
        psi, prb, m = run_fn(data, psi0, scan, prb, g, opts1)
        stages.append((fast + (":joint" if recover else ""), m))
        if recover and target < floor:
            # Deep target: the frozen probe's error would floor the
            # object refinement at roughly the fast tier's accuracy
            # (measured in tests: a 5%-perturbed probe frozen at the
            # fast floor stalls the split phase ~4e-3). Escalate the
            # JOINT recovery to the accurate tier before freezing.
            psi, prb, _ = _joint_chain(data, psi, scan, prb, g,
                                       joint_opts, stages, run_fn)
        if target >= floor:
            return psi, prb, stages
    else:
        # Resume: the checkpoint was written inside the refinement loop,
        # so stage 1 (and any initial joint escalation) already ran.
        psi = hostio.to_device(ck["psi"])
        prb = hostio.to_device(ck["prb"])
    if recover:
        options = dataclasses.replace(options, recover_prb=False)

    # Stage 2: split-operator refinement. The base farplane is computed
    # once per segment with the accurate tier; CG then runs on the small
    # correction delta with the fast kernels (errors scale with delta).
    # direction='auto' resolves to L-BFGS here (and ONLY here): the
    # basin is settled by the Dai-Yuan stage 1, and the TPU A/B shows
    # L-BFGS refinement dominating (1e-6: 23.2 s / 1048 iters vs
    # 29.0 s / 1699; 3x-reproducible; BASELINE.md round 3). Plain
    # cg.run keeps 'auto'='dy' (flat-start basin hazard).
    refine_dir = ("lbfgs" if options.direction == "auto"
                  else options.direction)
    # The refinement inherits the caller's nchunks: since round 4 the
    # frozen base farplane streams through the scan chunks alongside
    # data/scan (cg._Engine), so memory-bound configs (base bigger than
    # HBM headroom) can chase deep targets by passing nchunks > 1 to
    # reconstruct (VERDICT r3 missing #3; it used to be forced to 1).
    opts2 = dataclasses.replace(options, kernel=fast, piter=segment,
                                target_residual=target,
                                carry_state=segment_carry,
                                direction=refine_dir)
    # All device work stays jitted: eager complex constants / arithmetic
    # are unimplemented or pathologically slow on some TPU transports
    # (tikejax.utils.hostio).
    add = jax.jit(jnp.add)

    state = _cg.zero_cg_state(psi, opts2) if segment_carry else None

    # Anderson safeguard flavour by base-farplane footprint (round 4,
    # VERDICT r3 missing #3 -- the memory ceiling): the farplane-REUSING
    # safeguard materializes BOTH candidates' accurate farplanes while
    # the frozen base is still alive (3x farplane peak HBM) but hands
    # the winner's farplane forward as the next base re-freeze (saves
    # one accurate forward per mixed segment -- the measured round-3
    # win). Above the byte threshold the FRAMELESS safeguard evaluates
    # both candidates' gaussian objectives in-kernel instead (nothing
    # farplane-sized is ever allocated; same selection decision -- the
    # residual statistic is monotone in minf), keeping the peak at ONE
    # base farplane: 8.6 GB at 4-mode/16k/128^2 or 64k/128^2, where the
    # 3x peak cannot fit v5e's 16 GB HBM. Mesh runs keep the reuse path
    # (per-chip shards divide the farplane).
    minf_base_fn = None
    if (mesh is None and base.startswith("fused")
            and int(np.prod(g.farplane_shape))
            * jnp.dtype(psi.dtype).itemsize > _SAFEGUARD_FRAMELESS_BYTES):
        minf_base_fn = _make_minf_base(g, base, nslab,
                                       options.kernel_frames,
                                       options.obj_slab_rows)
        # Same regime: keep the frozen base as the (re, im) f32 split
        # pair end-to-end -- the DFT kernel emits the pair anyway and
        # the refinement kernels consume it, so the complex copy (which
        # would hold 2x the base bytes live inside the solver program)
        # never exists.
        fwd_base = _make_fwd_base_split(g, base, nslab,
                                        options.kernel_frames,
                                        options.obj_slab_rows)

    prev = None
    flat = 0
    aa_hist = []  # Anderson history of (segment output, correction)
    res_hist = []  # per-segment end residuals (Aitken floor detection)
    budget = max_segments
    # With recover_prb, a floor stall in the object-only refinement may
    # mean the FROZEN PROBE's error is the floor, not the base kernel's
    # accuracy: alternate back to a joint base-tier segment to re-open
    # the probe, then resume the split refinement (classic alternating
    # minimization, but only triggered on demand). A refresh that itself
    # makes no progress identifies the genuine floor.
    refreshes = 4 if recover else 0
    aa_depth = (_parse_anderson_depth(accelerate) if accelerate is not None
                else 0)
    f_next = None  # chosen farplane handed forward by the Anderson step
    if ck is not None:
        (flat, budget, refreshes, res_hist, prev, aa_hist,
         state) = _ckpt_restore(ck, state)
    elif checkpoint_path is not None:
        # Initial checkpoint right after stage 1: a crash during the
        # first refinement segments resumes without redoing stage 1.
        _ckpt_save(checkpoint_path, g, segment, target, psi, prb, budget,
                   flat, refreshes, res_hist, prev, aa_hist, state)
    seg_i = 0
    while budget > 0:
        budget -= 1
        f_base = (f_next if f_next is not None
                  else fwd_base(psi, scan, prb))
        f_next = None
        delta0 = hostio.czeros(g.psi_shape, psi.dtype)
        delta, _, m = run_fn(data, delta0, scan, prb, g, opts2,
                             f_base=f_base, cg_init=state)
        # Drop the only base-farplane reference as soon as the segment
        # is dispatched (the runtime keeps the buffer alive until the
        # program completes): at scale the base IS the HBM budget, and
        # holding it across the next re-freeze would double the peak.
        f_base = None
        psi = add(psi, delta)
        stages.append((f"split:{fast}", m))
        if segment_carry:
            state = _masked_state(m["cg_state"], m["iters_run"], segment)
        if aa_depth:
            # History stores RAW map evaluations (segment outputs and
            # their corrections) — a taken mix is a combination of
            # them, not a new evaluation, so it never enters history.
            aa_hist.append((psi, delta))
            del aa_hist[:-aa_depth]
            if len(aa_hist) >= 2:
                if minf_base_fn is not None:
                    psi, took, f_next = _anderson_step_frameless(
                        [p for p, _ in aa_hist], [d for _, d in aa_hist],
                        data, scan, prb, minf_base_fn)
                else:
                    psi, took, f_next = _anderson_step(
                        [p for p, _ in aa_hist], [d for _, d in aa_hist],
                        data, scan, prb, fwd_base)
                if segment_carry:
                    # A taken mix moves psi off the carried trajectory;
                    # zero the state on device (fresh restart) there.
                    state = _masked_state_flag(state, took)
        # Pipelined termination test: read back the PREVIOUS segment's
        # scalars while the segment just dispatched runs (the ~0.4 s
        # per-readback sync on tunneled transports would otherwise
        # serialize against every segment). A segment dispatched after
        # the target was already reached exits on device after one
        # iteration (the early-exit while-loop sees the target met), so
        # the one-deep speculation wastes only a base re-freeze.
        if prev is not None:
            reached, contraction, res_end = _segment_status(prev, segment,
                                                            target)
            if reached:
                break
            res_hist.append(res_end)
            can_refresh = refreshes > 0 and budget > 0
            want_refresh = False
            if contraction > _FLOOR_CONTRACTION:
                flat += 1
                # Operator floor: successive segments are not
                # descending; the target is below what the base
                # kernel's accuracy supports -- stop burning budget.
                if floor_patience > 0 and flat >= floor_patience:
                    if not can_refresh:
                        break
                    want_refresh = True
            else:
                flat = 0
            if (not want_refresh and can_refresh
                    and _probe_floor_predicted(res_hist, target)):
                # Early probe-floor detection: re-open the probe now
                # instead of grinding to the flat threshold (measured
                # round 3 at headline scale: fires 5 plateau segments
                # earlier, 125.4 vs 166.2 s, -30% iterations).
                want_refresh = True
            if want_refresh:
                refreshes -= 1
                budget -= 1
                psi, prb, (r_reached, r_contr) = _joint_chain(
                    data, psi, scan, prb, g, joint_opts, stages, run_fn,
                    target=target)
                if r_reached:
                    _ckpt_done(checkpoint_path)
                    return psi, prb, stages
                if r_contr > _FLOOR_CONTRACTION:
                    break  # probe refresh flat too: genuine floor
                flat, prev = 0, None
                res_hist = []
                aa_hist = []  # joint segment changed the map
                f_next = None  # pending base used the old probe
                state = (_cg.zero_cg_state(psi, opts2) if segment_carry
                         else None)
                continue
        prev = m
        seg_i += 1
        if checkpoint_path is not None and seg_i % checkpoint_every == 0:
            # One sync per save (reads back the just-dispatched segment's
            # scalars and the iterate) -- the documented durability cost.
            _ckpt_save(checkpoint_path, g, segment, target, psi, prb,
                       budget, flat, refreshes, res_hist, prev, aa_hist,
                       state)
    _ckpt_done(checkpoint_path)
    return psi, prb, stages


# Per-segment residual contraction at or above which a segment counts
# as FLAT for the floor stop. Deliberately tight: the legitimate deep
# grind runs at ~3%/segment (the 3e-7 A/B descended 1e-6 -> 3.2e-7
# over 41 segments, carry ON and helping: 393.5 s vs 546.5 s without
# carry), so only truly floor-pinned segments (<0.5% progress) count.
_FLOOR_CONTRACTION = 0.995


# Device-side carry guard: an all-zeros state is EXACTLY what run_impl
# builds for cg_init=None (fresh steepest-descent start; an empty
# count=0 L-BFGS ring under carry_lbfgs -- cg.zero_cg_state builds the
# matching layout), so masking the carried tuple keeps the carry
# decision on device (no per-segment readback) and compiles ONE solver
# variant for all segments. Segments that end early (stall or target)
# restart fresh -- a stalled direction is one the line search already
# rejected. Budget-exhausted segments always carry: measured at BOTH
# regimes (1e-6: 29.9 s vs 31.5 s; 3e-7 grind: 393.5 s vs 546.5 s),
# carry wins for short segments even when per-segment progress is a few
# percent, so no progress-based masking is applied (a 5% threshold was
# tried and would have disabled carry exactly where it was winning).
@jax.jit
def _masked_state(cg_state, iters_run, segment):
    keep = iters_run >= segment
    return jax.tree_util.tree_map(
        lambda x: jnp.where(keep, x, jnp.zeros_like(x)), cg_state)


# Anderson (AA-II) default mixing depth over the split-segment iterate
# sequence. 3 is the classic small-memory choice; the history is a
# python list of device arrays (a few MB at 512²), so depth is cheap to
# change per-call via accelerate='anderson:<depth>'.
_AA_DEPTH = 3


def _parse_anderson_depth(accelerate: str):
    """Depth for 'anderson'/'anderson:<d>' (2..8), else None."""
    if accelerate == "anderson":
        return _AA_DEPTH
    if isinstance(accelerate, str) and accelerate.startswith("anderson:"):
        try:
            d = int(accelerate.split(":", 1)[1])
        except ValueError:
            return None
        if 2 <= d <= 8:
            return d
    return None


def _anderson_step(psis, deltas, data, scan, prb, fwd_base):
    """One safeguarded Anderson mixing step over segment outputs.

    ``psis``/``deltas`` are the last m ≤ _AA_DEPTH segment outputs
    G(x_j) and their corrections r_j = G(x_j) − x_j. Solves the
    constrained least squares min ‖Σ α_j r_j‖, Σ α_j = 1 on the real
    Gram matrix (Tikhonov-regularized), forms x_mix = Σ α_j G(x_j),
    then evaluates BOTH candidates' gaussian amplitude residuals with
    the accurate base forward ``fwd_base`` (plain jitted single-device,
    or shard_map-backed under a mesh -- the farplanes and the residual
    reductions then stay sharded; the selection scalar is global) and
    returns (chosen iterate, took-mix flag, chosen farplane) — all on
    device (the caller's control flow never reads any of it back; the
    farplane is reused as the next segment's base re-freeze). The
    gaussian-scale residual is used as the safeguard statistic for any
    likelihood model (it is a selection heuristic, not the objective).
    """
    psi_mix = _anderson_mix(tuple(psis), tuple(deltas))
    psi_plain = psis[-1]
    f_mix = fwd_base(psi_mix, scan, prb)
    f_plain = fwd_base(psi_plain, scan, prb)
    # The chosen candidate's farplane IS the next segment's base
    # re-freeze (same kernel, same psi) — returning it saves one
    # accurate-tier forward per mixed segment.
    return _anderson_select(psi_mix, psi_plain, f_mix, f_plain, data)


# Base-farplane byte size above which the Anderson safeguard switches
# to the frameless (in-kernel objective) variant: 3 GB keeps the
# headline config (2.1 GB farplane at 16k x 128^2) on the measured
# farplane-reusing path while the memory-bound configs (8.6 GB at
# 4-mode/16k or 64k positions) never allocate a second farplane.
_SAFEGUARD_FRAMELESS_BYTES = 3 << 30


def _make_minf_base(g, base, n_slabs: int = 1, frames=None,
                    slab_rows=None):
    """Frameless accurate-tier objective evaluator psi -> global
    gaussian minf (pallas_fused.minf_fused at the base kernel's
    precision: every farplane frame lives only in VMEM). Used by the
    memory-bound Anderson safeguard; single-device, fused-base only.
    With ``n_slabs > 1`` (slab-partitioned problem) the objective
    streams over the same row slabs as the solver -- the whole-object
    minf kernel would hit the same VMEM rejection the solver path
    avoids (round-4 VERDICT missing #2)."""
    from tikejax.ops import pallas_fused
    from tikejax.ops import patches as _patches
    from tikejax.ops import slabs as _slabs

    prec = diffraction._fused_precision(base)
    ndet = g.ndet

    @jax.jit
    def minf_base(psi_, scan_, prb_, data_):
        scan_i = _patches.scan_to_int(scan_)
        if n_slabs > 1:
            return _slabs.minf_fused_slabs(psi_, data_, scan_i, prb_,
                                           ndet, "gaussian", n_slabs,
                                           precision=prec,
                                           frames=frames,
                                           slab_rows=slab_rows)
        return pallas_fused.minf_fused(psi_, data_, scan_i, prb_, ndet,
                                       "gaussian", precision=prec)

    return minf_base


def _make_fwd_base_slabs(g, base, n_slabs: int, frames=None,
                         slab_rows=None):
    """Slab-streamed base freeze: complex farplane of the partitioned
    problem via ops.slabs.fwd_fused_slabs (frame order matches the
    partitioned scan axis; sentinels emit zero frames)."""
    from tikejax.ops import patches as _patches
    from tikejax.ops import slabs as _slabs

    prec = diffraction._fused_precision(base)
    ndet = g.ndet

    @jax.jit
    def fwd_base(psi_, scan_, prb_):
        scan_i = _patches.scan_to_int(scan_)
        return _slabs.fwd_fused_slabs(psi_, scan_i, prb_, ndet, n_slabs,
                                      precision=prec, frames=frames,
                                      slab_rows=slab_rows)

    return fwd_base


def _make_fwd_base_split(g, base, n_slabs: int = 1, frames=None,
                         slab_rows=None):
    """Base-tier forward that emits the frozen farplane as the raw
    (re, im) f32 split pair (pallas_fused.fwd(split_out=True)) instead
    of assembling the complex array. Numerically identical to fwd_raw
    at the same tier -- the complex output is lax.complex of exactly
    this pair -- but the memory-bound split path keeps the pair
    end-to-end (cg's engine consumes it via pallas_fused._base_split),
    so a second base-sized buffer never exists. Single-device,
    fused-base only (the mesh path keeps the complex reuse form);
    slab-partitioned problems stream over the solver's row slabs."""
    from tikejax.ops import pallas_fused
    from tikejax.ops import patches as _patches
    from tikejax.ops import slabs as _slabs

    prec = diffraction._fused_precision(base)
    ndet = g.ndet

    @jax.jit
    def fwd_base(psi_, scan_, prb_):
        scan_i = _patches.scan_to_int(scan_)
        if n_slabs > 1:
            return _slabs.fwd_fused_slabs(psi_, scan_i, prb_, ndet,
                                          n_slabs, precision=prec,
                                          split_out=True, frames=frames,
                                          slab_rows=slab_rows)
        return pallas_fused.fwd(psi_, scan_i, prb_, ndet, precision=prec,
                                split_out=True)

    return fwd_base


def _anderson_step_frameless(psis, deltas, data, scan, prb, minf_base):
    """Memory-bound variant of :func:`_anderson_step`: evaluates both
    candidates' gaussian objectives with the frameless base-tier kernel
    (nothing farplane-sized allocated) and selects on device. The
    residual statistic sqrt(minf / sum(data)) is monotone in minf, so
    the selection decision matches the farplane-reusing safeguard;
    the winner's farplane is NOT handed forward (returns None), costing
    one accurate forward per mixed segment in exchange for the 2x
    farplane saving."""
    psi_mix = _anderson_mix(tuple(psis), tuple(deltas))
    psi_plain = psis[-1]
    m_mix = minf_base(psi_mix, scan, prb, data)
    m_plain = minf_base(psi_plain, scan, prb, data)
    psi, took = _select_by_minf(psi_mix, psi_plain, m_mix, m_plain)
    return psi, took, None


@jax.jit
def _select_by_minf(psi_mix, psi_plain, m_mix, m_plain):
    take = m_mix < m_plain
    return jnp.where(take, psi_mix, psi_plain), take


@jax.jit
def _anderson_mix(psis, deltas):
    m = len(deltas)
    R = jnp.stack([d.ravel() for d in deltas])           # (m, N) complex
    G = jnp.real(R @ jnp.conj(R).T)
    Greg = G + (1e-7 * jnp.trace(G) / m + 1e-30) * jnp.eye(m, dtype=G.dtype)
    alpha = jnp.linalg.solve(Greg, jnp.ones((m,), G.dtype))
    alpha = alpha / jnp.sum(alpha)
    return jnp.einsum("i,i...->...", alpha, jnp.stack(psis))


@jax.jit
def _anderson_select(psi_mix, psi_plain, f_mix, f_plain, data):
    sum_d = jnp.sum(jnp.maximum(data, 0.0))

    def res(f):
        return jnp.sqrt(jnp.maximum(
            likelihoods.gaussian_minf(f, data), 0.0) / sum_d)

    take = res(f_mix) < res(f_plain)
    return (jnp.where(take, psi_mix, psi_plain), take,
            jnp.where(take, f_mix, f_plain))


@jax.jit
def _masked_state_flag(cg_state, took_mix):
    return jax.tree_util.tree_map(
        lambda x: jnp.where(took_mix, jnp.zeros_like(x), x), cg_state)


# --- split-driver outer-loop checkpointing (VERDICT r3 missing #4) ----------
#
# The refinement loop's control state lives in host Python; these helpers
# round-trip ALL of it through utils.checkpoint (atomic npz, complex-safe)
# so a transport crash -- a documented real event on the tunneled TPU --
# costs at most checkpoint_every segments. Saved at a single program
# point (end of a loop iteration, just after ``prev = m``), so a resumed
# process re-enters the loop with bit-identical host state; the device
# trajectory is deterministic from (psi, prb, state), and the one
# non-saved optimization (the Anderson reuse path's forwarded farplane
# f_next) is recomputed by the same kernel from the same iterate.


def _ckpt_save(path, g, segment, target, psi, prb, budget, flat,
               refreshes, res_hist, prev, aa_hist, state):
    tree = {
        "meta": {
            "version": np.int64(1),
            "segment": np.int64(segment),
            "target": np.float64(target),
            "geom": np.asarray([g.ntheta, g.nz, g.n, g.nscan, g.ndet,
                                g.nprb, g.nmodes], np.int64),
        },
        "psi": psi,
        "prb": prb,
        "ctl": {
            "budget": np.int64(budget),
            "flat": np.int64(flat),
            "refreshes": np.int64(refreshes),
            "res_hist": np.asarray(res_hist, np.float64),
            "has_prev": np.int64(prev is not None),
        },
    }
    if prev is not None:
        # Everything _segment_status consumes from the previous segment.
        tree["prev"] = {"iters_run": prev["iters_run"],
                        "residual": prev["residual"]}
    if aa_hist:
        tree["aa"] = {
            "psis": {str(i): p for i, (p, _) in enumerate(aa_hist)},
            "deltas": {str(i): d for i, (_, d) in enumerate(aa_hist)},
        }
    if state is not None:
        tree["state"] = {str(i): x for i, x in enumerate(state)}
    _checkpoint.save(path, tree)


def _ckpt_validate(ck, g, segment, target):
    meta = ck.get("meta")
    geom = np.asarray([g.ntheta, g.nz, g.n, g.nscan, g.ndet, g.nprb,
                       g.nmodes], np.int64)
    if meta is None or "geom" not in meta:
        raise ValueError("checkpoint_path exists but is not a reconstruct "
                         "split-driver checkpoint")
    if (not np.array_equal(np.asarray(meta["geom"]), geom)
            or int(meta["segment"]) != segment
            or float(meta["target"]) != target):
        raise ValueError(
            "existing checkpoint was written by a DIFFERENT reconstruct "
            "call (geometry/segment/target mismatch); remove it or pass "
            "the original arguments to resume")


def _ckpt_restore(ck, state):
    """Loop state from a loaded checkpoint; complex arrays re-uploaded
    via hostio (the transport-safe split-pair path). ``state`` is the
    fresh zero state, replaced only when the checkpoint carried one."""
    ctl = ck["ctl"]
    res_hist = [float(x) for x in np.asarray(ctl["res_hist"]).ravel()]
    prev = None
    if int(ctl["has_prev"]):
        # numpy arrays pass straight through hostio.to_host in
        # _segment_status, exactly like freshly-read-back metrics.
        prev = {"iters_run": ck["prev"]["iters_run"],
                "residual": ck["prev"]["residual"]}
    aa_hist = []
    if "aa" in ck:
        psis, deltas = ck["aa"]["psis"], ck["aa"]["deltas"]
        aa_hist = [(hostio.to_device(psis[str(i)]),
                    hostio.to_device(deltas[str(i)]))
                   for i in range(len(psis))]
    if "state" in ck and state is not None:
        st = ck["state"]
        state = tuple(hostio.to_device(st[str(i)]) for i in range(len(st)))
    return (int(ctl["flat"]), int(ctl["budget"]), int(ctl["refreshes"]),
            res_hist, prev, aa_hist, state)


def _ckpt_done(path):
    """Remove the checkpoint on successful completion, so re-running the
    same call starts fresh instead of resuming a finished run."""
    if path is not None and os.path.exists(path):
        os.remove(path)


def _joint_chain(data, psi, scan, prb, g, joint_opts, stages, run_fn,
                 target=None, n=4):
    """Run n chained joint dispatches (async, no host round-trips
    between them), appending each as a ':joint' stage (labelled with
    the kernel the chain ACTUALLY runs -- joint_opts.kernel may differ
    from the base tier via reconstruct's joint_kernel knob). With
    ``target``, returns (reached, contraction-across-the-chain) as the
    third element (two scalar readbacks); else None."""
    ms = []
    for _ in range(n):
        psi, prb, m = run_fn(data, psi, scan, prb, g, joint_opts)
        stages.append((joint_opts.kernel + ":joint", m))
        ms.append(m)
    if target is None:
        return psi, prb, None
    kl = int(hostio.to_host(ms[-1]["iters_run"]))
    rl = hostio.to_host(ms[-1]["residual"])
    res_end = float(rl[max(kl - 1, 0)])
    reached = kl < joint_opts.piter and res_end <= target
    r0 = float(hostio.to_host(ms[0]["residual"])[0])
    return psi, prb, (reached, res_end / max(r0, 1e-300))


def _segment_status(m, segment, target):
    """(reached, contraction, res_end) for a completed split segment.

    Early exit (iters_run < budget) means target reached OR line-search
    stall at the segment's floor (stop_on_stall); only the former sets
    ``reached`` -- a stalled segment gets a fresh base, which is exactly
    the remedy for a stall (the correction restarts from zero against a
    more accurate farplane). ``contraction`` is res_end/res_start, the
    floor-stop statistic.
    """
    ran = int(hostio.to_host(m["iters_run"]))
    res = hostio.to_host(m["residual"])
    res_end = float(res[max(ran - 1, 0)])
    reached = ran < segment and res_end <= target
    contraction = res_end / max(float(res[0]), 1e-300)
    return reached, contraction, res_end


def _aitken_limit(r0, r1, r2):
    """Aitken Δ² estimate of the limit of a near-geometric residual
    sequence, or None when the last three points aren't a decelerating
    monotone decay (ratio outside (0, 0.95))."""
    d1, d2 = r1 - r0, r2 - r1
    if d1 >= 0 or d2 >= 0:
        return None
    rho = d2 / d1
    if not (0.0 < rho < 0.95):
        return None
    return r2 - d2 * d2 / (d2 - d1)


def _probe_floor_predicted(res_hist, target):
    """Early probe-floor detection on the per-segment end residuals.

    The object-only split phase approaches a FROZEN PROBE's error floor
    as a near-geometric sequence (measured round 3 at headline scale:
    per-segment ratio ~0.45), and the flat counter then waits several
    more near-flat segments before firing the probe refresh. Aitken-
    extrapolate the last two residual triples instead: when BOTH predict
    a limit clearly above the target, the refinement is asymptoting at
    probe error, not heading to the target. Double confirmation plus
    the 1.2x margin keep healthy runs (whose limit is below target)
    from misfiring; non-recover runs never consult this (refreshes=0).
    """
    if len(res_hist) < 4:
        return False
    lim1 = _aitken_limit(*res_hist[-4:-1])
    lim2 = _aitken_limit(*res_hist[-3:])
    return (lim1 is not None and lim2 is not None
            and lim1 > 1.2 * target and lim2 > 1.2 * target)
