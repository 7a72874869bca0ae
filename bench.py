"""Headline benchmark: CG iterations/second on the 512^2-object /
16k-position configuration (BASELINE.json:2), single chip.

Prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "iters/s", "vs_baseline": N, ...}

vs_baseline compares against a trajectory-matched engineering ESTIMATE
of libtike-cufft on a V100 for the same configuration (~20 CG iters/s at
the measured evaluation sequence); the upstream publishes no numbers
(BASELINE.json:13 "published": {}; BASELINE.md). Extra diagnostic fields
ride along in the same JSON object.
"""

import json
import math
import sys
import time

import jax
import numpy as np

from tikejax import Geometry
from tikejax.models import make_problem
from tikejax.solvers import run
from tikejax.utils import (cones, device_sync as sync, scalar,
                           sync_overhead_seconds, to_host)

# Estimated reference-on-V100 iteration rate for the headline config,
# TRAJECTORY-MATCHED to what this bench measures (the full convergent
# run to the residual floor, averaging ~3.07 line-search evaluations
# per iteration -- the same Dai-Yuan + backtracking policy performs the
# same evaluation sequence on any hardware). See BASELINE.md for the
# derivation (FFT FLOPs + atomicAdd scatter bandwidth + quadratic-
# statistics reads per evaluation + per-iteration host syncs: ~50 ms).
# Quoted as "vs estimate" -- the upstream publishes no numbers. The
# self-contained hardness figure is mxu_utilization below.
BASELINE_ITERS_PER_SEC_V100_EST = 20.0



# v5e peak bf16 matmul throughput (TFLOP/s per chip; 394 is the int8
# figure).
V5E_MXU_TFLOPS = 197.0


def _ls_evals(metrics, opts, piter):
    """APPROXIMATE per-iteration line-search evaluation count recovered
    from the recorded gamma trace (gamma_i = gamma0_i * shrink^k =>
    k+1 evals). With the default 'interp' search, accepted gammas can
    lie off the halving grid, so rounded halving counts are +-1 per
    rejection-iteration; good enough for the diagnostic roofline
    fields. Honours the options' regrow warm-start factor."""
    gammas = to_host(metrics["gamma"])[:piter]
    shrink = opts.get("step_shrink", 0.5)
    step0 = opts.get("step0", 1.0)
    from tikejax.solvers.cg import CGOptions
    grow = opts.get("step_growth", CGOptions.step_growth)
    evals = 0
    gamma_prev = 0.0
    for gam in gammas:
        gamma0 = step0 if gamma_prev <= 0 else min(step0,
                                                   grow * gamma_prev)
        if gam <= 0:  # all halvings failed
            halvings = 16
        else:
            halvings = max(0, round(math.log(gam / gamma0, shrink)))
        evals += halvings + 1
        gamma_prev = float(gam)
    return evals / max(piter, 1)


# bf16 MXU passes per complex matmul, by kernel tier, split into
# (forward-DFT, adjoint-IDFT) halves: the single-pass tier uses the
# schoolbook form (4 real mms x 1 bf16 pass); fused_mp uses Karatsuba
# (3 real mms) of bf16x3 (3 passes each) = 9; fused_hp's full-f32 mms
# are counted at the f32:bf16 throughput ratio; fused_mx runs the
# forward at the mp tier and the gradient IDFT at the single-pass tier.
_MXU_PASSES = {"fused": (4, 4), "fused_mp": (9, 9), "fused_hp": (12, 12),
               "fused_mx": (9, 4), "fused_hx": (12, 4), "fused_am": (4, 9)}


def _perf_model(g: Geometry, metrics, opts, dt, piter):
    """Roofline figures for the (default) frameless fused path.

    Nothing farplane-sized touches HBM, so the path is MXU/overhead-
    bound, not bandwidth-bound. (The materialized path measured 0.99 of
    the 819 GB/s HBM roofline in round 2 -- BASELINE.md; frameless beat
    it by removing the bandwidth wall entirely.) MXU work: each frame
    costs ~ndet*nprb*(nprb+ndet) complex MACs per DFT application, at
    the tier's bf16-pass multiplier (_MXU_PASSES; the v2 row-extended
    stage-1 adds ~6%, uncounted).

    With the merged gradient/line-search (the default here) EVERY
    objective evaluation is a gradient mega-kernel pass: 1 data read +
    1 forward DFT + 1 adjoint IDFT application per eval, and there is
    no separate gradient pass. Classic mode: one gradient pass (1 read
    + fwd + adj) plus 1 read + 1 fwd app per line-search evaluation.
    """
    from tikejax.ops.diffraction import resolve_kernel
    from tikejax.solvers.cg import CGOptions, _Engine, normalize_options

    nopts = normalize_options(CGOptions(**opts))
    eng = _Engine(g, nopts)
    data_px = g.ntheta * g.nscan * g.ndet * g.ndet
    evals = _ls_evals(metrics, opts, piter)
    fwd_p, adj_p = _MXU_PASSES.get(resolve_kernel(nopts.kernel), (4, 4))
    if eng.merged:
        reads = evals
        passes = evals * (fwd_p + adj_p)
    else:
        reads = 1 + evals
        passes = (fwd_p + adj_p) + evals * fwd_p
    total_bytes = piter * reads * 4 * data_px
    gbps = total_bytes / dt / 1e9
    macs_per_pass = g.ndet * g.nprb * (g.nprb + g.ndet)
    frames = g.ntheta * g.nscan * g.nmodes
    flops = piter * passes * frames * macs_per_pass * 2
    tflops = flops / dt / 1e12
    return gbps, tflops, tflops / V5E_MXU_TFLOPS, evals


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")

    g = Geometry(nz=512, n=512, nscan=16384, ndet=128, nprb=128)
    psi_true, scan, prb, data = make_problem(jax.random.PRNGKey(0), g)
    sync(data)
    psi0 = cones(g.psi_shape)
    log("problem simulated")

    # Timing protocol: the only reliable barrier on this transport is a
    # ~0.4s readback sync, so the measured window must dwarf it. Each
    # single dispatch must stay <= 512 iterations (longer dispatches
    # crashed the tunneled worker, BASELINE.md), so the steady state
    # runs TWO 400-iteration dispatches back-to-back (in-order device
    # stream) between two syncs and divides by the iterations actually
    # run: with the default interp search the runs keep descending for
    # the full budget; with pure backtracking stop_on_stall exits at
    # the accuracy floor (~iter 270) -- both are handled.
    piter = 400
    opts = dict(piter=piter, model="gaussian")

    # Warm-up: compile + one full run.
    t0 = time.time()
    psi, _, metrics = run(data, psi0, scan, prb, g, **opts)
    sync(psi)
    warm_ran = max(int(to_host(metrics["iters_run"])), 1)
    warm_minf = np.asarray(to_host(metrics["minf"]))
    log(f"compile+first run: {time.time() - t0:.1f}s; "
        f"minf {warm_minf[0]:.4e} -> {warm_minf[warm_ran - 1]:.4e} "
        f"({warm_ran} iters)")

    # Subtract the readback-sync RPC overhead from the steady-state timing
    # (~0.4s on tunneled transports, ~0 locally).
    sync_overhead = sync_overhead_seconds()
    log(f"sync overhead: {sync_overhead * 1000:.0f} ms")

    # Steady state: two dispatches per window, MEDIAN of 3 windows with
    # the run-to-run spread attached (single windows sample a +-12%
    # spread; VERDICT r2 next #3 -- the headline must be statistically
    # honest, and every doc quotes the driver-captured number).
    rates, dts, windows = [], [], []
    for _ in range(3):
        t0 = time.time()
        psi1, _, metrics = run(data, psi0, scan, prb, g, **opts)
        psi, _, metrics2 = run(data, psi0, scan, prb, g, **opts)
        sync(psi)
        dt2 = max(time.time() - t0 - sync_overhead, 1e-9)
        iters1 = int(to_host(metrics["iters_run"]))
        iters2 = int(to_host(metrics2["iters_run"]))
        rates.append((iters1 + iters2) / dt2)
        dts.append(dt2)
        windows.append(iters1 + iters2)
        log(f"steady window: {iters1}+{iters2} iters in {dt2:.2f}s "
            f"({rates[-1]:.1f} iters/s)")
    order = int(np.argsort(rates)[len(rates) // 2])
    iters_per_sec = rates[order]
    dt2, window_iters = dts[order], windows[order]
    spread = (max(rates) - min(rates)) / iters_per_sec
    # Evals/perf model over the LAST window (whose metrics we hold).
    iters1 = int(to_host(metrics["iters_run"]))
    dt = dts[-1] * iters1 / max(windows[-1], 1)
    piter = iters1

    minf_arr = np.asarray(to_host(metrics["minf"]))
    res_arr = np.asarray(to_host(metrics["residual"]))
    minf0 = float(minf_arr[0])
    minf_last = float(minf_arr[iters1 - 1])
    res_last = float(res_arr[iters1 - 1])
    hbm_gbps, mxu_tflops, mxu_util, ls_evals = _perf_model(
        g, metrics, opts, dt, piter)

    # Secondary tier (VERDICT r1 #8): the deep-residual kernel. Measure
    # time-to-1e-4 relative residual with the middle-precision tier
    # (fused_mx since round 3: bf16x3 forward/objective + single-pass
    # gradient IDFT; identical trajectory to fused_mp at +33% rate).
    # Compile excluded by a warm-up run.
    mp_iters = 240
    mp_opts = dict(piter=mp_iters, model="gaussian", kernel="fused_mx")
    _, _, m_mp = run(data, psi0, scan, prb, g, **mp_opts)
    sync(m_mp["residual"])
    t0 = time.time()
    _, _, m_mp = run(data, psi0, scan, prb, g, **mp_opts)
    sync(m_mp["residual"])
    dt_mp = max(time.time() - t0 - sync_overhead, 1e-9)
    mp_ran = int(to_host(m_mp["iters_run"]))
    res_mp = np.asarray(to_host(m_mp["residual"]))[:mp_ran]
    hit = np.nonzero(res_mp < 1e-4)[0]
    t_to_1e4 = round(dt_mp * (int(hit[0]) + 1) / mp_ran, 2) if len(
        hit) else None
    log(f"fused_mx: {mp_ran} iters in {dt_mp:.1f}s, "
        f"res_last {res_mp[-1]:.2e}, time-to-1e-4 {t_to_1e4}s")

    # The other half of the driver metric (BASELINE.json:2): wall time to
    # 1e-6 relative residual, via split-operator mixed-precision
    # reconstruct (warm-up run excludes compile from the steady number).
    from tikejax.solvers import reconstruct
    _, _, _ = reconstruct(data, psi0, scan, prb, g, target_residual=1e-6)
    deep_times, deep_iters_list = [], []
    for _ in range(3):
        t0 = time.time()
        psi_deep, _, stages = reconstruct(data, psi0, scan, prb, g,
                                          target_residual=1e-6)
        sync(psi_deep)
        deep_times.append(round(time.time() - t0 - sync_overhead, 1))
        deep_iters_list.append(sum(int(to_host(m["iters_run"]))
                                   for _, m in stages))
        log(f"split reconstruct: 1e-6 residual in {deep_times[-1]}s "
            f"({deep_iters_list[-1]} iters, {len(stages)} stages)")
    # Median-of-3: single deep runs sample a bimodal ~+-30% transport
    # noise (BASELINE.md round-3 note); the iteration count is stable.
    k = int(np.argsort(deep_times)[1])
    t_to_1e6, deep_iters = deep_times[k], deep_iters_list[k]

    result = {
        "metric": "cg_iters_per_sec_512obj_16kpos",
        "value": round(iters_per_sec, 3),
        "unit": "iters/s",
        "vs_baseline": round(iters_per_sec / BASELINE_ITERS_PER_SEC_V100_EST,
                             3),
        "config": "512^2 object, 16384 positions, 128^2 probe/det, "
                  "gaussian",
        "device": f"{dev.platform}:{dev.device_kind}",
        "spread": round(spread, 3),
        "window_rates": [round(r, 2) for r in rates],
        "steady_window_s": round(dt2, 3),
        "steady_window_iters": window_iters,
        "ms_per_iter": round(1000.0 * dt2 / max(window_iters, 1), 3),
        "minf_first_iter": minf0,
        "minf_last_iter": minf_last,
        "rel_residual_last_iter": res_last,
        "achieved_hbm_gbps": round(hbm_gbps, 1),
        "mxu_dft_tflops": round(mxu_tflops, 1),
        "mxu_utilization": round(mxu_util, 3),
        "roofline_note": "frameless path: nothing farplane-sized in HBM "
                         "(MXU/overhead-bound; the materialized path "
                         "measured 0.99 of the 819 GB/s HBM roofline); "
                         f"{ls_evals:.2f} line-search evals/iter from "
                         "the gamma trace",
        "mid_tier_kernel": "fused_mx",
        "mid_tier_time_to_1e-4_residual_s": t_to_1e4,
        "mid_tier_iters_per_sec": round(mp_ran / dt_mp, 2),
        "time_to_1e-6_residual_s": t_to_1e6,
        "time_to_1e-6_iters": deep_iters,
        "time_to_1e-6_runs_s": deep_times,
        "baseline_note": "V100 estimate, no published numbers "
                         "(BASELINE.md)",
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
