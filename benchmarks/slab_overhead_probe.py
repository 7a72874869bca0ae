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
# Optional case-name substring filter (2nd arg) to probe a subset.
FILT = sys.argv[2] if len(sys.argv) > 2 else ""
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
    cases.append(("whole", sc_i, lambda: data, 1, "auto"))
    # 1-"slab" repartition: identity-order gather through
    # partition_slabs' device `take` -- runs the PLAIN kernel on the
    # gathered copy. If this alone shows the +3.5 ms, the cost is the
    # gathered data array's layout, not anything slab-shaped.
    scan_1, data_1, _, _, _ = slabs.partition_slabs(scan, data, g, 1)
    sc_1 = jax.jit(patches.scan_to_int)(jnp.asarray(scan_1))
    cases.append(("repart1", sc_1, lambda: data_1, 1, "auto"))
    # ...and the same gathered copy pushed through a jitted identity
    # add (forces a fresh default-layout materialization).
    cases.append(("repart1copy", sc_1,
                  lambda: jax.jit(lambda x: x + 0.0)(data_1), 1,
                  "auto"))
    # t=2 SPLIT control: the same total work arranged as 2 leading
    # blocks of half the positions each (object duplicated, no slab
    # semantics at all) -- isolates the cost of a multi-block leading
    # axis (grid shape + minf output form) from everything slab-shaped.
    t2 = jax.jit(lambda x: jnp.stack([x[0, :8192], x[0, 8192:]]))
    cases.append(("t2split", t2(sc_i), lambda: t2(data), 2, "t2"))
    # ...morphs from t2split (fast) toward slab2direct (slow), one
    # property at a time:
    # t2sorted: owner-sorted + sentinel-padded scan (GLOBAL y, FULL
    # object per block) -- tests the partition's ordering/sentinels/
    # 8224-length without sub-objects.
    scan_p2, data_p2, _, sp2, rows2 = slabs.partition_slabs(scan, data, g, 2)
    sc_p2i = jax.jit(patches.scan_to_int)(jnp.asarray(scan_p2))
    tsrt = jax.jit(lambda x, sp=sp2: x.reshape((2, sp) + x.shape[2:]))
    cases.append(("t2sorted", tsrt(sc_p2i), lambda: tsrt(data_p2), 2, "t2"))
    # ...and the same with the partition's take() output FORCED through
    # a fresh materialization (x + 0.0): every slow case consumes the
    # take output, every fast case rebuilds data another way.
    cases.append(("t2sortedcopy", tsrt(sc_p2i),
                  lambda: tsrt(jax.jit(lambda x: x + 0.0)(data_p2)),
                  2, "t2"))
    # sortonly: positions SORTED by y (owner order), NO padding, NO
    # slab structure, t=1, plain kernel -- pure ordering effect.
    perm = np.argsort(np.asarray(scan)[0, :, 0], kind="stable")
    sort_fn = jax.jit(lambda x, p: x[:, p])
    cases.append(("sortonly", sort_fn(sc_i, perm),
                  lambda: sort_fn(data, perm), 1, "auto"))
    # t2halves: the SAME sorted order reshaped into 2 blocks (each
    # y-restricted to half the range), NO sentinels -- the final
    # discriminator between "y-restricted blocks" and "sentinels x
    # sorted x blocks".
    cases.append(("t2halves", t2(sort_fn(sc_i, perm)),
                  lambda: t2(sort_fn(data, perm)), 2, "t2"))
    # t2pad: t2split's halves each sentinel-padded by 32 (length 8224)
    # -- ordering untouched; isolates sentinels + group length.
    def pad32(x, fill):
        padw = [(0, 0), (0, 32)] + [(0, 0)] * (x.ndim - 2)
        return jnp.pad(x, padw, constant_values=fill)
    sc_t2p = jax.jit(lambda s_: pad32(
        t2(s_), -1).at[..., 8192:, 1].set(0))(sc_i)

    def dat_t2p():
        return jax.jit(lambda d_: pad32(t2(d_), 0.0))(data)

    cases.append(("t2pad", sc_t2p, dat_t2p, 2, "t2"))
    # t2sortpad: y-sorted halves + 32 sentinels each (sorted AND
    # y-restricted AND sentinels). FAST => the partition fix is to
    # sort within groups; SLOW => sentinels x restriction is
    # fundamental.
    sc_sp = jax.jit(lambda s_: pad32(
        t2(sort_fn(s_, perm)), -1).at[..., 8192:, 1].set(0))(sc_i)
    cases.append(("t2sortpad", sc_sp, lambda: jax.jit(
        lambda d_: pad32(t2(sort_fn(d_, perm)), 0.0))(data), 2, "t2"))
    # t2padmidx: unsorted partition-like halves with sentinels whose x
    # sits mid-range (384) instead of 0 -- tests whether the sentinel
    # COORDINATE values (clamped-corner gathers) are what hurts.
    scan_mid = jax.jit(lambda s_: pad32(t2(s_), -1)
                       .at[..., 8192:, 1].set(384))(sc_i)
    cases.append(("t2padmidx", scan_mid, dat_t2p, 2, "t2"))
    for d in (2, 4):
        scan_p, data_p, _, _, rows_d = slabs.partition_slabs(
            scan, data, g, d)
        sc_pi = jax.jit(patches.scan_to_int)(jnp.asarray(scan_p))
        cases.append((f"slab{d}", sc_pi,
                      (lambda dp=data_p: dp), d, "stacked", rows_d))
        # PRE-STACKED: the (t*D, s_per, nd, nd) data reshape done ONCE
        # outside the loop -- isolates whether the flat ~3.4 ms/eval
        # stacked overhead is an unhoisted per-call relayout copy of
        # the constant data array.
        def dstk(dp=data_p, d=d):
            return jax.jit(lambda x: x.reshape(
                (x.shape[0] * d, x.shape[1] // d) + x.shape[2:]))(dp)

        cases.append((f"slab{d}pre", sc_pi, dstk, d, "stacked", rows_d))
        # WINDOW control: no reshape at all (prefetch-scalar offsets),
        # D separate dispatches -- separates relayout cost from
        # per-dispatch cost.
        cases.append((f"slab{d}win", sc_pi,
                      (lambda dp=data_p: dp), d, "window", rows_d))
        # DIRECT control: the raw stacked kernel with ALL slab prep
        # (object pad/stack, scan localization, probe tile) hoisted out
        # of the loop -- the chain carries the stacked object itself.
        # If this matches 'whole', the overhead is the wrappers' object
        # prep; if it stays slow, it is intrinsic to the stacked
        # operand shapes inside the kernel.
        cases.append((f"slab{d}direct", sc_pi, dstk, d, "direct", rows_d))

    # padH<H>: slab2's stacked sub-objects (ext=384 rows) zero-padded
    # BELOW to H rows before the kernel (extra rows are never gathered
    # -- y_loc + window <= 384+8 -- so semantics are unchanged). The
    # production sub-object runs at hz = H + 8; whole-object 512^2
    # (hz=520=pow2+8) is fast while ext=384 (hz=392) is slow, so this
    # scans which block heights Mosaic's dynamic gather likes.
    scan_p2b, data_p2b, _, _, rows2b = slabs.partition_slabs(scan, data, g, 2)
    sc_p2bi = jax.jit(patches.scan_to_int)(jnp.asarray(scan_p2b))
    for H in (384, 416, 448, 512):
        st2 = jax.jit(lambda p, s_, pr_, H=H: jnp.pad(
            slabs._stacked_args(p, s_, s_[..., :1], None, pr_, 2)[0],
            ((0, 0), (0, H - 384), (0, 0))))
        psiH = st2(psi0, sc_p2bi, prb)
        scH = jax.jit(lambda s_: slabs._stacked_args(
            jnp.zeros((1, 512, 512), jnp.complex64), s_, s_[..., :1],
            None, prb, 2)[1])(sc_p2bi)
        cases.append((f"padH{H}", (psiH, scH),
                      (lambda dp=data_p2b: dp.reshape(
                          (2, dp.shape[1] // 2) + dp.shape[2:])),
                      2, "padH"))

    # stagger8: slab2 sub-objects (block height 400) with block 1's
    # rows starting 8 EARLIER (248 instead of 256), so the two blocks'
    # localized y VALUES differ by 8 everywhere -- tests whether equal
    # y values ACROSS blocks (the last standing discriminator: padH512
    # localized slow, t2sortpad global fast) is the trigger.
    h2 = 256
    psi_stg = jax.jit(lambda p: jnp.stack([
        jnp.pad(p, ((0, 0), (0, 136), (0, 0)))[0, 0:400],
        jnp.pad(p, ((0, 0), (0, 136), (0, 0)))[0, 248:648],
    ]))(psi0)
    sp2b = sc_p2bi.shape[1] // 2
    y2 = sc_p2bi[..., 0]
    off_k = jnp.where(jnp.arange(sc_p2bi.shape[1]) < sp2b, 0, h2 - 8)
    y_stg = jnp.where(y2 < 0, y2, y2 - off_k[None, :])
    sc_stg = jax.jit(lambda ys, s_: jnp.stack(
        [ys, s_[..., 1]], -1).reshape(2, sp2b, 2))(y_stg, sc_p2bi)
    cases.append(("stagger8", (psi_stg, sc_stg),
                  (lambda dp=data_p2b: dp.reshape(
                      (2, dp.shape[1] // 2) + dp.shape[2:])),
                  2, "padH"))

    for kind in ("minf", "grad"):
        for case in cases:
            name, sc, dat, d, impl = case[:5]
            rows = case[5] if len(case) > 5 else None
            if FILT and FILT not in name and name != "whole":
                continue
            # (data built lazily per case -- keeping every ~1 GB data
            # variant alive exhausted HBM once the case matrix grew)
            if impl == "padH":
                if kind == "grad":
                    continue
                psiH0, scH = sc
                prbH = jax.jit(lambda p: jnp.concatenate([p, p], 0))(
                    prb)

                def one(p, prb_, dat_, sc_):
                    m = pallas_fused.minf_fused(
                        p, dat_, sc_, prb_, g.ndet, "gaussian",
                        precision=PREC)
                    return p * (1.0 + 0.0 * m)

                p0, prb_c, sc_c = psiH0, prbH, scH
            elif impl == "t2":
                if kind == "grad":
                    continue
                psi2 = jax.jit(lambda p: jnp.concatenate([p, p], 0))(
                    psi0)
                prb2 = jax.jit(lambda p: jnp.concatenate([p, p], 0))(
                    prb)

                def one(p, prb_, dat_, sc_):
                    m = pallas_fused.minf_fused(
                        p, dat_, sc_, prb_, g.ndet, "gaussian",
                        precision=PREC)
                    return p * (1.0 + 0.0 * m)

                p0, prb_c, sc_c = psi2, prb2, sc
            elif impl == "direct":
                if kind == "grad":
                    continue  # minf isolates it; grad adds nothing new
                st = jax.jit(
                    lambda p, s_, pr_, d=d, rows=rows: slabs._stacked_args(
                        p, s_, s_[..., :1], None, pr_, d,
                        slab_rows=rows))
                psi_st0, scan_st, _, _, prb_st, _ = st(psi0, sc, prb)

                def one(p, prb_, dat_, sc_):
                    m = pallas_fused.minf_fused(
                        p, dat_, sc_, prb_, g.ndet, "gaussian",
                        precision=PREC)
                    return p * (1.0 + 0.0 * m)

                p0, prb_c, sc_c = psi_st0, prb_st, scan_st
            else:
                if kind == "minf":
                    def one(p, prb_, dat_, sc_, d=d, impl=impl, rows=rows):
                        if d == 1:
                            m = pallas_fused.minf_fused(
                                p, dat_, sc_, prb_, g.ndet, "gaussian",
                                precision=PREC)
                        else:
                            m = slabs.minf_fused_slabs(
                                p, dat_, sc_, prb_, g.ndet, "gaussian",
                                d, precision=PREC, impl=impl,
                                slab_rows=rows)
                        # serialize: multiply by exactly 1 carrying m
                        return p * (1.0 + 0.0 * m)
                else:
                    def one(p, prb_, dat_, sc_, d=d, impl=impl, rows=rows):
                        if d == 1:
                            gr, m = pallas_fused.grad_fused(
                                p, dat_, sc_, prb_, g.ndet, "gaussian",
                                precision=PREC, adj_precision=None)
                        else:
                            gr, m = slabs.grad_fused_slabs(
                                p, dat_, sc_, prb_, g.ndet, "gaussian",
                                d, precision=PREC, adj_precision=None,
                                impl=impl, slab_rows=rows)
                        return p + 0.0 * gr

                p0, prb_c, sc_c = psi0, prb, sc

            @jax.jit
            def chain(p, prb_, dat_, sc_):
                def body(i, p):
                    return one(p, prb_, dat_, sc_)
                return jax.lax.fori_loop(0, N, body, p)

            dat_arr = dat()   # lazily build this case's data copy
            out = chain(p0, prb_c, dat_arr, sc_c)   # compile + warm
            sync(out)
            t0 = time.time()
            out = chain(p0, prb_c, dat_arr, sc_c)
            out = chain(out, prb_c, dat_arr, sc_c)
            sync(out)
            dt = max(time.time() - t0 - overhead, 1e-9)
            ms = dt / (2 * N) * 1000
            print(f"{kind} {name}: {ms:.2f} ms/eval "
                  f"({2*N} evals in {dt:.2f}s)", flush=True)
            del dat_arr, out


if __name__ == "__main__":
    main()
