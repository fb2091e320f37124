"""Bisect the axon TPU worker crash in the algebraic metric tail.

Round-2 finding (docs/PERF_NOTES.md): run_solver_3d1d with
-algebraic_below 60000 crashes the TPU worker even at mesh_n=8 with
pallas=False, while the pure structured path completes.  At mesh_n=8
that threshold makes the WHOLE hierarchy algebraic, so the fault is in
the plain ELL metric path's device code (ELL gathers, multicolor GS,
batched Schwarz, agg transfers, coarse inverse, or the jitted PCG).

This script runs those pieces ONE AT A TIME on the real chip with a
value-fetch sync and a flushed marker after each; the last marker
printed before the worker dies names the faulting op.

  # once, on CPU: dump the test system
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python -m tpuamg.problems.emi_3d1d -gamma 100000000 -radius 0.2 \
    -dump 1 -outdir results/scale_3d1d/data_n8_g1e8 -mesh_n 8
  # then, on TPU (plain python, nothing else on the tunnel):
  python scripts/tpu_tail_bisect.py [stage ...]

Stages: sanity ell gs schwarz metric restrict coarse cycle pcg solve
(default: all, in that order).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

DATA = os.environ.get("TPUAMG_BISECT_DATA",
                      os.path.join("results", "scale_3d1d",
                                   "data_n8_g1e8"))

import numpy as np
import jax
import jax.numpy as jnp

import tpuamg
tpuamg.enable_compilation_cache()
jax.config.update("jax_enable_x64", True)   # match run_solver_3d1d


def mark(msg):
    print(f"[bisect] {msg}", flush=True)


def fetch(x):
    """True device sync: value fetch (block_until_ready is not a
    completion barrier on the axon runtime — CLAUDE.md hazard 2)."""
    arr = np.asarray(x)
    assert np.all(np.isfinite(arr)), "non-finite result"
    return arr


def main():
    stages = sys.argv[1:] or ["sanity", "ell", "gs", "schwarz", "metric",
                              "restrict", "coarse", "cycle", "pcg",
                              "solve"]
    mark(f"backend={jax.default_backend()} stages={stages}")

    from tpuamg.io_utils import load_system, dat_to_amg_parameters
    from tpuamg.problems.solve import solve_system, make_preconditioner
    amg_params, solver_cfg = dat_to_amg_parameters(
        "tpuamg/problems/input_metric.dat")
    A, b, idofs, idofs3d, coords = load_system(DATA, with_coords=True)
    sizes = (len(idofs3d), len(b) - len(idofs3d))
    mark(f"system loaded n={A.shape[0]} nnz={A.nnz} sizes={sizes}")

    dtype = jnp.float32
    from dataclasses import replace
    prm = replace(amg_params, dtype="float32")

    if "sanity" in stages:
        y = fetch(jnp.ones(1024) * 2.0)
        mark(f"sanity ok sum={y.sum()}")

    from tpuamg.amg.hierarchy import setup_amg, as_operator
    t0 = time.time()
    # TPUAMG_BISECT_SKIP_ALG=1 skips the script-level plain-algebraic
    # hierarchy (minutes of host setup at production sizes; only the
    # hybrid stages are wanted there)
    prec = (None if os.environ.get("TPUAMG_BISECT_SKIP_ALG")
            else setup_amg(A, prm, idofs=np.asarray(idofs)))
    rng = np.random.default_rng(0)
    if prec is not None:
        mark(f"setup_amg done levels={len(prec.levels)} "
             f"({time.time()-t0:.1f}s)")
        for i, L in enumerate(prec.levels):
            sm = L.smoother
            mark(f"  level {i}: n={L.A.shape[0]} L={L.A.row_width} "
                 f"nc={L.nc} smoother={type(sm).__name__}")
        mark(f"  coarse: {prec.coarse_inv.shape}")
        xs = [jnp.asarray(rng.standard_normal(L.A.shape[0]),
                          dtype=dtype) for L in prec.levels]
        bs = [jnp.asarray(rng.standard_normal(L.A.shape[0]),
                          dtype=dtype) for L in prec.levels]

    if "ell" in stages:
        for i, L in enumerate(prec.levels):
            t0 = time.time()
            y = fetch(jax.jit(lambda A_, x_: A_.matvec(x_))(L.A, xs[i]))
            mark(f"ell matvec level {i} ok |y|={np.linalg.norm(y):.3e} "
                 f"({time.time()-t0:.1f}s)")

    def smooth_fn(sm_, A_, x_, b_):
        return sm_.smooth(A_, x_, b_, 1)

    if "gs" in stages or "schwarz" in stages or "metric" in stages:
        from tpuamg.smoothers.schwarz import MetricSmoother
        for i, L in enumerate(prec.levels):
            sm = L.smoother
            if isinstance(sm, MetricSmoother):
                if "gs" in stages and sm.gs is not None:
                    t0 = time.time()
                    y = fetch(jax.jit(smooth_fn)(sm.gs, L.A, xs[i], bs[i]))
                    mark(f"gs level {i} ok |y|={np.linalg.norm(y):.3e} "
                         f"({time.time()-t0:.1f}s)")
                if "schwarz" in stages:
                    t0 = time.time()
                    y = fetch(jax.jit(smooth_fn)(
                        sm.schwarz, L.A, xs[i], bs[i]))
                    mark(f"schwarz level {i} ok "
                         f"|y|={np.linalg.norm(y):.3e} "
                         f"({time.time()-t0:.1f}s)")
            if "metric" in stages:
                t0 = time.time()
                y = fetch(jax.jit(smooth_fn)(sm, L.A, xs[i], bs[i]))
                mark(f"smoother level {i} ok |y|={np.linalg.norm(y):.3e} "
                     f"({time.time()-t0:.1f}s)")

    if "restrict" in stages:
        for i, L in enumerate(prec.levels):
            t0 = time.time()
            rc = fetch(jax.jit(lambda L_, r_: L_.restrict(r_))(L, xs[i]))
            e = fetch(jax.jit(lambda L_, e_: L_.prolong(e_))(
                L, jnp.asarray(rc, dtype=dtype)))
            mark(f"restrict/prolong level {i} ok ({time.time()-t0:.1f}s)")

    if "coarse" in stages:
        t0 = time.time()
        nc = prec.coarse_inv.shape[0]
        rb = jnp.asarray(rng.standard_normal(nc), dtype=dtype)
        y = fetch(jax.jit(lambda M, r: M @ r)(prec.coarse_inv, rb))
        mark(f"coarse solve ok ({time.time()-t0:.1f}s)")

    if "cycle" in stages:
        t0 = time.time()
        M = as_operator(prec)
        y = fetch(jax.jit(lambda M_, b_: M_(b_))(M, bs[0]))
        mark(f"full cycle ok |y|={np.linalg.norm(y):.3e} "
             f"({time.time()-t0:.1f}s)")

    if "pcg" in stages:
        from tpuamg.krylov import pcg
        from tpuamg.sparse import matvec_op, ELL
        t0 = time.time()
        Aop = matvec_op(ELL.from_host(A, dtype=dtype))
        M = as_operator(prec)
        r = pcg(Aop, jnp.asarray(b, dtype=dtype), M=M, tol=1e-5,
                maxiter=40)
        fetch(r.x)
        mark(f"pcg ok niters={r.niters} converged={r.converged} "
             f"({time.time()-t0:.1f}s)")

    _BASIC = {"sanity", "ell", "gs", "schwarz", "metric", "restrict",
              "coarse", "cycle", "pcg", "solve"}
    if any(s not in _BASIC for s in stages):
        # replicate the crashing solve_system hybrid setup exactly:
        # tiled slot layout, StructuredOp outer operator, algebraic
        # metric tail built on the ghost-padded slot matrix
        from tpuamg.amg.structured import (setup_structured,
                                           structured_system)
        from tpuamg.sparse.dia import dia_matvec_op
        t0 = time.time()
        hprec, hslots, hnsl = setup_structured(
            A, coords, prm, dtype=dtype, pallas=False,
            idofs=np.asarray(idofs), order="auto",
            algebraic_below=60000)
        mark(f"hybrid setup done nsl={hnsl} "
             f"levels={len(hprec.levels)} ({time.time()-t0:.1f}s)")
        for i, L in enumerate(hprec.levels):
            mark(f"  tail level {i}: n={L.A.shape[0]} nc={L.nc} "
                 f"smoother={type(L.smoother).__name__}")
        Hop = structured_system(A, hslots, hnsl, dtype=dtype,
                                pallas=False, idofs=np.asarray(idofs))
        mark(f"outer op: {type(Hop).__name__} "
             f"ndia={len(Hop.dia.offsets) if hasattr(Hop, 'dia') else '?'}"
             f" spill={getattr(Hop, 'spill', None) is not None}")
        hb = jnp.zeros(hnsl, dtype=dtype).at[jnp.asarray(hslots)].set(
            jnp.asarray(b, dtype=dtype))
        xh = jnp.asarray(rng.standard_normal(hnsl), dtype=dtype)

        if "hybrid" in stages or "hyb_outer" in stages:
            t0 = time.time()
            y = fetch(jax.jit(lambda A_, x_: A_.matvec(x_))(Hop, xh))
            mark(f"hyb outer matvec ok |y|={np.linalg.norm(y):.3e} "
                 f"({time.time()-t0:.1f}s)")
        if "hybrid" in stages or "hyb_smooth" in stages:
            for i, L in enumerate(hprec.levels):
                t0 = time.time()
                xi = jnp.asarray(
                    rng.standard_normal(L.A.shape[0]), dtype=dtype)
                bi = jnp.asarray(
                    rng.standard_normal(L.A.shape[0]), dtype=dtype)
                y = fetch(jax.jit(smooth_fn)(L.smoother, L.A, xi, bi))
                mark(f"hyb smoother level {i} ok ({time.time()-t0:.1f}s)")
        if "hybrid" in stages or "hyb_cycle" in stages:
            t0 = time.time()
            M = as_operator(hprec)
            y = fetch(jax.jit(lambda M_, b_: M_(b_))(M, hb))
            mark(f"hyb cycle ok |y|={np.linalg.norm(y):.3e} "
                 f"({time.time()-t0:.1f}s)")
        if "hyb_scan_cycle" in stages:
            # tail cycle repeated inside a 32-trip scan (the pcg chunk
            # shape) with NO outer operator
            t0 = time.time()
            M = as_operator(hprec)

            def body(M_, b_):
                def step(s, _):
                    return M_(s), jnp.linalg.norm(s)
                out, hist = jax.lax.scan(step, b_, None, length=32)
                return out
            y = fetch(jax.jit(body)(M, hb))
            mark(f"hyb scan-cycle ok |y|={np.linalg.norm(y):.3e} "
                 f"({time.time()-t0:.1f}s)")
        def scan_fn(fn, v0, length=32):
            def body(arg, v_):
                def step(s, _):
                    return fn(arg, s), jnp.linalg.norm(s)
                out, _h = jax.lax.scan(step, v_, None, length=length)
                return out
            return body

        if "sc_sm0" in stages or "sc_sm0_gs" in stages or \
                "sc_sm0_schwarz" in stages:
            L0 = hprec.levels[0]
            v0 = jnp.asarray(rng.standard_normal(L0.A.shape[0]),
                             dtype=dtype)
            from tpuamg.smoothers.schwarz import MetricSmoother
            sm = L0.smoother
            if "sc_sm0_gs" in stages and isinstance(sm, MetricSmoother) \
                    and sm.gs is not None:
                t0 = time.time()
                y = fetch(jax.jit(scan_fn(
                    lambda a, s: a[0].smooth(a[1], s, a[2], 1),
                    v0))((sm.gs, L0.A, v0), v0))
                mark(f"scan-gs(4184) ok ({time.time()-t0:.1f}s)")
            if "sc_sm0_schwarz" in stages and isinstance(sm,
                                                         MetricSmoother):
                t0 = time.time()
                y = fetch(jax.jit(scan_fn(
                    lambda a, s: a[0].smooth(a[1], s, a[2], 1),
                    v0))((sm.schwarz, L0.A, v0), v0))
                mark(f"scan-schwarz(4184) ok ({time.time()-t0:.1f}s)")
            if "sc_sm0" in stages:
                t0 = time.time()
                y = fetch(jax.jit(scan_fn(
                    lambda a, s: a[0].smooth(a[1], s, a[2], 1),
                    v0))((sm, L0.A, v0), v0))
                mark(f"scan-metricsm(4184) ok ({time.time()-t0:.1f}s)")
        if "sc_transfer" in stages:
            t0 = time.time()

            def tr(a, s):
                prec_ = a
                r = s
                for L in prec_.levels:
                    r = L.restrict(r)
                e = prec_.coarse_inv @ r
                for L in reversed(prec_.levels):
                    e = L.prolong(e)
                # normalize per trip: the raw chain amplifies to inf
                # over 32 trips (no smoothing) — not a device fault
                return e / (jnp.linalg.norm(e) + 1e-30)
            y = fetch(jax.jit(scan_fn(tr, hb))(hprec, hb))
            mark(f"scan-transfer ok ({time.time()-t0:.1f}s)")
        if "sc_cycle4" in stages:
            t0 = time.time()
            M = as_operator(hprec)
            y = fetch(jax.jit(scan_fn(lambda m, s: m(s), hb, length=4))(
                M, hb))
            mark(f"scan-cycle len4 ok |y|={np.linalg.norm(y):.3e} "
                 f"({time.time()-t0:.1f}s)")
        if "sc_time1" in stages:
            # warm per-cycle execution time (value-fetch bracketed —
            # CLAUDE.md hazard 2) to test the watchdog theory: does one
            # tail cycle run SLOW enough that 32 scan trips exceed the
            # worker's execution limit?
            M = as_operator(hprec)
            f = jax.jit(lambda m, s: m(s))
            y = fetch(f(M, hb))          # compile + first run
            for k in range(3):
                t0 = time.time()
                y = fetch(f(M, jnp.asarray(y)))
                mark(f"single cycle warm run {k}: "
                     f"{time.time()-t0:.3f}s")
        for ln in (8, 12, 16, 24):
            if f"sc_cycle{ln}n" in stages:
                t0 = time.time()
                M = as_operator(hprec)

                def cyc_n(m, s):
                    y_ = m(s)
                    return y_ / (jnp.linalg.norm(y_) + 1e-30)
                y = fetch(jax.jit(scan_fn(cyc_n, hb, length=ln))(M, hb))
                mark(f"scan-cycle len{ln} normalized ok "
                     f"({time.time()-t0:.1f}s)")
        if "sc_cycle32n" in stages:
            # normalized: distinguishes a structural fault from an
            # overflow-to-inf artifact of the unnormalized power method
            t0 = time.time()
            M = as_operator(hprec)

            def cyc_n(m, s):
                y_ = m(s)
                return y_ / (jnp.linalg.norm(y_) + 1e-30)
            y = fetch(jax.jit(scan_fn(cyc_n, hb))(M, hb))
            mark(f"scan-cycle len32 normalized ok "
                 f"({time.time()-t0:.1f}s)")
        if "sc_nosch" in stages:
            t0 = time.time()
            prm2 = replace(prm, schwarz_levels=0)
            hp2, _sl2, _n2 = setup_structured(
                A, coords, prm2, dtype=dtype, pallas=False,
                idofs=np.asarray(idofs), order="auto",
                algebraic_below=60000)
            M2 = as_operator(hp2)
            y = fetch(jax.jit(scan_fn(lambda m, s: m(s), hb))(M2, hb))
            mark(f"scan-cycle no-schwarz ok ({time.time()-t0:.1f}s)")
        if "hyb_pcg_jac" in stages:
            # chunked pcg: StructuredOp outer + Jacobi preconditioner
            from tpuamg.krylov import pcg
            t0 = time.time()
            invd = 1.0 / Hop.diagonal()
            Mj = jax.tree_util.Partial(lambda d, r: d * r, invd)
            r = pcg(dia_matvec_op(Hop), hb, M=Mj, tol=1e-12, maxiter=40)
            fetch(r.x)
            mark(f"hyb pcg-jacobi ok niters={r.niters} "
                 f"({time.time()-t0:.1f}s)")
        if "hyb_pcg_ell" in stages:
            # chunked pcg: ELL outer operator + tail preconditioner
            from tpuamg.krylov import pcg
            from tpuamg.sparse import matvec_op, ELL, HostCSR
            t0 = time.time()
            r_, c_, v_ = A.to_coo()
            sl = np.asarray(hslots)
            mk = np.zeros(hnsl)
            mk[sl] = 1.0
            gh = np.flatnonzero(mk == 0)
            A_sl = HostCSR.from_coo(
                np.concatenate([sl[r_], gh]), np.concatenate([sl[c_], gh]),
                np.concatenate([v_, np.ones(len(gh))]), (hnsl, hnsl))
            Aell = matvec_op(ELL.from_host(A_sl, dtype=dtype))
            M = as_operator(hprec)
            r = pcg(Aell, hb, M=M, tol=1e-5, maxiter=40)
            fetch(r.x)
            mark(f"hyb pcg-ell ok niters={r.niters} "
                 f"converged={r.converged} ({time.time()-t0:.1f}s)")
        if "sync_test" in stages:
            # hypothesis: solve_system hangs because _pcg_init is
            # dispatched IMMEDIATELY behind ~40 async hierarchy
            # transfers (no sync point); every passing bisect stage
            # fetched between setup and compute.  Variant A syncs after
            # setup; variant B does not (reproduces the solve flow).
            import faulthandler
            faulthandler.dump_traceback_later(120, repeat=True)
            from tpuamg.krylov import pcg
            for tag, sync in (("synced", True), ("nosync", False)):
                t0 = time.time()
                hpg, sg, ng = setup_structured(
                    A, coords, replace(prm, gs_max_colors=6),
                    dtype=dtype, pallas=False, idofs=np.asarray(idofs),
                    order="auto", algebraic_below=60000)
                Hg = structured_system(A, sg, ng, dtype=dtype,
                                       pallas=False,
                                       idofs=np.asarray(idofs))
                bg = jnp.zeros(ng, dtype=dtype).at[
                    jnp.asarray(sg)].set(jnp.asarray(b, dtype=dtype))
                if sync:
                    fetch(hpg.levels[0].A.vals[0, :1]
                          if hasattr(hpg.levels[0].A, "vals")
                          else hpg.coarse_inv[:1, :1])
                    fetch(bg[:1])
                mark(f"{tag} setup done ({time.time()-t0:.1f}s)")
                t0 = time.time()
                r = pcg(dia_matvec_op(Hg), bg, M=as_operator(hpg),
                        tol=1e-12, maxiter=3, chunk=1)
                fetch(r.x)
                mark(f"{tag} pcg ok niters={r.niters} "
                     f"({time.time()-t0:.1f}s)")
            faulthandler.cancel_dump_traceback_later()
        if "idle_test" in stages:
            # every hang happened after a multi-minute COLD compile
            # (worker idle while the host lowers/compiles); the passing
            # reruns were cache-warm.  Emulate: run one op, idle 600 s,
            # then execute — does the claim survive the idle?
            from tpuamg.krylov import pcg
            fetch(jnp.ones(8) + 1)
            mark("idle test: pre-op ok, sleeping 600 s")
            time.sleep(600)
            t0 = time.time()
            try:
                r = pcg(dia_matvec_op(Hop), hb, M=as_operator(hprec),
                        tol=1e-12, maxiter=2, chunk=1)
                fetch(r.x)
                mark(f"post-idle pcg ok ({time.time()-t0:.1f}s)")
            except Exception as e:
                mark(f"post-idle pcg FAILED {type(e).__name__}: "
                     f"{str(e)[:150]}")
        if "sc_g6" in stages:
            # g6 trigger bisect: the gs_max_colors=6 hierarchy hangs
            # the worker inside _pcg_init.  Test its pieces standalone.
            import faulthandler
            faulthandler.dump_traceback_later(120, repeat=True)
            from tpuamg.smoothers.schwarz import MetricSmoother
            for mc in (6, 8, 12):
                t0 = time.time()
                hpg, _sg, _ng = setup_structured(
                    A, coords, replace(prm, gs_max_colors=mc),
                    dtype=dtype, pallas=False, idofs=np.asarray(idofs),
                    order="auto", algebraic_below=60000)
                mark(f"g{mc} setup ({time.time()-t0:.1f}s)")
                L0 = hpg.levels[0]
                v0 = jnp.asarray(
                    rng.standard_normal(L0.A.shape[0]), dtype=dtype)
                sm = L0.smoother
                if isinstance(sm, MetricSmoother) and sm.gs is not None:
                    t0 = time.time()
                    y = fetch(jax.jit(smooth_fn)(sm.gs, L0.A, v0, v0))
                    mark(f"g{mc} gs-only ok ({time.time()-t0:.1f}s)")
                t0 = time.time()
                y = fetch(jax.jit(smooth_fn)(sm, L0.A, v0, v0))
                mark(f"g{mc} metricsm ok ({time.time()-t0:.1f}s)")
                t0 = time.time()
                y = fetch(jax.jit(lambda m, s: m(s))(
                    as_operator(hpg), hb))
                mark(f"g{mc} cycle ok ({time.time()-t0:.1f}s)")
            faulthandler.cancel_dump_traceback_later()
        if "hyb_pcg1g6" in stages:
            # same as hyb_pcg1 but the hierarchy built with
            # gs_max_colors=6 (the ONLY program difference between the
            # working hyb_pcg1 stage and the hanging full solve)
            import faulthandler
            faulthandler.dump_traceback_later(120, repeat=True)
            from tpuamg.krylov import pcg
            t0 = time.time()
            hp6, _s6, _n6 = setup_structured(
                A, coords, replace(prm, gs_max_colors=6), dtype=dtype,
                pallas=False, idofs=np.asarray(idofs), order="auto",
                algebraic_below=60000)
            mark(f"g6 setup done ({time.time()-t0:.1f}s)")
            t0 = time.time()
            r = pcg(dia_matvec_op(Hop), hb, M=as_operator(hp6),
                    tol=1e-12, maxiter=3, chunk=1)
            fetch(r.x)
            mark(f"hyb pcg chunk1 g6 ok niters={r.niters} "
                 f"({time.time()-t0:.1f}s)")
            faulthandler.cancel_dump_traceback_later()
        if "hyb_pcg1" in stages:
            # chunk=1, 3 iterations, stack dumps: does ONE scan trip
            # execute at all?
            import faulthandler
            faulthandler.dump_traceback_later(120, repeat=True)
            from tpuamg.krylov import pcg
            t0 = time.time()
            M = as_operator(hprec)
            r = pcg(dia_matvec_op(Hop), hb, M=M, tol=1e-12, maxiter=3,
                    chunk=1)
            fetch(r.x)
            mark(f"hyb pcg chunk1 ok niters={r.niters} "
                 f"({time.time()-t0:.1f}s)")
            faulthandler.cancel_dump_traceback_later()
        if "hybrid" in stages or "hyb_pcg" in stages:
            from tpuamg.krylov import pcg
            t0 = time.time()
            M = as_operator(hprec)
            r = pcg(dia_matvec_op(Hop), hb, M=M, tol=1e-5, maxiter=40)
            fetch(r.x)
            mark(f"hyb pcg ok niters={r.niters} "
                 f"converged={r.converged} ({time.time()-t0:.1f}s)")

    if "launch_probe" in stages:
        # how many back-to-back launches of the tail chunk program
        # before the worker wedges?  Drives _pcg_scan_chunk manually
        # with a value fetch after every launch, marking each.
        import faulthandler
        faulthandler.dump_traceback_later(180, repeat=True)
        from tpuamg.krylov.cg import _pcg_scan_chunk, _pcg_init
        Afn = dia_matvec_op(Hop)
        M = as_operator(hprec)
        x, r, z, p, rz, rn0 = _pcg_init(Afn, M, hb,
                                        jnp.zeros_like(hb))
        mark(f"probe init ok rnorm={float(rn0):.3e}")
        t_all = time.time()
        for k in range(60):
            t0 = time.time()
            (x, r, z, p, rz), outs = _pcg_scan_chunk(
                Afn, M, x, r, z, p, rz, 1)
            o = np.asarray(outs)
            mark(f"launch {k} ok res={o[0,2]:.3e} "
                 f"({time.time()-t0:.1f}s, total "
                 f"{time.time()-t_all:.0f}s)")
        faulthandler.cancel_dump_traceback_later()
    if "solve_knobs" in stages:
        # knob isolation: solve_system with the tail, adding one real
        # knob at a time — finds which of refine/stop_type/maxiter
        # separates the hanging full solve from the passing direct pcg
        import faulthandler
        faulthandler.dump_traceback_later(180, repeat=True)
        from dataclasses import replace as _rep
        base = dict(idofs=idofs, tol=1e-5, maxiter=3, dtype=dtype,
                    pallas=False, chunk=1, structured_coords=coords,
                    algebraic_below=60000, structured_order="auto",
                    params=_rep(amg_params, gs_max_colors=6))
        for tag, kw in (
                ("minimal", {}),
                ("stop1", dict(stop_type=1)),
                ("maxit1000", dict(maxiter=1000, tol=1e-6)),
                ("refine3", dict(refine=3, inner_tol=2e-5, tol=1e-6)),
        ):
            t0 = time.time()
            rep = solve_system(A, b, "metric_hazmath", sizes,
                               **{**base, **kw})
            mark(f"solve_knobs {tag} ok niters={rep.niters} "
                 f"({time.time()-t0:.1f}s)")
        faulthandler.cancel_dump_traceback_later()
    if "solve" in stages:
        # periodic all-thread stack dumps: the full solve has hung at
        # ~46 s CPU (futex wait) on three separate runs — find where
        import faulthandler
        faulthandler.dump_traceback_later(240, repeat=True)
        t0 = time.time()
        from dataclasses import replace as _rep
        rep = solve_system(A, b, "metric_hazmath", sizes,
                           idofs=idofs,
                           params=_rep(amg_params, gs_max_colors=6),
                           tol=1e-6,
                           maxiter=solver_cfg.maxiter,
                           dtype=dtype, refine=3, inner_tol=2e-5,
                           pallas=False,
                           chunk=int(os.environ.get(
                               "TPUAMG_BISECT_CHUNK", "1")),
                           structured_coords=coords,
                           algebraic_below=60000,
                           structured_order="auto")
        mark(f"full solve ok niters={rep.niters} "
             f"converged={rep.converged} ({time.time()-t0:.1f}s)")

    mark("ALL STAGES PASSED")


if __name__ == "__main__":
    main()
