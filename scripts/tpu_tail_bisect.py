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

DATA = os.path.join("results", "scale_3d1d", "data_n8_g1e8")

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
    prec = setup_amg(A, prm, idofs=np.asarray(idofs))
    mark(f"setup_amg done levels={len(prec.levels)} "
         f"({time.time()-t0:.1f}s)")
    for i, L in enumerate(prec.levels):
        sm = L.smoother
        mark(f"  level {i}: n={L.A.shape[0]} L={L.A.row_width} "
             f"nc={L.nc} smoother={type(sm).__name__}")
    mark(f"  coarse: {prec.coarse_inv.shape}")

    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.standard_normal(L.A.shape[0]), dtype=dtype)
          for L in prec.levels]
    bs = [jnp.asarray(rng.standard_normal(L.A.shape[0]), dtype=dtype)
          for L in prec.levels]

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

    if "hybrid" in stages or any(s.startswith("hyb_") for s in stages):
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
        if "hybrid" in stages or "hyb_pcg" in stages:
            from tpuamg.krylov import pcg
            t0 = time.time()
            M = as_operator(hprec)
            r = pcg(dia_matvec_op(Hop), hb, M=M, tol=1e-5, maxiter=40)
            fetch(r.x)
            mark(f"hyb pcg ok niters={r.niters} "
                 f"converged={r.converged} ({time.time()-t0:.1f}s)")

    if "solve" in stages:
        t0 = time.time()
        rep = solve_system(A, b, "metric_hazmath", sizes,
                           idofs=idofs, params=amg_params, tol=1e-6,
                           maxiter=solver_cfg.maxiter,
                           dtype=dtype, refine=3, inner_tol=2e-5,
                           pallas=False,
                           structured_coords=coords,
                           algebraic_below=60000,
                           structured_order="auto")
        mark(f"full solve ok niters={rep.niters} "
             f"converged={rep.converged} ({time.time()-t0:.1f}s)")

    mark("ALL STAGES PASSED")


if __name__ == "__main__":
    main()
