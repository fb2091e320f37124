"""Offline xd-1D solver CLI.

Rebuild of /root/reference/src/run_solver_3d1d.py +
``haznics.fenics_metric_solver_xd_1d`` (the all-native pipeline the shim
wraps, SURVEY.md §3.4): parse a HAZmath-style ``.dat`` config, load the
dumped COO system (A.npy/b.npy/idofs.npy/idofs3d.npy), solve with
metric-AMG-preconditioned Krylov as one jitted XLA program, write
``solution.txt`` (length-prefixed).

Usage:
    python -m tpuamg.problems.run_solver_3d1d -infile INPUT.dat \
        -indir DATA_DIR -outdir OUT_DIR
"""
from __future__ import annotations

import argparse
import os

from ..io_utils import (print_red, load_system, write_solution,
                        dat_to_amg_parameters)
from .solve import solve_system


def main(argv=None):
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("-infile", type=str,
                        default="./tpuamg/problems/input_metric.dat",
                        help="Solver input file")
    parser.add_argument("-indir", type=str, default="./data/emi_3d1d/",
                        help="Directory with matrices (.npy)")
    parser.add_argument("-outdir", type=str, default="./results/emi_3d1d/",
                        help="Directory to output solution")
    parser.add_argument("-algebraic_below", type=int,
                        default=1_000_000_000,
                        help="structured-path real-dof threshold below "
                        "which levels switch to the algebraic "
                        "metric-AMG tail (gamma-robust: HEM aggregation "
                        "follows the gamma-heavy edges, which geometric "
                        "window coarsening cannot).  Default = "
                        "everything: window levels above the tail are "
                        "NOT gamma-robust at production curve densities "
                        "(measured round 4, docs/PERF_NOTES.md — stalls "
                        "at gamma=1e8 in full f64, so not a precision "
                        "artifact), and the tail now runs as a HOST f64 "
                        "program (krylov.pcg_split), so its size no "
                        "longer costs device time.  Set a finite "
                        "threshold to re-enable window levels for "
                        "experiments; 0 = pure structured.")
    parser.add_argument("-keep_idofs", type=int, default=0,
                        help="L > 0: keep interface dofs uncoarsened "
                        "(injected) through at most L structured window "
                        "levels — the gamma-robust window coarse space "
                        "(metricAMG idofs contract applied to the "
                        "window hierarchy; amg/structured."
                        "setup_structured).  Use with a finite "
                        "-algebraic_below so the gamma machinery lands "
                        "in a SMALLER tail; 0 = off (full-tail "
                        "production default).  CAVEAT (measured round "
                        "5): on TPU the window levels store the gamma "
                        "rows entrywise in f32, which costs extra "
                        "iterations at gamma>=1e8 (n=16 dump: ~2x the "
                        "f64 count) and plateaus ~3e-4 at the n=64 "
                        "production dump — extreme-gamma device levels "
                        "need a factored per-level gamma storage, "
                        "open.")
    parser.add_argument("-pallas", type=str, default="auto",
                        choices=("auto", "off"),
                        help="Pallas kernels for the device-side "
                        "factored outer matvec (the fused DIA kernel "
                        "on the AD part).  MEASURED on the chip at the "
                        "n=64 production dump (round 5, interleaved "
                        "A/B): auto 144.5/136.8 s solve wall vs off "
                        "201.6/153.4 s, identical 77 iterations — "
                        "auto halves the per-iteration device cost "
                        "(~0.6 vs ~1.1 s) and is the default.  'off' "
                        "kept for debugging kernel regressions.")
    args, _ = parser.parse_known_args(argv)

    import faulthandler
    import signal
    # kill -USR1 <pid> dumps all python stacks without killing the run
    # (the remote runtime gives no other observability mid-solve)
    faulthandler.register(signal.SIGUSR1)

    print_red("Path to solver input file: " + args.infile)
    print_red("Path to matrices directory: " + args.indir)
    print_red("Path to output directory: " + args.outdir)

    assert os.path.exists(args.infile)
    assert os.path.exists(args.indir)
    os.makedirs(args.outdir, exist_ok=True)

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)
    import tpuamg
    tpuamg.enable_compilation_cache()   # multilevel compiles take
    #                                     minutes; reruns hit the cache

    amg_params, solver_cfg = dat_to_amg_parameters(args.infile)
    from ..io_utils import load_coupling
    A, b, idofs, idofs3d, coords = load_system(args.indir,
                                               with_coords=True)
    # optional metric factorization dump (Pi/Mq/gamma — our extension):
    # lets the structured path apply the outer operator in FACTORED
    # form, which f32 storage needs at large gamma
    # (solve._split_metric_operator)
    coupling = load_coupling(args.indir)
    sizes = (len(idofs3d), len(b) - len(idofs3d))
    # coords.npy present (our extension of the reference dump layout) AND
    # running on TPU -> the structured gather-free path (DIA + footprint
    # blocks); otherwise the algebraic ELL path (reference parity; also
    # the fastest CPU path: fewer, cheaper iterations).
    use_structured = coords is not None and \
        jax.default_backend() == "tpu"
    # On TPU the device Krylov runs in f32 (halves the tunnel-bound
    # hierarchy transfer, enables the Pallas DIA kernels — f64 is
    # software-emulated on TPU) and mixed-precision refinement restores
    # the .dat tolerance as a TRUE-residual target (solve_system docs).
    f32_dev = jax.default_backend() == "tpu"
    from dataclasses import replace
    # Clustered footprint Schwarz (round 4): at production curve
    # densities the reference's seed-per-interface-dof blocks overlap
    # ~40 deep and nearly coincide — 10k x ~400^2 dense inverses
    # (hours of setup) that ALSO smooth worse (stale-residual sweeps
    # over the same gamma-chain).  Merging overlapping blocks
    # (smoothers.schwarz_setup.merge_overlapping_blocks) gives ~16x
    # fewer blocks, seconds of setup, and converges where the per-seed
    # layout h-degrades (probe_clu2: 24 iters at n=16 production
    # density, gamma=1e8).
    amg_params = replace(amg_params, schwarz_cluster=True)
    if f32_dev and args.algebraic_below:
        # TPU tail hygiene (round-3 watchdog fix, docs/PERF_NOTES.md):
        # cap the multicolor-GS color count at 6 — measured identical
        # gamma sweep to the full 24-color GS (11->13 iters over ten
        # decades, scripts/exp_3d1d_tail.py dat_gs6) at 1/4 the
        # gather/scatter op count, which is what the tail's ~5 ms/op
        # remote-runtime cost punishes
        amg_params = replace(amg_params, gs_max_colors=6)
    rep = solve_system(A, b, "metric_hazmath", sizes, idofs=idofs,
                       params=amg_params, tol=solver_cfg.tolerance,
                       maxiter=solver_cfg.maxiter,
                       method=solver_cfg.method,
                       stop_type=solver_cfg.stop_type,
                       dtype=jnp.float32 if f32_dev else jnp.float64,
                       # f64 Krylov vectors over f32-stored operators:
                       # f32 CG arithmetic stalls ~1e-2 on the metric
                       # systems (solve_system krylov_dtype docs) while
                       # the f32 storage keeps the tunnel transfers
                       # halved; refinement absorbs the storage
                       # perturbation
                       krylov_dtype=jnp.float64 if f32_dev else None,
                       refine=3 if f32_dev else 0,
                       inner_tol=max(solver_cfg.tolerance, 2e-5),
                       # watchdog-safe launches: a tail PCG iteration
                       # executes in seconds on the remote runtime
                       # (~5 ms per gather/scatter op regardless of
                       # size), so ONE iteration per launch keeps every
                       # execution far below the worker's ~60-90 s
                       # limit; the per-launch round trip (~0.1 s) is
                       # noise against that.  Measured: chunk=32 is
                       # watchdog-killed, chunk=1 completes
                       # (scripts/tpu_tail_bisect.py hyb_pcg1)
                       chunk=1 if (f32_dev and args.algebraic_below)
                       else None,
                       # HOST-side f64 tail (krylov.pcg_split): the
                       # remote runtime's ~5 ms/gather-op pricing made
                       # the on-device tail cycle ~2.5 s; as a CPU
                       # program between two device launches it is ~ms,
                       # removing the watchdog constraint entirely
                       host_tail=f32_dev and bool(args.algebraic_below),
                       pallas=None if args.pallas == "auto" else False,
                       structured_coords=coords if use_structured
                       else None,
                       coupling=coupling if use_structured else None,
                       algebraic_below=args.algebraic_below,
                       keep_idofs=args.keep_idofs,
                       # tiled-lattice slot order when the bulk is a
                       # clean grid (O(stencil) DIA offsets at ANY size
                       # — the Morton rank order smears to ~80k distinct
                       # offsets at production scale), Morton fallback
                       structured_order="auto")
    print_red(f"niters={rep.niters} converged={rep.converged} "
              f"setup={rep.t_setup:.2f}s solve={rep.t_solve:.2f}s")
    path = write_solution(args.outdir, rep.x)
    print_red(f"Solution written to {path}")
    return rep


if __name__ == "__main__":
    main()
