"""On-chip gamma sweep: bidomain_2d metric (grid path) at n=512 to a
true-residual tolerance of 1e-8 (round-2 verdict item 9 — all committed
iteration tables were CPU-executed; this one runs on the TPU).

f32 device cycles bottom out ~1e-6 relative, so each gamma solve runs
mixed-precision iterative refinement (solve_system refine=4): f64 host
defects + f32 device PCG, tol = TRUE-residual target — the same route
the offline 3D-1D TPU path takes.  One compile serves all gammas (same
shapes; persistent cache reused across runs).

  python scripts/tpu_gamma_sweep.py [n] [outfile]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

import tpuamg
tpuamg.enable_compilation_cache()

from dataclasses import replace
from tpuamg.fem import mms
from tpuamg.problems.bidomain import Params, get_mesh, get_system
from tpuamg.problems.solve import solve_system
from tpuamg.config import PRESETS

GAMMAS = [1e0, 1e2, 1e4, 1e6, 1e8, 1e10]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        "docs", "sample_results", f"bidomain_2d_tpu_gamma_n{n}.txt")
    prm = replace(PRESETS["metric_schwarz"], dtype="float32",
                  cycle_type="v", coarse_dof=4096)
    rows = []
    for g in GAMMAS:
        params = Params(2.0, 3.0, g)
        data = mms.setup_bidomain_mms(params, dim=2)
        t0 = time.time()
        mesh = get_mesh(n, 2)
        A, b, sizes, _ = get_system(mesh, data, params)
        t_asm = time.time() - t0
        rep = solve_system(A, b, "metric_mono", sizes, tol=1e-8,
                           maxiter=200, grid=((n + 1, n + 1), 2),
                           params=prm, dtype=jnp.float32,
                           refine=4, inner_tol=2e-5)
        per_pass = "+".join(str(k) for k in rep.pass_iters) or "-"
        rows.append((g, sum(sizes), rep.niters, per_pass, rep.converged,
                     rep.r_norm, rep.t_setup, rep.t_solve, t_asm))
        print(f"gamma={g:.0e} dofs={sum(sizes)} iters={rep.niters} "
              f"({per_pass}) conv={rep.converged} "
              f"true_rel_r={rep.r_norm:.2e} "
              f"setup={rep.t_setup:.1f}s solve={rep.t_solve:.1f}s",
              flush=True)
    dev = jax.devices()[0].platform
    with open(out, "w") as f:
        f.write(f"# bidomain_2d metric (grid path) n={n} ON-CHIP "
                f"(device={dev}); tol 1e-8 TRUE relative residual via "
                "f32 device PCG + f64 iterative refinement "
                "(scripts/tpu_gamma_sweep.py)\n")
        f.write("# niters SUMS the refinement passes (pass_iters column"
                " = per-pass Krylov counts to inner_tol 2e-5); compare "
                "pass_iters, not niters, against the single-solve f64 "
                "CPU tables in docs/sample_results/.\n")
        f.write("gamma ndofs niters pass_iters converged true_rel_r "
                "setup_s solve_s asm_s\n")
        for r in rows:
            f.write(" ".join(str(v) for v in r) + "\n")
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
