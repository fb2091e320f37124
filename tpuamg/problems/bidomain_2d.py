"""Bidomain 2D experiment driver.

CLI-compatible rebuild of /root/reference/src/bidomain_2d.py:105-278:
refinement sweep ncells = 2^5 .. 2^(4+nrefs), preconditioner dispatch
('diag' | 'hazmath' | 'hazmath_Schwarz' | 'hazmath_HEM' | 'metric' |
'metric_mono' | 'metric_hazmath'), PCG to 1e-8, iteration/cond/error
tables to results/bidomain_2d/.

Run:  python -m tpuamg.problems.bidomain_2d -nrefs 3 -gamma 1e6 \
        -precond metric_mono
"""
from __future__ import annotations


import numpy as np

from ..fem import mms
from ..io_utils import print_red
from .bidomain import Params, get_mesh, get_system, compute_errors
from .solve import solve_system
from .driver import standard_parser, ExperimentTables, config_tag

PRECONDS = ("diag", "hazmath", "hazmath_Schwarz", "hazmath_HEM",
            "metric", "metric_mono", "metric_hazmath")


def run(args, dim=2, start_exp=5, name="bidomain_2d"):
    import jax
    jax.config.update("jax_enable_x64", True)

    params = Params(args.kappa1, args.kappa2, args.gamma)
    print_red(str(params))
    data = mms.setup_bidomain_mms(params, dim=dim)

    tables = ExperimentTables(f"./results/{name}/", config_tag(args))
    dtype = np.float64 if args.dtype == "float64" else np.float32

    for ncells in (2 ** i for i in range(start_exp, start_exp + args.nrefs)):
        mesh = get_mesh(ncells, dim)
        A, b, sizes, _ = get_system(mesh, data, params,
                                    pdegree=args.pdegree)
        idofs = np.arange(sizes[0], sizes[0] + sizes[1])

        blocks = None
        if args.precond == "diag":
            from ..sparse.host import extract_diag_blocks
            blocks = extract_diag_blocks(A, sizes)

        # parameter dispatch of bidomain_2d.py:194-201: metric family uses
        # parameters_metric_schwarz explicitly (maxlvl=1)
        from ..config import PRESETS
        amg_params = PRESETS["metric_schwarz"] if args.precond in (
            "metric", "metric_mono", "metric_hazmath") else None

        grid = None
        if getattr(args, "backend", "algebraic") == "grid" \
                and args.pdegree == 1:   # grid path is P1 (vertex dofs)
            grid = ((ncells + 1,) * dim, 2)

        rep = solve_system(A, b, args.precond, sizes, idofs=idofs,
                           params=amg_params,
                           blocks=blocks, tol=1e-8, maxiter=500,
                           dtype=dtype, grid=grid,
                           timing_runs=getattr(args, "timing_runs", 1))
        ksp_dt = rep.t_setup + rep.t_solve

        e1, e2 = compute_errors(mesh, data, rep.x, sizes,
                                pdegree=args.pdegree)
        tables.add(sum(sizes), rep.niters, rep.cond, ksp_dt, rep.r_norm,
                   mesh.hmin(), [e1, e2])
        tables.show()

    if args.save:
        # PVD/VTU output role of bidomain_2d.py:276-278
        from ..io_utils.vtk import write_vtu
        base = f"./results/{name}/uh{{}}_{config_tag(args)}.vtu"
        write_vtu(base.format(0), mesh, rep.x[:sizes[0]])
        write_vtu(base.format(1), mesh, rep.x[sizes[0]:])
    return tables


if __name__ == "__main__":
    parser = standard_parser("hazmath", PRECONDS)
    args, _ = parser.parse_known_args()
    run(args)
