"""EMI 2D experiment driver.

Rebuild of /root/reference/src/emi_2d.py:133-263: split unit square,
interface-trace coupled system, preconditioner 'diag' | 'metric',
PCG to 1e-10, sweep ncells = 2^6 .. 2^(5+nrefs) (emi_2d.py:190).

Run:  python -m tpuamg.problems.emi_2d -nrefs 2 -precond metric
"""
from __future__ import annotations


import numpy as np

from ..fem import mms
from ..io_utils import print_red
from .emi import Params, split_meshes, get_system, compute_errors
from .solve import solve_system
from .driver import standard_parser, ExperimentTables, config_tag

PRECONDS = ("diag", "metric")


def run(args, dim=2, start_exp=6, name="emi_2d"):
    import jax
    jax.config.update("jax_enable_x64", True)

    params = Params(args.kappa1, args.kappa2, args.gamma)
    print_red(str(params))
    data = mms.setup_emi_mms(params, dim=dim)

    tables = ExperimentTables(f"./results/{name}/", config_tag(args))
    dtype = np.float64 if args.dtype == "float64" else np.float32

    for ncells in (2 ** i for i in range(start_exp, start_exp + args.nrefs)):
        mesh1, mesh2, interface = split_meshes(ncells, dim)
        A, b, sizes, interface_dofs = get_system(mesh1, mesh2, interface,
                                                 data, params,
                                                 pdegree=args.pdegree)
        if dim == 3:
            # union over both interface sides, second offset by n1
            # (emi_3d.py:134-138)
            if args.pdegree == 2:
                from ..fem.pk import P2Space
                other = P2Space(mesh2).boundary_dofs((1,)) + sizes[0]
            else:
                from ..fem import embed_vertices
                other = embed_vertices(interface, mesh2) + sizes[0]
            interface_dofs = np.unique(np.concatenate(
                [interface_dofs, other]))

        blocks = None
        if args.precond == "diag":
            from ..sparse.host import extract_diag_blocks
            blocks = extract_diag_blocks(A, sizes)

        coords = None
        if getattr(args, "backend", "algebraic") == "grid" \
                and args.pdegree == 1:   # vertex-dof layout only
            # split meshes aren't one grid; use the general gather-free
            # pair+Morton structured path keyed on dof coordinates
            coords = np.concatenate([mesh1.vertices, mesh2.vertices],
                                    axis=0)

        rep = solve_system(A, b, args.precond, sizes,
                           idofs=interface_dofs, blocks=blocks,
                           tol=1e-10, maxiter=500, dtype=dtype,
                           structured_coords=coords,
                           timing_runs=getattr(args, "timing_runs", 1))
        ksp_dt = rep.t_setup + rep.t_solve

        e1, e2 = compute_errors(mesh1, mesh2, data, rep.x, sizes,
                                pdegree=args.pdegree)
        tables.add(sum(sizes), rep.niters, rep.cond, ksp_dt, rep.r_norm,
                   mesh1.hmin(), [e1, e2])
        tables.show()

    if args.save:
        from ..io_utils.vtk import write_vtu
        base = f"./results/{name}/uh{{}}_{config_tag(args)}.vtu"
        write_vtu(base.format(0), mesh1, rep.x[:sizes[0]])
        write_vtu(base.format(1), mesh2, rep.x[sizes[0]:])
    return tables


if __name__ == "__main__":
    parser = standard_parser("diag", PRECONDS)
    args, _ = parser.parse_known_args()
    run(args)
