"""3D-1D h-robustness experiment (VERDICT round-3 item #5).

The committed sweeps show iteration growth with refinement (12 -> 11-17
-> 20-28 over mesh_n=8/16/32, ~1.65x per refinement) on the algebraic
metric path.  Suspects, by analogy with the bidomain 'hazmath'
h-degradation fixed in round 3 (scripts/exp_std_amg.py): the
piecewise-constant UA coarse space under a plain V-cycle.  This sweeps
cycle/scaling variants over mesh_n x gamma to isolate the cause:

  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python scripts/exp_3d1d_hrobust.py [variant ...]

Variants: dat (the input_metric.dat config: V, coarse_scaling OFF),
cs (V + coarse_scaling ON), amli2 (NL-AMLI(2) + coarse_scaling),
w (W-cycle), maxlvl3 (dat + Schwarz_maxlvl=3).
"""
import sys
import time
from dataclasses import replace

import numpy as np

sys.path.insert(0, ".")

VARIANTS = {
    "dat":     dict(),
    "cs":      dict(coarse_scaling=True),
    "amli2":   dict(cycle_type="nl_amli", amli_degree=2,
                    coarse_scaling=True),
    "w":       dict(cycle_type="w"),
    "maxlvl3": dict(schwarz_maxlvl=3),
}

MESH_NS = [8, 16, 32]
GAMMAS = [1.0, 1e8]


def system(mesh_n, gamma):
    from tpuamg.fem import unit_cube_mesh
    from tpuamg.problems.emi_3d1d import synthetic_neuron_curve, get_system
    # scale the synthetic neuron with the bulk like exp_3d1d_scale.py
    n_main = 40 * mesh_n // 8
    mesh3d = unit_cube_mesh(mesh_n)
    curve = synthetic_neuron_curve(n_main=n_main, n_branches=8, nseg=4)
    radius = 0.2
    A, b, sizes = get_system(mesh3d, curve, k3=3.0,
                             k1=7.0 * np.pi * radius ** 2,
                             gamma=gamma * 2 * np.pi * radius,
                             coupling_radius=radius)
    return A, b, sizes


def main(variants):
    import jax
    jax.config.update("jax_enable_x64", True)
    import tpuamg
    tpuamg.enable_compilation_cache()
    from tpuamg.problems.solve import solve_system
    from tpuamg.io_utils import dat_to_amg_parameters

    base, solver_cfg = dat_to_amg_parameters(
        "tpuamg/problems/input_metric.dat")
    rows = []
    for mesh_n in MESH_NS:
        for gamma in GAMMAS:
            A, b, sizes = system(mesh_n, gamma)
            n3 = sizes[0]
            idofs = np.arange(n3, A.shape[0])
            for name in variants:
                prm = replace(base, **VARIANTS[name])
                t0 = time.time()
                rep = solve_system(A, b, "metric_hazmath", sizes,
                                   idofs=idofs, params=prm,
                                   tol=solver_cfg.tolerance,
                                   maxiter=solver_cfg.maxiter,
                                   stop_type=solver_cfg.stop_type)
                row = (name, mesh_n, A.shape[0], f"{gamma:.0e}",
                       rep.niters, f"{rep.cond:.1f}",
                       "T" if rep.converged else "F",
                       f"{time.time()-t0:.0f}s")
                rows.append(row)
                print(*row, flush=True)
    print("\nvariant mesh_n ndof gamma niters cond conv wall")
    for r in rows:
        print(*r)


if __name__ == "__main__":
    main(sys.argv[1:] or ["dat", "cs", "amli2"])
