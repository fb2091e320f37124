"""Reduced 3D-1D EMI problem (neuron in porous tissue).

Rebuild of /root/reference/src/emi_3d1d.py: steady-state electrodiffusion
in a 3D domain coupled to a 1D curve network through a cylinder-average
operator:

    -div(sigma_3 grad p3) + sigma_3 p3 + gamma (Avg^T)(Avg p3 - p1) = f3
    -div(sigma_1 grad p1) + sigma_1 p1 + gamma (p1 - Avg p3)          = f1

Block system A = AD + gamma*M (emi_3d1d.py:79-92, noted at :140) with
    AD = diag(k3 (K3+M3), k1 (K1+M1)),
    M  = [Pi^T Mq Pi, -Pi^T Mq; -Mq Pi, Mq].

The reference loads a real neuron curve mesh from HDF5 (emi_3d1d.py:28-43,
fetched by downloads.sh — unavailable offline); we provide that loader
surface plus a synthetic branching-neuron generator for self-contained
runs and tests (SURVEY.md §7 risk list).

Three modes mirroring the reference pipeline (emi_3d1d.py:114-166):
  -dump 1          assemble and dump A/b/idofs to -outdir
  (default)        assemble and solve in-process (solve_haznics role)
  -load_solution D load solution.txt from D, write VTU visualization

Run:  python -m tpuamg.problems.emi_3d1d -gamma 1 -radius 0.2 -dump 1
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np

from ..fem import unit_cube_mesh
from ..fem.mesh import Mesh
from ..fem.coupling import average_matrix
from ..fem.assembly import stiffness_matrix, mass_matrix, load_vector
from ..sparse import bmat
from ..io_utils import (print_red, dump_system, write_solution,
                        read_solution)
from .solve import solve_system


def synthetic_neuron_curve(n_main=40, n_branches=6, seed=7,
                           box=(1.0, 1.0, 1.0), nseg=8):
    """Branching piecewise-linear curve inside the box — stand-in for the
    HDF5 neuron mesh (PolyIC_3AS2_1.CNG.c1.h5) when data is absent.
    Production-scale runs use n_main/n_branches/nseg to reach the real
    neuron's ~1e4 curve dofs (VERDICT round-1 item 3)."""
    rng = np.random.default_rng(seed)
    bx, by, bz = box
    # main axon: smooth random walk along x
    xs = np.linspace(0.08 * bx, 0.92 * bx, n_main)
    ys = 0.5 * by + 0.22 * by * np.sin(2.5 * np.pi * xs / bx)
    zs = 0.5 * bz + 0.18 * bz * np.cos(1.8 * np.pi * xs / bx)
    verts = [np.stack([xs, ys, zs], axis=1)]
    cells = [np.stack([np.arange(n_main - 1), np.arange(1, n_main)],
                      axis=1)]
    offset = n_main
    for b in range(n_branches):
        src = rng.integers(n_main // 8, n_main - n_main // 8)
        start = verts[0][src]
        direction = rng.standard_normal(3)
        direction /= np.linalg.norm(direction)
        length = rng.uniform(0.15, 0.3)
        ts = np.linspace(0, length, nseg + 1)[1:]
        wiggle = (0.03 * 8 / nseg) * rng.standard_normal(
            (nseg, 3)).cumsum(axis=0)
        pts = start[None] + ts[:, None] * direction[None] + wiggle
        pts = np.clip(pts, 0.05 * np.array(box), 0.95 * np.array(box))
        verts.append(pts)
        ids = np.concatenate([[src], offset + np.arange(nseg)])
        cells.append(np.stack([ids[:-1], ids[1:]], axis=1))
        offset += nseg
    return Mesh(np.concatenate(verts, axis=0),
                np.concatenate(cells, axis=0))


def load_neuron_h5(path):
    """Load the reference's neuron curve mesh from HDF5
    (/root/reference/src/emi_3d1d.py:28-43 semantics).

    Legacy-DOLFIN layout: ``/mesh/coordinates`` (nv, 3) float,
    ``/mesh/topology`` (ne, 2) int edge cells, and a ``/curves`` edge
    marker (MeshFunction('double', mesh, 1) — stored as a dataset or a
    group with a ``values`` member, one value per edge: the branch
    radius).  The reference recolors the markers to {0 = not neuron,
    1 = neuron} and extracts the marker-1 submesh (EmbeddedMesh(edge_f,
    1)); we do the same: drop edges whose marker is 0, keep the rest,
    and compact to the used vertices.  A file without ``/curves`` keeps
    every edge."""
    import h5py
    with h5py.File(path, "r") as h5:
        coords = np.asarray(h5["/mesh/coordinates"], dtype=np.float64)
        topo = np.asarray(h5["/mesh/topology"], dtype=np.int64)
        values = None
        if "curves" in h5:
            obj = h5["curves"]
            if isinstance(obj, h5py.Group):
                obj = obj.get("values", None)
            if obj is not None:
                values = np.asarray(obj, dtype=np.float64)
    if topo.ndim != 2 or topo.shape[1] != 2:
        raise ValueError(
            f"expected (ne, 2) edge topology in {path}, got {topo.shape}")
    if values is not None and len(values) == len(topo):
        topo = topo[values != 0]     # marker 0 = not the neuron
    used, inv = np.unique(topo.reshape(-1), return_inverse=True)
    return Mesh(coords[used], inv.reshape(topo.shape).astype(np.int64))


def get_system(mesh3d, curve, k3=1.0, k1=1.0, gamma=1.0,
               coupling_radius=0.0, return_coupling=False):
    """Assemble A = AD + gamma*M and b (emi_3d1d.py:46-94).

    return_coupling=True additionally returns the metric factorization
    (Pi, Mq) with M = R^T Mq R, R = [-Pi, I] — the data the gamma-exact
    smoother/coarse machinery needs (kept through assembly instead of
    re-derived from A; CLAUDE.md round-2 backlog)."""
    K3 = stiffness_matrix(mesh3d, k3)
    M3 = mass_matrix(mesh3d, k3)
    K1 = stiffness_matrix(curve, k1)
    M1 = mass_matrix(curve, k1)
    A00 = K3 + M3
    A11 = K1 + M1

    Mq = mass_matrix(curve)                       # line-integral mass
    Pi = average_matrix(mesh3d, curve, radius=coupling_radius, degree=10)
    m00 = Pi.T.matmat(Mq.matmat(Pi))
    m01 = Pi.T.matmat(Mq)
    m11 = Mq

    A = bmat([[A00.add(m00, beta=gamma), m01.scale(-gamma)],
              [m01.T.scale(-gamma), A11.add(m11, beta=gamma)]])

    b3 = load_vector(mesh3d, lambda x: x[:, 0] + x[:, 1])   # f3 = x + y
    b1 = load_vector(curve, lambda x: np.ones(len(x)))      # f1 = 1
    b = np.concatenate([b3, b1])
    sizes = (mesh3d.num_vertices, curve.num_vertices)
    if return_coupling:
        return A, b, sizes, (Pi, Mq)
    return A, b, sizes


def main(argv=None):
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("-gamma", type=float, default=1,
                        help="Coupling strength (1/dt)")
    parser.add_argument("-dump", type=int, default=0, choices=(0, 1),
                        help="Save matrices")
    parser.add_argument("-radius", type=float, default=1,
                        help="Coupling radius (micro m)")
    parser.add_argument("-outdir", type=str, default="./data/emi_3d1d/",
                        help="Where to save matrices")
    parser.add_argument("-load_solution", type=str, default=None,
                        help="Dir containing solution.txt")
    parser.add_argument("-mesh_n", type=int, default=16,
                        help="3D background mesh resolution")
    parser.add_argument("-neuron_h5", type=str, default=None,
                        help="Path to neuron HDF5 mesh (downloads.sh data)")
    parser.add_argument("-n_main", type=int, default=40,
                        help="synthetic neuron: main-axon vertices")
    parser.add_argument("-n_branches", type=int, default=6,
                        help="synthetic neuron: branch count")
    parser.add_argument("-nseg", type=int, default=8,
                        help="synthetic neuron: segments per branch")
    args, _ = parser.parse_known_args(argv)

    import jax
    jax.config.update("jax_enable_x64", True)

    if args.dump:
        args.load_solution = None
    if args.load_solution is not None:
        assert os.path.exists(args.load_solution)
    os.makedirs(args.outdir, exist_ok=True)

    # physical parameters (emi_3d1d.py:125-135)
    sigma3d, sigma1d = 3e0, 7e0   # conductivities, mS/cm
    mc = 1                        # membrane capacitance, microF/cm^2
    radius = args.radius
    deltat_inv = args.gamma
    if radius > 0:
        gamma = deltat_inv * 2 * np.pi * radius * mc
        sigma1d = sigma1d * np.pi * radius ** 2
    else:
        gamma = deltat_inv * 2 * np.pi * mc
        sigma1d = sigma1d * np.pi

    # meshes
    if args.neuron_h5:
        curve = load_neuron_h5(args.neuron_h5)
        lo, hi = curve.vertices.min(0), curve.vertices.max(0)
        pad = 0.1 * (hi - lo + 1e-9)
        mesh3d = unit_cube_mesh(args.mesh_n)
        mesh3d.vertices = (lo - pad) + mesh3d.vertices * (hi - lo + 2 * pad)
    else:
        mesh3d = unit_cube_mesh(args.mesh_n)
        curve = synthetic_neuron_curve(n_main=args.n_main,
                                       n_branches=args.n_branches,
                                       nseg=args.nseg)

    start = time.time()
    A, b, sizes, coupling = get_system(mesh3d, curve, k3=sigma3d,
                                       k1=sigma1d, gamma=gamma,
                                       coupling_radius=radius,
                                       return_coupling=True)
    print("\n------------------ System setup and assembly time: ",
          time.time() - start, "\n")

    if args.dump:
        coords = np.concatenate([mesh3d.vertices, curve.vertices])
        dump_system(A, b, sizes, args.outdir, coords=coords,
                    coupling=coupling, gamma=gamma)
    elif args.load_solution is not None:
        print_red(f"Loading results from {args.load_solution}...")
        sol = read_solution(args.load_solution)
        x3, x1 = sol[:sizes[0]], sol[sizes[0]:sizes[0] + sizes[1]]
        from ..io_utils.vtk import write_vtu
        write_vtu(os.path.join(args.load_solution,
                               f"uh0_gamma{args.gamma}.vtu"), mesh3d, x3)
        write_vtu(os.path.join(args.load_solution,
                               f"uh1_gamma{args.gamma}.vtu"), curve, x1)
        print_red("Saving done.")
    else:
        # in-process solve (solve_haznics role, utils.py:95-127)
        idofs = np.arange(sizes[0], sum(sizes))
        rep = solve_system(A, b, "metric_hazmath", sizes, idofs=idofs,
                           tol=1e-6, maxiter=1000)
        print_red(f"niters={rep.niters} converged={rep.converged} "
                  f"tsetup={rep.t_setup:.2f}s tsolve={rep.t_solve:.2f}s")
        write_solution(args.outdir, rep.x)
    return 0


if __name__ == "__main__":
    main()
