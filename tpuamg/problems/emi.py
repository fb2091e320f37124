"""EMI model problems (2D/3D): two disjoint subdomains coupled only through
interface (trace) integrals.

Rebuilds /root/reference/src/emi_2d.py and emi_3d.py:

    -div(kappa_i grad u_i) = f_i   in Omega_i  (top/bottom half),
    interface coupling  gamma <T u_i - T u_j, T v_i>_Gamma,

with the split-mesh construction of utils.py:187-260 (cell marker 1 = top,
2 = bottom; facet tags 1..7), trace operators (xii.Trace, emi_2d.py:83-94)
realized as selection matrices composed with the interface mass matrix:
    coupling block  = gamma * T_i^T M_Gamma T_j.
Dirichlet on tag 3 (top) / tag 6 (bottom); Neumann + interface data g_r,
g_n on the rest (emi_2d.py:104-123).
"""
from __future__ import annotations

from collections import namedtuple

import numpy as np

from ..fem import (unit_square_mesh, unit_cube_mesh, near, pred_and,
                   pred_or, le, ge, stiffness_matrix, mass_matrix,
                   load_vector, facet_load_vector, apply_bc_monolithic,
                   errornorm_p1, submesh_where_marker, mesh_from_facets,
                   embed_vertices)
from ..sparse import HostCSR, bmat

Params = namedtuple("Params", ("kappa1", "kappa2", "gamma"))


def split_meshes(ncells, dim=2):
    """(mesh1=top, mesh2=bottom, interface) with reference tag semantics
    (utils.py:187-260). Tags on mesh1: 1 interface, 2 right/sides, 3 top,
    4 left/sides; mesh2: 1 interface, 5 left/sides, 6 bottom, 7 right."""
    assert ncells >= 4
    z = dim - 1           # coordinate index normal to the interface
    base = unit_square_mesh(ncells) if dim == 2 else unit_cube_mesh(ncells)
    base.mark_cells(lambda x: np.ones(len(x), dtype=bool), 1)
    base.mark_cells(le(z, 0.5), 2)

    mesh1 = submesh_where_marker(base, 1)   # top
    mesh2 = submesh_where_marker(base, 2)   # bottom
    for m in (mesh1, mesh2):
        m.init_boundary()

    if dim == 2:
        side_a, side_b = near(0, 1.0), near(0, 0.0)   # x=1 / x=0
    else:
        side_a = pred_or(near(0, 0.0), near(0, 1.0))  # x-faces
        side_b = pred_or(near(1, 0.0), near(1, 1.0))  # y-faces
    # mesh1 (top): 1 interface, 2 side_a, 3 top, 4 side_b
    mesh1.mark_facets(near(z, 0.5), 1)
    mesh1.mark_facets(side_a, 2)
    mesh1.mark_facets(near(z, 1.0), 3)
    mesh1.mark_facets(side_b, 4)
    mesh1.mark_facets(near(z, 0.5), 1)   # re-mark: interface wins corners
    # mesh2 (bottom): 1 interface, 6 bottom; in 2D 5 = x=0, 7 = x=1
    # (utils.py:208-211); in 3D 5 = x-faces, 7 = y-faces (utils.py:247-249)
    mesh2.mark_facets(near(z, 0.5), 1)
    if dim == 2:
        mesh2.mark_facets(side_b, 5)   # x=0
        mesh2.mark_facets(side_a, 7)   # x=1
    else:
        mesh2.mark_facets(side_a, 5)   # x-faces
        mesh2.mark_facets(side_b, 7)   # y-faces
    mesh2.mark_facets(near(z, 0.0), 6)
    mesh2.mark_facets(near(z, 0.5), 1)

    interface = mesh_from_facets(mesh1.facets_with_tag(1), mesh1)
    return mesh1, mesh2, interface


def trace_matrix(interface, parent_mesh, parent_map=None) -> HostCSR:
    """P1 trace (restriction) matrix T: parent dofs -> interface dofs.

    For matching P1 spaces this is a selection matrix (the xii.Trace
    operator's matrix for conforming interfaces, emi_2d.py:83)."""
    if parent_map is None:
        parent_map = interface.parent_vertex_map
    ni = interface.num_vertices
    return HostCSR.from_coo(np.arange(ni), parent_map,
                            np.ones(ni), (ni, parent_mesh.num_vertices),
                            sum_duplicates=False)


def get_system(mesh1, mesh2, interface, data, params: Params):
    """Assemble the monolithic EMI system. Returns
    (A, b, (n1, n2), interface_dofs) — interface_dofs are V1 dofs on the
    interface (emi_2d.py:205-206) plus V2-side union for 3D parity
    (emi_3d.py:134-138 handled by caller)."""
    k1, k2, g = params.kappa1, params.kappa2, params.gamma
    n1, n2 = mesh1.num_vertices, mesh2.num_vertices

    K1 = stiffness_matrix(mesh1, k1)
    K2 = stiffness_matrix(mesh2, k2)
    Mg = mass_matrix(interface)            # manifold mass on Gamma
    T1 = trace_matrix(interface, mesh1)
    T2 = trace_matrix(interface, mesh2,
                      parent_map=embed_vertices(interface, mesh2))

    C11 = T1.T.matmat(Mg.matmat(T1))
    C12 = T1.T.matmat(Mg.matmat(T2))
    C22 = T2.T.matmat(Mg.matmat(T2))

    A00 = K1.add(C11, beta=g)
    A01 = C12.scale(-g)
    A11 = K2.add(C22, beta=g)
    A = bmat([[A00, A01], [A01.T, A11]])

    # RHS: volume loads + Neumann (+sigma.n, emi_2d.py:112-113) + interface
    # data (emi_2d.py:115-120)
    b0 = load_vector(mesh1, data["f1"])
    b1 = load_vector(mesh2, data["f2"])
    dim = mesh1.gdim
    if dim == 2:
        n_of_1 = {2: np.array([1.0, 0.0]), 4: np.array([-1.0, 0.0])}
        n_of_2 = {5: np.array([-1.0, 0.0]), 7: np.array([1.0, 0.0])}
    else:
        n_of_1 = {}
        n_of_2 = {}
    b0 += _neumann_sides(mesh1, data["flux1"], (2, 4), dim)
    b1 += _neumann_sides(mesh2, data["flux2"], (5, 7), dim)
    # interface contributions
    b0 += facet_load_vector(mesh1, lambda x: -data["g_r"](x), (1,))
    b1 += facet_load_vector(mesh2, lambda x: -data["g_n"](x), (1,))
    b1 += facet_load_vector(mesh2, lambda x: data["g_r"](x), (1,))
    b = np.concatenate([b0, b1])

    # Dirichlet: tag 3 on mesh1 (u1 data), tag 6 on mesh2 (u2 data)
    bd1 = mesh1.boundary_vertices((3,))
    bd2 = mesh2.boundary_vertices((6,))
    bc_dofs = np.concatenate([bd1, n1 + bd2])
    bc_vals = np.concatenate([data["u1"](mesh1.vertices[bd1]),
                              data["u2"](mesh2.vertices[bd2])])
    A, b = apply_bc_monolithic(A, b, bc_dofs, bc_vals)

    interface_dofs = mesh1.boundary_vertices((1,))
    return A, b, (n1, n2), interface_dofs


def _neumann_sides(mesh, flux, tags, dim):
    """+∫ (sigma.n) v ds over side tags, splitting opposite faces."""
    out = np.zeros(mesh.num_vertices)
    for tag in tags:
        facets = mesh.facets_with_tag(tag)
        if len(facets) == 0:
            continue
        centers = mesh.vertices[facets].mean(axis=1)
        if dim == 2:
            # each side tag is one x-face here
            x0 = centers[0, 0]
            nvec = np.array([1.0, 0.0]) if x0 > 0.5 else \
                np.array([-1.0, 0.0])
            groups = [(np.arange(len(facets)), nvec)]
        else:
            # tags 2/5: x-faces; tags 4/7: y-faces (split_meshes marking)
            axis = 0 if tag in (2, 5) else 1
            hi = centers[:, axis] > 0.5
            npos = np.zeros(dim)
            npos[axis] = 1.0
            groups = [(np.flatnonzero(hi), npos),
                      (np.flatnonzero(~hi), -npos)]
        for idx, nvec in groups:
            if len(idx) == 0:
                continue
            from .bidomain import _facet_integral
            out += _facet_integral(mesh, facets[idx],
                                   lambda x: flux(x) @ nvec)
    return out


def compute_errors(mesh1, mesh2, data, x, sizes):
    n1, _ = sizes
    e1 = errornorm_p1(data["u1"], data["grad_u1"], mesh1, x[:n1], "H1")
    e2 = errornorm_p1(data["u2"], data["grad_u2"], mesh2, x[n1:], "H1")
    return e1, e2
