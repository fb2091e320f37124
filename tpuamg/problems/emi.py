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


def trace_matrix_p2(ispace, pspace, parent_map) -> HostCSR:
    """P2 trace matrix: interface P2 dofs (vertices + interface-edge
    midpoints) -> parent P2 dofs.  For conforming meshes every interface
    edge IS a parent edge, so this is a selection matrix like the P1
    one (xii.Trace for FunctionSpace('CG', 2), emi_2d.py:58,83)."""
    from ..fem.pk import _rows_in
    parent_map = np.asarray(parent_map, dtype=np.int64)
    pedges = np.sort(parent_map[ispace.edges], axis=1)
    pe = pspace.nv + _rows_in(pspace.edges, pedges)
    cols = np.concatenate([parent_map, pe])
    return HostCSR.from_coo(np.arange(ispace.ndofs), cols,
                            np.ones(ispace.ndofs),
                            (ispace.ndofs, pspace.ndofs),
                            sum_duplicates=False)


def get_system(mesh1, mesh2, interface, data, params: Params, pdegree=1):
    """Assemble the monolithic EMI system. Returns
    (A, b, (n1, n2), interface_dofs) — interface_dofs are V1 dofs on the
    interface (emi_2d.py:205-206) plus V2-side union for 3D parity
    (emi_3d.py:134-138 handled by caller).
    pdegree: 1 or 2 (the reference's -pdegree knob, emi_2d.py:58)."""
    k1, k2, g = params.kappa1, params.kappa2, params.gamma

    if pdegree == 2:
        from ..fem.pk import (P2Space, p2_stiffness, p2_load,
                              p2_mass, p2_facet_load)
        V1, V2 = P2Space(mesh1), P2Space(mesh2)
        Ig = P2Space(interface)
        n1, n2 = V1.ndofs, V2.ndofs
        K1 = p2_stiffness(V1, k1)
        K2 = p2_stiffness(V2, k2)
        Mg = p2_mass(Ig)
        T1 = trace_matrix_p2(Ig, V1, interface.parent_vertex_map)
        T2 = trace_matrix_p2(Ig, V2, embed_vertices(interface, mesh2))
        b0 = p2_load(V1, data["f1"])
        b1 = p2_load(V2, data["f2"])
        b0 += _neumann_sides(mesh1, data["flux1"], (2, 4), mesh1.gdim,
                             space=V1)
        b1 += _neumann_sides(mesh2, data["flux2"], (5, 7), mesh1.gdim,
                             space=V2)
        b0 += p2_facet_load(V1, lambda x: -data["g_r"](x), (1,))
        b1 += p2_facet_load(V2, lambda x: -data["g_n"](x), (1,))
        b1 += p2_facet_load(V2, lambda x: data["g_r"](x), (1,))
        bd1 = V1.boundary_dofs((3,))
        bd2 = V2.boundary_dofs((6,))
        c1, c2 = V1.dof_coords()[bd1], V2.dof_coords()[bd2]
        interface_dofs = V1.boundary_dofs((1,))
    else:
        assert pdegree == 1, f"unsupported pdegree {pdegree}"
        n1, n2 = mesh1.num_vertices, mesh2.num_vertices
        K1 = stiffness_matrix(mesh1, k1)
        K2 = stiffness_matrix(mesh2, k2)
        Mg = mass_matrix(interface)            # manifold mass on Gamma
        T1 = trace_matrix(interface, mesh1)
        T2 = trace_matrix(interface, mesh2,
                          parent_map=embed_vertices(interface, mesh2))
        b0 = load_vector(mesh1, data["f1"])
        b1 = load_vector(mesh2, data["f2"])
        dim = mesh1.gdim
        b0 += _neumann_sides(mesh1, data["flux1"], (2, 4), dim)
        b1 += _neumann_sides(mesh2, data["flux2"], (5, 7), dim)
        # interface contributions (emi_2d.py:115-120)
        b0 += facet_load_vector(mesh1, lambda x: -data["g_r"](x), (1,))
        b1 += facet_load_vector(mesh2, lambda x: -data["g_n"](x), (1,))
        b1 += facet_load_vector(mesh2, lambda x: data["g_r"](x), (1,))
        bd1 = mesh1.boundary_vertices((3,))
        bd2 = mesh2.boundary_vertices((6,))
        c1, c2 = mesh1.vertices[bd1], mesh2.vertices[bd2]
        interface_dofs = mesh1.boundary_vertices((1,))

    C11 = T1.T.matmat(Mg.matmat(T1))
    C12 = T1.T.matmat(Mg.matmat(T2))
    C22 = T2.T.matmat(Mg.matmat(T2))

    A00 = K1.add(C11, beta=g)
    A01 = C12.scale(-g)
    A11 = K2.add(C22, beta=g)
    A = bmat([[A00, A01], [A01.T, A11]])
    b = np.concatenate([b0, b1])

    # Dirichlet: tag 3 on mesh1 (u1 data), tag 6 on mesh2 (u2 data)
    bc_dofs = np.concatenate([bd1, n1 + bd2])
    bc_vals = np.concatenate([data["u1"](c1), data["u2"](c2)])
    A, b = apply_bc_monolithic(A, b, bc_dofs, bc_vals)
    return A, b, (n1, n2), interface_dofs


def _neumann_sides(mesh, flux, tags, dim, space=None):
    """+∫ (sigma.n) v ds over side tags, splitting opposite faces.
    space: a P2Space for pdegree=2 (facet integrals via p2_facet_load)."""
    out = np.zeros(mesh.num_vertices if space is None else space.ndofs)
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
            if space is not None:
                from ..fem.pk import p2_facet_load
                out += p2_facet_load(
                    space, lambda x: flux(x) @ nvec, facets=facets[idx])
            else:
                from .bidomain import _facet_integral
                out += _facet_integral(mesh, facets[idx],
                                       lambda x: flux(x) @ nvec)
    return out


def compute_errors(mesh1, mesh2, data, x, sizes, pdegree=1):
    n1, _ = sizes
    if pdegree == 2:
        from ..fem.pk import P2Space, p2_errornorm
        e1 = p2_errornorm(data["u1"], data["grad_u1"], P2Space(mesh1),
                          x[:n1], "H1")
        e2 = p2_errornorm(data["u2"], data["grad_u2"], P2Space(mesh2),
                          x[n1:], "H1")
        return e1, e2
    e1 = errornorm_p1(data["u1"], data["grad_u1"], mesh1, x[:n1], "H1")
    e2 = errornorm_p1(data["u2"], data["grad_u2"], mesh2, x[n1:], "H1")
    return e1, e2
