"""P2 (quadratic) Lagrange elements on simplices.

Covers the reference's ``-pdegree`` discretization knob
(/root/reference/src/bidomain_2d.py:120, FunctionSpace('Lagrange', p) at
:58) beyond P1: dofs at vertices + edge midpoints, standard quadratic
basis in barycentric form

    phi_v(i)    = lam_i (2 lam_i - 1)
    phi_e(i,j)  = 4 lam_i lam_j

Assembly is quadrature-based (vectorized numpy, host side) and produces
HostCSR operators consumed by the same algebraic AMG/Krylov stack (the AMG
is algebraic, so P2 systems need no solver changes).
"""
from __future__ import annotations

import numpy as np

from ..sparse import HostCSR
from .mesh import Mesh
from .quadrature import simplex_rule
from .assembly import _p1_gradients

_LOCAL_EDGES = {
    1: [(0, 1)],          # interval (interface/manifold meshes)
    2: [(0, 1), (0, 2), (1, 2)],
    3: [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)],
}


class P2Space:
    """Quadratic Lagrange space: global dofs = vertices then edges."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh
        d = mesh.tdim
        pairs = _LOCAL_EDGES[d]
        cells = mesh.cells.astype(np.int64)
        ev = np.concatenate([
            np.sort(cells[:, list(p)], axis=1) for p in pairs], axis=0)
        edges, inv = np.unique(ev, axis=0, return_inverse=True)
        self.edges = edges                        # (ne, 2)
        nc = mesh.num_cells
        # edge_of_cell[c, k] = global edge id of local edge k
        self.edge_of_cell = inv.reshape(len(pairs), nc).T
        self.nv = mesh.num_vertices
        self.ndofs = self.nv + len(edges)
        # cell dofmap: vertices then edge dofs
        self.cell_dofs = np.concatenate(
            [cells, self.nv + self.edge_of_cell], axis=1)

    def dof_coords(self):
        mid = 0.5 * (self.mesh.vertices[self.edges[:, 0]]
                     + self.mesh.vertices[self.edges[:, 1]])
        return np.concatenate([self.mesh.vertices, mid], axis=0)

    def boundary_dofs(self, tags):
        """Dofs on tagged boundary facets: facet vertices + facet edges."""
        m = self.mesh
        tags = np.atleast_1d(tags)
        sel = np.isin(m.facet_markers, tags)
        facets = m.facets[sel].astype(np.int64)
        if len(facets) == 0:
            return np.empty(0, dtype=np.int64)
        vdofs = np.unique(facets)
        # facet edges: all vertex pairs within each facet
        fd = facets.shape[1]
        pairs = [(i, j) for i in range(fd) for j in range(i + 1, fd)]
        fedges = np.concatenate(
            [np.sort(facets[:, list(p)], axis=1) for p in pairs], axis=0)
        fedges = np.unique(fedges, axis=0)
        # map to global edge ids (edges array is lex-sorted unique)
        idx = _rows_in(self.edges, fedges)
        return np.unique(np.concatenate([vdofs, self.nv + idx]))


def _rows_in(haystack, needles):
    """Indices of `needles` rows inside lex-sorted-unique `haystack`."""
    key_h = haystack[:, 0].astype(np.int64) * (2 ** 31) + haystack[:, 1]
    key_n = needles[:, 0].astype(np.int64) * (2 ** 31) + needles[:, 1]
    order = np.argsort(key_h)
    pos = np.searchsorted(key_h[order], key_n)
    idx = order[pos]
    assert np.all(key_h[idx] == key_n), "facet edge not found"
    return idx


def _basis(bary):
    """phi (nq, nl) and barycentric-gradient coefficients for P2.

    Returns (phi, dphi_dlam): dphi_dlam (nq, nl, d+1) = d phi / d lam_k."""
    nq, d1 = bary.shape
    d = d1 - 1
    pairs = _LOCAL_EDGES[d]
    nl = d1 + len(pairs)
    phi = np.zeros((nq, nl))
    dphi = np.zeros((nq, nl, d1))
    for i in range(d1):
        li = bary[:, i]
        phi[:, i] = li * (2 * li - 1)
        dphi[:, i, i] = 4 * li - 1
    for k, (i, j) in enumerate(pairs):
        li, lj = bary[:, i], bary[:, j]
        phi[:, d1 + k] = 4 * li * lj
        dphi[:, d1 + k, i] = 4 * lj
        dphi[:, d1 + k, j] = 4 * li
    return phi, dphi


def p2_stiffness(space: P2Space, kappa=1.0) -> HostCSR:
    mesh = space.mesh
    grads, vols = _p1_gradients(mesh)            # grad lam: (nc, d+1, g)
    bary, w = simplex_rule(mesh.tdim, 2 * (2 - 1) + 1)
    phi, dphi = _basis(bary)                     # dphi: (nq, nl, d+1)
    # grad phi at q on cell c: sum_k dphi[q, a, k] * grads[c, k, :]
    kap = np.broadcast_to(np.asarray(kappa, dtype=np.float64),
                          (mesh.num_cells,))
    G = np.einsum("qak,ckg->cqag", dphi, grads)  # (nc, nq, nl, g)
    Ke = np.einsum("q,cqag,cqbg->cab", w, G, G) \
        * (kap * vols)[:, None, None]
    return _scatter(space, Ke)


def p2_mass(space: P2Space, coeff=1.0) -> HostCSR:
    mesh = space.mesh
    vols = mesh.cell_volumes()
    bary, w = simplex_rule(mesh.tdim, 4)
    phi, _ = _basis(bary)
    co = np.broadcast_to(np.asarray(coeff, dtype=np.float64),
                         (mesh.num_cells,))
    Me = np.einsum("q,qa,qb->ab", w, phi, phi)[None] \
        * (co * vols)[:, None, None]
    return _scatter(space, Me)


def _scatter(space: P2Space, Ae) -> HostCSR:
    nl = space.cell_dofs.shape[1]
    rows = np.repeat(space.cell_dofs, nl, axis=1).ravel()
    cols = np.tile(space.cell_dofs, (1, nl)).ravel()
    return HostCSR.from_coo(rows, cols, Ae.ravel(),
                            (space.ndofs, space.ndofs))


def p2_load(space: P2Space, f, degree=5):
    mesh = space.mesh
    bary, w = simplex_rule(mesh.tdim, degree)
    phi, _ = _basis(bary)
    X = mesh.cell_coords()
    pts = np.einsum("qa,cag->cqg", bary[:, :mesh.tdim + 1], X)
    fv = np.asarray(f(pts.reshape(-1, mesh.gdim))).reshape(pts.shape[:2])
    vols = mesh.cell_volumes()
    be = vols[:, None] * np.einsum("cq,q,qa->ca", fv, w, phi)
    b = np.zeros(space.ndofs)
    np.add.at(b, space.cell_dofs.ravel(), be.ravel())
    return b


def p2_facet_load(space: P2Space, g, tags=None, degree=5, facets=None):
    """∫ g v ds over boundary facets for P2 (facet = P2 simplex of
    dimension d-1 with its own vertex+edge dofs).  Select facets by
    marker `tags` or pass an explicit `facets` (nf, d) vertex array
    (needed when one tag covers opposite faces with different normals)."""
    mesh = space.mesh
    if facets is None:
        tags = np.atleast_1d(tags)
        sel = np.isin(mesh.facet_markers, tags)
        facets = mesh.facets[sel]
    facets = np.asarray(facets, dtype=np.int64)
    b = np.zeros(space.ndofs)
    if len(facets) == 0:
        return b
    fdim = mesh.tdim - 1
    bary, w = simplex_rule(fdim, degree)
    # facet-local P2 basis (dimension fdim)
    phi, _ = _basis(bary) if fdim >= 2 else _basis_1d(bary)
    # facet dofs: vertices then facet edges
    fd = facets.shape[1]
    pairs = [(i, j) for i in range(fd) for j in range(i + 1, fd)]
    if pairs:
        fedges = np.stack([np.sort(facets[:, list(p)], axis=1)
                           for p in pairs], axis=1)   # (nf, np, 2)
        eidx = _rows_in(space.edges,
                        fedges.reshape(-1, 2)).reshape(len(facets), -1)
        fdofs = np.concatenate([facets, space.nv + eidx], axis=1)
    else:
        fdofs = facets
    X = mesh.vertices[facets]
    pts = np.einsum("qa,fag->fqg", bary, X)
    gv = np.asarray(g(pts.reshape(-1, mesh.gdim))).reshape(pts.shape[:2])
    D = X[:, 1:] - X[:, :1]
    Gm = np.einsum("fik,fjk->fij", D, D)
    if fdim == 1:
        vols = np.sqrt(np.maximum(Gm[:, 0, 0], 0))
    else:
        vols = np.sqrt(np.maximum(np.linalg.det(Gm), 0)) / np.prod(
            np.arange(1, fdim + 1))
    be = vols[:, None] * np.einsum("fq,q,qa->fa", gv, w, phi)
    np.add.at(b, fdofs.ravel(), be.ravel())
    return b


def _basis_1d(bary):
    """P2 basis on an interval (2 vertices + midpoint)."""
    nq = len(bary)
    phi = np.zeros((nq, 3))
    l0, l1 = bary[:, 0], bary[:, 1]
    phi[:, 0] = l0 * (2 * l0 - 1)
    phi[:, 1] = l1 * (2 * l1 - 1)
    phi[:, 2] = 4 * l0 * l1
    return phi, None


def p2_errornorm(u_exact, grad_exact, space: P2Space, uh, norm="H1",
                 degree=6):
    mesh = space.mesh
    bary, w = simplex_rule(mesh.tdim, degree)
    phi, dphi = _basis(bary)
    X = mesh.cell_coords()
    pts = np.einsum("qa,cag->cqg", bary, X)
    flat = pts.reshape(-1, mesh.gdim)
    un = np.asarray(uh)[space.cell_dofs]          # (nc, nl)
    vols = mesh.cell_volumes()
    err2 = 0.0
    if norm in ("L2", "H1"):
        ue = np.asarray(u_exact(flat)).reshape(pts.shape[:2])
        uq = np.einsum("qa,ca->cq", phi, un)
        err2 += np.einsum("cq,q,c->", (ue - uq) ** 2, w, vols)
    if norm in ("H1", "H10"):
        grads, _ = _p1_gradients(mesh)
        Gq = np.einsum("qak,ckg->cqag", dphi, grads)
        gh = np.einsum("cqag,ca->cqg", Gq, un)
        ge = np.asarray(grad_exact(flat)).reshape(
            pts.shape[0], pts.shape[1], mesh.gdim)
        err2 += np.einsum("cq,q,c->", np.sum((ge - gh) ** 2, axis=2),
                          w, vols)
    return float(np.sqrt(err2))
