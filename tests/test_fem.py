"""FEM layer tests: assembly oracles + MMS convergence (SURVEY.md §4.1)."""
import numpy as np
import scipy.sparse.linalg as spla
import scipy.sparse as sp
import pytest

from tpuamg.fem import (tagged_unit_square, tagged_unit_cube,
                        unit_square_mesh, unit_cube_mesh,
                        stiffness_matrix, mass_matrix, load_vector,
                        facet_load_vector, apply_bc_monolithic,
                        errornorm_p1, interpolate, mms)


def to_scipy(h):
    return sp.csr_matrix((h.data, h.indices, h.indptr), shape=h.shape)


def test_mesh_counts():
    m = unit_square_mesh(4)
    assert m.num_vertices == 25 and m.num_cells == 32
    c = unit_cube_mesh(2)
    assert c.num_vertices == 27 and c.num_cells == 48
    np.testing.assert_allclose(c.cell_volumes().sum(), 1.0)
    np.testing.assert_allclose(m.cell_volumes().sum(), 1.0)


def test_boundary_tags_square():
    m = tagged_unit_square(4)
    # 4 sides x 4 facets each
    assert len(m.facets) == 16
    for tag in (1, 2, 3, 4):
        assert (m.facet_markers == tag).sum() == 4
    # hmin = sqrt(2)/4 (longest edge of each triangle = diagonal)
    np.testing.assert_allclose(m.hmin(), np.sqrt(2) / 4)


def test_boundary_tags_cube():
    m = tagged_unit_cube(2)
    # each face: 2*n^2 triangles = 8; tags 3 and 4 cover two faces each
    assert (m.facet_markers == 1).sum() == 8
    assert (m.facet_markers == 2).sum() == 8
    assert (m.facet_markers == 3).sum() == 16
    assert (m.facet_markers == 4).sum() == 16


def test_stiffness_nullspace_and_symmetry():
    m = tagged_unit_square(5)
    A = to_scipy(stiffness_matrix(m, kappa=2.0))
    ones = np.ones(m.num_vertices)
    np.testing.assert_allclose(A @ ones, 0, atol=1e-12)
    np.testing.assert_allclose((A - A.T).data, 0, atol=1e-14)


def test_mass_total():
    for m in (unit_square_mesh(5), unit_cube_mesh(3)):
        M = to_scipy(mass_matrix(m))
        ones = np.ones(m.num_vertices)
        np.testing.assert_allclose(ones @ (M @ ones), 1.0, rtol=1e-12)


def test_load_vector_constant():
    m = unit_square_mesh(6)
    b = load_vector(m, lambda x: np.ones(len(x)))
    np.testing.assert_allclose(b.sum(), 1.0, rtol=1e-12)
    # must equal M @ 1
    M = to_scipy(mass_matrix(m))
    np.testing.assert_allclose(b, M @ np.ones(m.num_vertices), atol=1e-13)


def test_facet_load_constant():
    m = tagged_unit_square(4)
    b = facet_load_vector(m, lambda x: np.ones(len(x)), tags=(1, 2, 3, 4))
    np.testing.assert_allclose(b.sum(), 4.0, rtol=1e-12)  # perimeter


def poisson_h1_error(n):
    """-Δu = f, u = sin(pi x) sin(pi y) exact, homogeneous Dirichlet."""
    m = tagged_unit_square(n)

    def u_ex(x):
        return np.sin(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1])

    def grad_ex(x):
        return np.pi * np.stack(
            [np.cos(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1]),
             np.sin(np.pi * x[:, 0]) * np.cos(np.pi * x[:, 1])], axis=1)

    def f(x):
        return 2 * np.pi ** 2 * u_ex(x)

    A = stiffness_matrix(m)
    b = load_vector(m, f)
    bdofs = m.boundary_vertices((1, 2, 3, 4))
    A, b = apply_bc_monolithic(A, b, bdofs, np.zeros(len(bdofs)))
    x = spla.spsolve(to_scipy(A).tocsc(), b)
    return errornorm_p1(u_ex, grad_ex, m, x, "H1")


def test_poisson_convergence():
    e1 = poisson_h1_error(8)
    e2 = poisson_h1_error(16)
    rate = np.log(e1 / e2) / np.log(2)
    assert 0.9 < rate < 1.2, (e1, e2, rate)


def test_p2_bidomain_rate():
    """P2 elements must show H1 rate ~2 (pdegree parity,
    bidomain_2d.py:120)."""
    import numpy as np
    from tpuamg.problems.bidomain import (Params, get_mesh, get_system,
                                          compute_errors)
    from tpuamg.problems.solve import solve_system
    e0 = h0 = None
    for n in (8, 16):
        p = Params(2.0, 3.0, 1e4)
        data = mms.setup_bidomain_mms(p, dim=2)
        m = get_mesh(n, 2)
        A, b, sizes, _ = get_system(m, data, p, pdegree=2)
        idofs = np.arange(sizes[0], sum(sizes))
        rep = solve_system(A, b, "metric_mono", sizes, idofs=idofs,
                           tol=1e-10, maxiter=100)
        assert rep.converged
        e1, _ = compute_errors(m, data, rep.x, sizes, pdegree=2)
        if e0 is not None:
            rate = np.log(e1 / e0) / np.log(m.hmin() / h0)
            assert 1.8 < rate < 2.2, rate
        e0, h0 = e1, m.hmin()


def test_mms_bidomain_consistency():
    """f1 must equal -div(kappa1 grad u1) + gamma (u1 - u2) numerically."""
    from collections import namedtuple
    P = namedtuple("P", "kappa1 kappa2 gamma")
    data = mms.setup_bidomain_mms(P(2.0, 3.0, 5.0), dim=2)
    pts = np.random.default_rng(0).uniform(0.1, 0.9, size=(10, 2))
    # finite-difference check of the flux divergence
    h = 1e-6
    div_sigma = np.zeros(10)
    for d in range(2):
        ep = np.zeros(2)
        ep[d] = h
        div_sigma += (data["flux1"](pts + ep)[:, d]
                      - data["flux1"](pts - ep)[:, d]) / (2 * h)
    f1 = div_sigma + 5.0 * (data["u1"](pts) - data["u2"](pts))
    np.testing.assert_allclose(f1, data["f1"](pts), rtol=1e-5)


def test_mms_emi_interface_data():
    """g_r must satisfy -sigma1.n1 = gamma (u1-u2) + g_r on y=0.5."""
    from collections import namedtuple
    P = namedtuple("P", "kappa1 kappa2 gamma")
    data = mms.setup_emi_mms(P(2.0, 3.0, 5.0), dim=2)
    x = np.linspace(0, 1, 7)
    pts = np.stack([x, 0.5 * np.ones_like(x)], axis=1)
    lhs = -data["flux1"](pts) @ np.array([0.0, -1.0])
    rhs = 5.0 * (data["u1"](pts) - data["u2"](pts)) + data["g_r"](pts)
    np.testing.assert_allclose(lhs, rhs, atol=1e-12)
