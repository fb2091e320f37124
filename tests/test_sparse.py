"""Unit tests for the sparse toolkit vs scipy oracles (SURVEY.md §4)."""
import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp
import pytest

from tpuamg.sparse import HostCSR, bmat, rap_unsmoothed, greedy_color, ELL


def random_csr(rng, n, m, density=0.05):
    a = sp.random(n, m, density=density, random_state=rng, format="csr")
    a.sum_duplicates()
    return a


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def to_host(a):
    return HostCSR(a.indptr, a.indices, a.data, a.shape)


def test_from_coo_roundtrip(rng):
    a = random_csr(rng, 40, 30)
    coo = a.tocoo()
    h = HostCSR.from_coo(coo.row, coo.col, coo.data, a.shape)
    np.testing.assert_allclose(h.toarray(), a.toarray())


def test_coo_duplicates():
    h = HostCSR.from_coo([0, 0, 1], [1, 1, 2], [1.0, 2.0, 3.0], (2, 3))
    assert h.nnz == 2
    assert h.toarray()[0, 1] == 3.0


def test_matvec(rng):
    a = random_csr(rng, 50, 37)
    x = rng.standard_normal(37)
    np.testing.assert_allclose(to_host(a).matvec(x), a @ x, rtol=1e-13)


def test_transpose(rng):
    a = random_csr(rng, 23, 41)
    np.testing.assert_allclose(to_host(a).T.toarray(), a.T.toarray())


def test_matmat(rng):
    a = random_csr(rng, 30, 40, 0.1)
    b = random_csr(rng, 40, 25, 0.1)
    c = to_host(a).matmat(to_host(b))
    np.testing.assert_allclose(c.toarray(), (a @ b).toarray(), rtol=1e-13)


def test_add_scale(rng):
    a, b = random_csr(rng, 20, 20), random_csr(rng, 20, 20)
    c = to_host(a).add(to_host(b), alpha=2.0, beta=-0.5)
    np.testing.assert_allclose(c.toarray(), 2 * a.toarray() - 0.5 * b.toarray())


def test_diag_and_scaling(rng):
    a = random_csr(rng, 25, 25, 0.2)
    h = to_host(a)
    np.testing.assert_allclose(h.diagonal(), a.diagonal())
    d = rng.standard_normal(25)
    np.testing.assert_allclose(h.scale_rows(d).toarray(),
                               (sp.diags(d) @ a).toarray())
    np.testing.assert_allclose(h.scale_cols(d).toarray(),
                               (a @ sp.diags(d)).toarray())


def test_eliminate_rows_cols(rng):
    a = random_csr(rng, 12, 12, 0.4)
    h = to_host(a)
    bc = np.array([2, 5, 7])
    newA, colA = h.eliminate_rows_cols(bc)
    d = a.toarray().copy()
    keep = np.setdiff1d(np.arange(12), bc)
    col_expect = np.zeros_like(d)
    col_expect[np.ix_(keep, bc)] = d[np.ix_(keep, bc)]
    d[bc, :] = 0
    d[:, bc] = 0
    d[bc, bc] = 1.0
    np.testing.assert_allclose(newA.toarray(), d)
    np.testing.assert_allclose(colA.toarray(), col_expect)


def test_bmat(rng):
    a = random_csr(rng, 10, 10)
    b = random_csr(rng, 10, 7)
    c = random_csr(rng, 7, 10)
    mono = bmat([[to_host(a), to_host(b)], [to_host(c), None]])
    expect = sp.bmat([[a, b], [c, None]]).toarray()
    np.testing.assert_allclose(mono.toarray(), expect)


def test_rap_unsmoothed(rng):
    a = random_csr(rng, 20, 20, 0.2)
    agg = rng.integers(0, 5, size=20)
    agg[3] = -1  # dropped dof
    P = np.zeros((20, 5))
    for i, g in enumerate(agg):
        if g >= 0:
            P[i, g] = 1.0
    coarse = rap_unsmoothed(to_host(a), agg, 5)
    np.testing.assert_allclose(coarse.toarray(), P.T @ a.toarray() @ P,
                               atol=1e-13)


def test_greedy_color(rng):
    a = random_csr(rng, 60, 60, 0.1)
    a = a + a.T  # symmetric pattern
    colors = greedy_color(to_host(a))
    ai = a.tocsr()
    for i in range(60):
        nbrs = ai.indices[ai.indptr[i]:ai.indptr[i + 1]]
        for j in nbrs:
            if j != i:
                assert colors[i] != colors[j]


def test_extract_submatrix(rng):
    a = random_csr(rng, 15, 15, 0.3)
    rows = np.array([1, 4, 9])
    cols = np.array([0, 4, 11, 13])
    np.testing.assert_allclose(
        to_host(a).extract_submatrix(rows, cols),
        a.toarray()[np.ix_(rows, cols)])


# -- device (ELL) ---------------------------------------------------------

def test_ell_matvec(rng):
    a = random_csr(rng, 33, 29, 0.15)
    e = ELL.from_host(to_host(a), dtype=jnp.float64)
    x = rng.standard_normal(29)
    np.testing.assert_allclose(np.asarray(e.matvec(jnp.asarray(x))),
                               a @ x, rtol=1e-12)


def test_ell_roundtrip(rng):
    a = random_csr(rng, 20, 20, 0.2)
    e = ELL.from_host(to_host(a), dtype=jnp.float64)
    np.testing.assert_allclose(e.to_host().toarray(), a.toarray())


def test_ell_diagonal_and_rows(rng):
    a = random_csr(rng, 20, 20, 0.3)
    a = a + sp.eye(20)
    e = ELL.from_host(to_host(a), dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(e.diagonal()), a.diagonal())
    x = rng.standard_normal(20)
    ids = np.array([0, 5, 7])
    np.testing.assert_allclose(
        np.asarray(e.matvec_rows(jnp.asarray(x), jnp.asarray(ids))),
        (a @ x)[ids], rtol=1e-12)
