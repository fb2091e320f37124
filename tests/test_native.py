"""Native C++ amgkit vs numpy-fallback oracles."""
import numpy as np
import pytest
import scipy.sparse as sp

from tpuamg.sparse import HostCSR
from tpuamg.native import (get_lib, native_spgemm, native_greedy_color,
                           native_vmb, native_hem, native_mis)

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native toolchain unavailable")


def rnd(rng, n, m, d=0.1):
    a = sp.random(n, m, density=d, random_state=rng, format="csr")
    return HostCSR(a.indptr, a.indices, a.data, a.shape), a


def test_native_spgemm():
    rng = np.random.default_rng(0)
    A, a = rnd(rng, 40, 50)
    B, b = rnd(rng, 50, 30)
    C = native_spgemm(A, B)
    np.testing.assert_allclose(C.toarray(), (a @ b).toarray(), rtol=1e-13)


def test_native_color_valid():
    rng = np.random.default_rng(1)
    A, a = rnd(rng, 80, 80, 0.08)
    a = a + a.T
    A = HostCSR.from_dense(a.toarray())
    colors = native_greedy_color(A, 24)
    ai = a.tocsr()
    for i in range(80):
        for j in ai.indices[ai.indptr[i]:ai.indptr[i + 1]]:
            if j != i and colors[i] < 24 and colors[j] < 24:
                assert colors[i] != colors[j]


def test_native_vmb_covers():
    rng = np.random.default_rng(2)
    A, a = rnd(rng, 60, 60, 0.1)
    a = a + a.T
    A = HostCSR.from_dense((a != 0).toarray().astype(float))
    agg, nagg = native_vmb(A, 100)
    assert (agg >= 0).all() and nagg >= 1


def test_native_hem_is_matching():
    rng = np.random.default_rng(3)
    A, a = rnd(rng, 60, 60, 0.1)
    s = abs(a) + abs(a).T
    A = HostCSR.from_dense(s.toarray())
    match = native_hem(A)
    for i, m in enumerate(match):
        if m >= 0:
            assert match[m] == i and m != i


def test_native_mis_independent_dominating():
    rng = np.random.default_rng(4)
    A, a = rnd(rng, 70, 70, 0.08)
    s = (abs(a) + abs(a).T).tocsr()
    A = HostCSR.from_dense(s.toarray())
    cand = np.arange(70)
    seeds = native_mis(A, cand)
    seed_set = set(seeds.tolist())
    for i in seeds:
        for j in s.indices[s.indptr[i]:s.indptr[i + 1]]:
            if j != i:
                assert j not in seed_set


def test_native_coo_to_csr_oracle():
    """Native COO coalesce == scipy oracle (duplicates summed, sorted)."""
    import scipy.sparse as sp
    from tpuamg.native import native_coo_to_csr
    rng = np.random.default_rng(5)
    n, nnz = 300, 9000
    r = rng.integers(0, n, nnz)
    c = rng.integers(0, n, nnz)
    v = rng.standard_normal(nnz)
    out = native_coo_to_csr(r, c, v, (n, n))
    if out is None:
        pytest.skip("native lib unavailable")
    indptr, cols, vals = out
    ref = sp.coo_matrix((v, (r, c)), shape=(n, n)).tocsr()
    ref.sum_duplicates()
    assert np.array_equal(indptr, ref.indptr)
    assert np.array_equal(cols, ref.indices)
    assert np.allclose(vals, ref.data)


def test_from_coo_native_path_matches_numpy():
    """HostCSR.from_coo above the native threshold == below it."""
    from tpuamg.sparse import HostCSR
    rng = np.random.default_rng(6)
    n, nnz = 200, 8000   # > 4096 triggers the native path
    r = rng.integers(0, n, nnz)
    c = rng.integers(0, n, nnz)
    v = rng.standard_normal(nnz)
    A = HostCSR.from_coo(r, c, v, (n, n))
    from tpuamg.sparse.host import _coalesce_coo
    rr, cc, vv = _coalesce_coo(r.astype(np.int64), c.astype(np.int64),
                               v, (n, n))
    B = HostCSR.from_coo(rr, cc, vv, (n, n), sum_duplicates=False)
    assert np.array_equal(A.indptr, B.indptr)
    assert np.array_equal(A.indices, B.indices)
    assert np.allclose(A.data, B.data)
