"""Fused multi-diagonal Pallas SpMV (sparse/dia_pallas.py) vs oracles.

Runs in pallas interpret mode on CPU (conftest forces JAX_PLATFORMS=cpu);
the same code path compiles via Mosaic on TPU (validated by
scripts/tpu_pallas_check.py and bench.py).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tpuamg.sparse import HostCSR
from tpuamg.sparse.dia import DIA
from tpuamg.sparse.dia_pallas import PDIA, blockinv_dia


def _random_dia(n, offsets, seed=0):
    rng = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    for o in offsets:
        r = np.arange(max(0, -o), min(n, n - o))
        rows.append(r)
        cols.append(r + o)
        vals.append(rng.standard_normal(len(r)))
    A = HostCSR.from_coo(np.concatenate(rows), np.concatenate(cols),
                         np.concatenate(vals), (n, n))
    return A


@pytest.mark.parametrize("n,offsets", [
    (1000, [0]),                                   # diagonal only
    (1000, [-1, 0, 1]),                            # tridiagonal
    (1500, [-130, -128, -127, -1, 0, 1, 127, 128, 130]),  # lane-crossing
    (523, [-33, 0, 257]),                          # n < 128 rows, odd offs
    (70, [-3, 0, 3]),                              # tiny (single block)
    (4096, [-1025, -512, 0, 512, 1025]),           # multi-row offsets
])
def test_pdia_matvec_matches_dia(n, offsets):
    A = _random_dia(n, offsets)
    x = np.random.default_rng(1).standard_normal(n)
    ref = A.matvec(x)
    D = DIA.from_host(A)
    P = PDIA.from_dia(D, interpret=True)
    y = np.asarray(P.matvec(jnp.asarray(x, dtype=jnp.float32)))
    np.testing.assert_allclose(y, ref, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(P.diagonal()),
                               np.asarray(D.diagonal()), rtol=1e-6)


def test_pdia_residual_fused():
    n = 777
    A = _random_dia(n, [-128, -5, 0, 5, 128], seed=3)
    rng = np.random.default_rng(4)
    x = rng.standard_normal(n)
    b = rng.standard_normal(n)
    P = PDIA.from_host(A, interpret=True)
    r = np.asarray(P.residual(jnp.asarray(x, jnp.float32),
                              jnp.asarray(b, jnp.float32)))
    np.testing.assert_allclose(r, b - A.matvec(x), rtol=2e-5, atol=2e-5)


def test_pdia_bf16_storage_fp32_compute():
    n = 600
    A = _random_dia(n, [-1, 0, 1], seed=5)
    x = np.random.default_rng(6).standard_normal(n)
    D = DIA.from_host(A, dtype=jnp.bfloat16)
    P = PDIA.from_dia(D, interpret=True)
    y = np.asarray(P.matvec(jnp.asarray(x, jnp.float32)))
    assert y.dtype == np.float32
    np.testing.assert_allclose(y, A.matvec(x), rtol=2e-2, atol=2e-2)


def test_pdia_roundtrip_host():
    A = _random_dia(300, [-7, 0, 9], seed=7)
    P = PDIA.from_host(A, interpret=True)
    B = P.to_host()
    np.testing.assert_allclose(B.toarray(), A.toarray(), rtol=1e-6,
                               atol=1e-6)


def test_blockinv_dia_matches_einsum():
    rng = np.random.default_rng(8)
    ng, F = 50, 2
    bi = rng.standard_normal((ng, F, F))
    mask = (rng.random(ng * F) > 0.2).astype(np.float64)
    r = rng.standard_normal(ng * F)
    ref = np.einsum("bij,bj->bi", bi, r.reshape(ng, F)).reshape(-1) * mask
    offsets, data = blockinv_dia(bi, mask)
    C = DIA(offsets, jnp.asarray(data, jnp.float64), (ng * F, ng * F))
    np.testing.assert_allclose(np.asarray(C.matvec(jnp.asarray(r))), ref,
                               rtol=1e-12, atol=1e-12)
    P = PDIA.from_dia(DIA(offsets, jnp.asarray(data, jnp.float32),
                          (ng * F, ng * F)), interpret=True)
    np.testing.assert_allclose(
        np.asarray(P.matvec(jnp.asarray(r, jnp.float32))), ref,
        rtol=2e-5, atol=2e-5)


def test_grid_path_pallas_interpret_end_to_end():
    """Full grid-path PCG with fused Pallas kernels (interpret mode)
    matches the XLA slice-loop path on the bidomain system."""
    from tpuamg.fem import mms
    from tpuamg.problems.bidomain import Params, get_mesh, get_system
    from tpuamg.problems.solve import solve_system
    from tpuamg.config import AMGParameters

    p = Params(2.0, 3.0, 1e6)
    data = mms.setup_bidomain_mms(p, dim=2)
    mesh = get_mesh(12, 2)
    A, b, sizes, _ = get_system(mesh, data, p)
    prm = AMGParameters(cycle_type="v", dtype="float32")
    kw = dict(params=prm, tol=1e-5, maxiter=40, grid=((13, 13), 2),
              dtype=jnp.float32)
    rep_x = solve_system(A, b, "metric_mono", sizes, pallas=False, **kw)
    rep_p = solve_system(A, b, "metric_mono", sizes, pallas="interpret",
                         **kw)
    assert rep_p.converged
    assert abs(rep_p.niters - rep_x.niters) <= 2, \
        (rep_p.niters, rep_x.niters)
    # f32 at gamma=1e6: iterate paths diverge in the last digits; the
    # contract is that both solve the system, not bitwise equality
    rel_p = np.linalg.norm(b - A.matvec(rep_p.x)) / np.linalg.norm(b)
    rel_x = np.linalg.norm(b - A.matvec(rep_x.x)) / np.linalg.norm(b)
    assert rel_p < 2 * max(rel_x, 1e-5), (rel_p, rel_x)


def test_structured_path_pallas_interpret():
    """Pair+Morton structured path with Pallas kernels (interpret)."""
    from tpuamg.fem import mms
    from tpuamg.problems.bidomain import Params, get_mesh, get_system
    from tpuamg.problems.solve import solve_system
    from tpuamg.config import AMGParameters

    p = Params(2.0, 3.0, 1e4)
    data = mms.setup_bidomain_mms(p, dim=2)
    mesh = get_mesh(8, 2)
    A, b, sizes, _ = get_system(mesh, data, p)
    coords = np.concatenate([mesh.vertices, mesh.vertices])
    prm = AMGParameters(cycle_type="v", dtype="float32")
    kw = dict(params=prm, tol=1e-5, maxiter=60,
              structured_coords=coords, dtype=jnp.float32)
    rep_x = solve_system(A, b, "metric_mono", sizes, pallas=False, **kw)
    rep_p = solve_system(A, b, "metric_mono", sizes, pallas="interpret",
                         **kw)
    assert rep_p.converged
    assert abs(rep_p.niters - rep_x.niters) <= 2
    np.testing.assert_allclose(rep_p.x, rep_x.x, atol=5e-4)


def test_fused_cheb_smoother_matches_reference():
    """FusedChebSmoother (one launch, interpret mode) == the op-by-op
    BlockChebyshevSmoother recurrence."""
    import jax
    from tpuamg.sparse.dia_pallas import FusedChebSmoother, blockinv_dia
    from tpuamg.amg.structured import DiaChebyshevSmoother

    rng = np.random.default_rng(10)
    n = 700
    A = _random_dia(n, [-52, -2, 0, 2, 52], seed=11)
    # SPD-ify: diagonal dominance
    d = np.abs(A.toarray()).sum(1) + 1.0
    import scipy.sparse as sp
    Asp = sp.csr_matrix(A.toarray() + np.diag(d))
    from tpuamg.sparse import HostCSR
    A = HostCSR(Asp.indptr, Asp.indices, Asp.data, Asp.shape)

    F = 2
    ng = n // F
    blocks = np.zeros((ng, F, F))
    arr = Asp.toarray()
    for g in range(ng):
        blocks[g] = arr[g*F:(g+1)*F, g*F:(g+1)*F]
    blockinv = np.linalg.inv(blocks)
    mask = np.ones(n)
    coffs, cdata = blockinv_dia(blockinv, mask)

    D = DIA.from_host(A)
    C = DIA(coffs, jnp.asarray(cdata, jnp.float32), (n, n))
    lmax, lmin = 1.8, 0.22
    ref_sm = DiaChebyshevSmoother(C, lmax, lmin, degree=4)
    fus_sm = FusedChebSmoother.build(D, C, lmax, lmin, degree=4,
                                     interpret=True)

    x0 = jnp.asarray(rng.standard_normal(n), jnp.float32)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    for iters in (1, 2):
        y_ref = np.asarray(ref_sm.smooth(D, x0, b, iters))
        y_fus = np.asarray(fus_sm.smooth(None, x0, b, iters))
        np.testing.assert_allclose(y_fus, y_ref, rtol=2e-4, atol=2e-4)


def test_fused_cheb_smooth_residual():
    """smooth_residual returns exactly (smooth(x), b - A smooth(x))."""
    from tpuamg.sparse.dia_pallas import FusedChebSmoother, blockinv_dia
    rng = np.random.default_rng(20)
    n = 600
    A = _random_dia(n, [-40, -2, 0, 2, 40], seed=21)
    bi = rng.standard_normal((n // 2, 2, 2)) * 0.1
    bi[:, 0, 0] += 1.0
    bi[:, 1, 1] += 1.0
    coffs, cdata = blockinv_dia(bi, np.ones(n))
    D = DIA.from_host(A)
    C = DIA(coffs, jnp.asarray(cdata, jnp.float32), (n, n))
    sm = FusedChebSmoother.build(D, C, 1.9, 0.24, degree=3, interpret=True)
    x0 = jnp.asarray(rng.standard_normal(n), jnp.float32)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    xs = np.asarray(sm.smooth(None, x0, b, 1))
    x2, r2 = sm.smooth_residual(None, x0, b, 1)
    np.testing.assert_allclose(np.asarray(x2), xs, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(b) - A.matvec(xs),
                               rtol=2e-4, atol=2e-4)
