"""Sharded-Pallas distributed path (dist/pallas_dist.py) on the virtual
8-device CPU mesh, kernels in interpret mode — the exact TPU code path
minus Mosaic lowering (which scripts/tpu_fused_check.py validates against
interpret mode on the real chip).

Distribution must be EXACT: per-step halo exchanges make the sharded
Chebyshev smoother compute the same polynomial as the single-device one,
so PCG iteration counts are device-count independent.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpuamg.sparse.dia import DIA
from tpuamg.amg.structured import BlockChebyshevSmoother
from tpuamg.config import AMGParameters
from tpuamg.dist import device_mesh
from tpuamg.dist.pallas_dist import (plan_sharded, ShardedPDIA,
                                     ShardedChebSmoother)
from tpuamg.dist.solve import (pad_grid_problem, unpad_grid_vector,
                               _dist_pallas_mults, distributed_grid_solve)
from tpuamg.fem import mms
from tpuamg.problems.bidomain import Params, get_mesh, get_system


NDEV = 8


def _banded(n, offsets, seed=0, dd=4.0):
    rng = np.random.default_rng(seed)
    data = np.zeros((len(offsets), n))
    for d, off in enumerate(offsets):
        lo, hi = max(0, -off), min(n, n - off)
        data[d, lo:hi] = rng.standard_normal(hi - lo) * 0.1
    data[offsets.index(0), :] += dd
    return DIA(offsets, jnp.asarray(data, dtype=jnp.float32), (n, n))


def test_plan_sharded_contract():
    padr, rb, rl = plan_sharded(128 * 8 * NDEV, NDEV, (-1, 0, 1))
    assert rl == 8 and rb == 8 and padr >= 1
    with pytest.raises(ValueError):
        plan_sharded(128 * 8 * NDEV + 128, NDEV, (0,))   # rl % 8
    with pytest.raises(ValueError):
        plan_sharded(128 * NDEV, NDEV, (-4000, 0))       # halo > shard


def test_sharded_pdia_matches_dia():
    n = 128 * 8 * NDEV * 2
    offsets = [-130, -128, -3, -1, 0, 1, 3, 128, 130]
    A = _banded(n, offsets, seed=0)
    mesh = device_mesh()
    As = ShardedPDIA.from_dia(A, mesh, interpret=True)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
    b = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
    y_ref = np.asarray(A.matvec(x))
    y = np.asarray(As.matvec(x))
    assert np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref) < 1e-6
    r_ref = np.asarray(A.residual(x, b))
    r = np.asarray(As.residual(x, b))
    assert np.linalg.norm(r - r_ref) / np.linalg.norm(r_ref) < 1e-6


def test_sharded_cheb_matches_block_smoother():
    F = 2
    n = 128 * 8 * NDEV
    offsets = [-128, -2, -1, 0, 1, 2, 128]
    A = _banded(n, offsets, seed=2)
    rng = np.random.default_rng(3)
    blockinv = np.linalg.inv(
        rng.standard_normal((n // F, F, F)) * 0.1 + 2 * np.eye(F))
    mask = np.ones(n)
    mask[-7:] = 0.0
    lmax, lmin = 2.5, 0.3
    ref = BlockChebyshevSmoother(
        jnp.asarray(blockinv, dtype=jnp.float32),
        jnp.asarray(mask, dtype=jnp.float32), lmax, lmin, 3)
    sm = ShardedChebSmoother.build(A, blockinv, mask, lmax, lmin, 3,
                                   device_mesh(), interpret=True)
    x = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
    b = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
    y_ref = np.asarray(ref.smooth(A, x, b, iters=2))
    y = np.asarray(sm.smooth(None, x, b, iters=2))
    assert np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref) < 1e-5
    # fused final residual
    x1, r1 = sm.smooth_residual(None, x, b, iters=1)
    y1 = np.asarray(ref.smooth(A, x, b, iters=1))
    r_ref = np.asarray(b) - np.asarray(A.matvec(jnp.asarray(y1)))
    assert np.linalg.norm(np.asarray(x1) - y1) / np.linalg.norm(y1) < 1e-5
    assert np.linalg.norm(np.asarray(r1) - r_ref) / \
        np.linalg.norm(r_ref) < 1e-4


def test_pad_grid_problem_multi_axis_roundtrip():
    p = Params(2.0, 3.0, 1e4)
    data = mms.setup_bidomain_mms(p, dim=2)
    A, b, sizes, _ = get_system(get_mesh(12, 2), data, p)
    A2, b2, dims2, mask2 = pad_grid_problem(A, b, (13, 13), 2, (16, 8))
    assert dims2 == (16, 16)
    assert int(mask2.sum()) == A.shape[0]
    # embedded b round-trips
    assert np.allclose(unpad_grid_vector(b2, (13, 13), dims2, 2), b)
    # real x real block of A2 = A (A2 @ embed(x) restricted = A @ x)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(A.shape[0])
    x2 = np.zeros(A2.shape[0])
    # embed via pad of b-like vector
    _, xb, _, _ = pad_grid_problem(A, x, (13, 13), 2, (16, 8))
    y2 = A2.matvec(xb)
    assert np.allclose(unpad_grid_vector(y2, (13, 13), dims2, 2),
                       A.matvec(x), atol=1e-12)


def test_dist_pallas_mults_divisibility():
    from tpuamg.sparse.dia_pallas import LANES
    for dims, F in (((17, 17), 2), ((513, 513), 2), ((9, 9, 9), 2),
                    ((33, 65), 1)):
        mults = _dist_pallas_mults(dims, F, NDEV, 3)
        dims2 = tuple(-(-d // m) * m for d, m in zip(dims, mults))
        nflat = int(np.prod(dims2)) * F
        assert nflat % (LANES * 8 * NDEV) == 0
        assert dims2[0] % (NDEV * 2 ** 3) == 0


def test_distributed_grid_solve_pallas_parity():
    """Same iteration count and solution as the XLA GSPMD path."""
    p = Params(2.0, 3.0, 1e6)
    data = mms.setup_bidomain_mms(p, dim=2)
    A, b, sizes, _ = get_system(get_mesh(16, 2), data, p)
    prm = AMGParameters(cycle_type="v", maxit=1, coarse_dof=60,
                        dtype="float32")
    res0, _ = distributed_grid_solve(A, b, (17, 17), F=2, params=prm,
                                     tol=1e-6, maxiter=60, pallas=False)
    res1, _ = distributed_grid_solve(A, b, (17, 17), F=2, params=prm,
                                     tol=1e-6, maxiter=60,
                                     pallas="interpret")
    assert res1.converged
    assert abs(res1.niters - res0.niters) <= 2
    r1 = np.linalg.norm(b - A.matvec(res1.x)) / np.linalg.norm(b)
    assert r1 < 1e-5
    assert np.linalg.norm(res0.x - res1.x) / np.linalg.norm(res0.x) < 1e-3
