"""Fused whole-V-cycle kernel (amg/grid_fused.py) vs the reference
multilevel cycle, in pallas interpret mode on CPU.

The FusedVCycle and the MGPreconditioner built by
setup_grid_fused(reference=True) share the SAME padded canonical
hierarchy (operators, block inverses, Chebyshev bounds), so their
outputs must agree to f32 tolerance — this validates the in-kernel
transfers (leading-axis pair-adds, W0/W1 lane matmuls), the streamed
Chebyshev sweeps, the masked prolongation, and the in-kernel dense
coarse solve against plain-JAX reference code.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from tpuamg.fem import mms, tagged_unit_square, stiffness_matrix, \
    load_vector, apply_bc_monolithic
from tpuamg.problems.bidomain import Params, get_mesh, get_system
from tpuamg.config import AMGParameters
from tpuamg.amg.grid_fused import (setup_grid_fused, grid_system_fused,
                                   fused_operator, dims_schedule, _wmats)


def _compare(A, dims, F, gamma_label, coarse_dof=60, cheb_degree=3,
             rtol=2e-5, seed=3, cheb_kind=1, cycle="v"):
    prm = AMGParameters(cycle_type=cycle, maxit=1, coarse_dof=coarse_dof,
                        dtype="float32")
    vc, slots, nflat, ref, slots_can = setup_grid_fused(
        A, dims, F=F, params=prm, cheb_degree=cheb_degree,
        cheb_kind=cheb_kind, interpret=True, reference=True)
    rng = np.random.default_rng(seed)
    r = rng.standard_normal(A.shape[0])
    bk = jnp.zeros(nflat, dtype=jnp.float32).at[jnp.asarray(slots)].set(
        jnp.asarray(r, dtype=jnp.float32))
    z = np.asarray(vc.matvec(bk))[slots]
    n0 = ref.levels[0].A.shape[0]
    rcan = jnp.zeros(n0, dtype=jnp.float64).at[
        jnp.asarray(slots_can)].set(jnp.asarray(r))
    z_ref = np.asarray(ref.matvec(rcan))[slots_can]
    scale = np.linalg.norm(z_ref) + 1e-30
    err = np.linalg.norm(z - z_ref) / scale
    assert err < rtol, (gamma_label, err)


@pytest.mark.parametrize("gamma", [1e0, 1e6])
def test_fused_matches_reference_2d(gamma):
    p = Params(2.0, 3.0, gamma)
    data = mms.setup_bidomain_mms(p, dim=2)
    mesh = get_mesh(16, 2)
    A, b, sizes, _ = get_system(mesh, data, p)
    _compare(A, (17, 17), 2, gamma)


def test_fused_pcg_gamma_1e10():
    """At gamma=1e10 f32 cycles differ from f64 by O(5%) (inherent f32
    rounding at that operator scale — an f32 reference differs just as
    much), so parity is asserted via PCG convergence quality instead."""
    from tpuamg.krylov.cg import pcg
    from tpuamg.sparse.dia import dia_matvec_op
    p = Params(2.0, 3.0, 1e10)
    data = mms.setup_bidomain_mms(p, dim=2)
    mesh = get_mesh(16, 2)
    A, b, sizes, _ = get_system(mesh, data, p)
    prm = AMGParameters(cycle_type="v", maxit=1, coarse_dof=60,
                        dtype="float32")
    vc, slots, nflat = setup_grid_fused(A, (17, 17), F=2, params=prm,
                                        interpret=True)
    Aop = dia_matvec_op(grid_system_fused(A, slots, nflat,
                                          dtype=jnp.float32))
    bk = jnp.zeros(nflat, dtype=jnp.float32).at[jnp.asarray(slots)].set(
        jnp.asarray(b, dtype=jnp.float32))
    res = pcg(Aop, bk, M=fused_operator(vc), tol=1e-5, maxiter=60)
    assert res.converged and res.niters <= 25, res.niters


@pytest.mark.parametrize("gamma", [1e0, 1e6])
def test_fused_w_matches_reference_2d(gamma):
    """Fused W-cycle (round-3: statically unrolled two-visit recursion
    with warm-started second visits) against the MGPreconditioner
    W-cycle on the same canonical hierarchy."""
    p = Params(2.0, 3.0, gamma)
    data = mms.setup_bidomain_mms(p, dim=2)
    mesh = get_mesh(16, 2)
    A, b, sizes, _ = get_system(mesh, data, p)
    # W does ~2x the f32 arithmetic of V, so the f32-vs-f64 rounding
    # envelope roughly doubles (measured 3.1e-5 at gamma=1e6; a logic
    # error shows as O(1))
    _compare(A, (17, 17), 2, gamma, cycle="w", rtol=8e-5)


def test_fused_matches_reference_2d_single_field():
    m = tagged_unit_square(18)
    A = stiffness_matrix(m)
    b = load_vector(m, lambda x: np.ones(len(x)))
    bd = m.boundary_vertices((1, 2, 3, 4))
    A, b = apply_bc_monolithic(A, b, bd, np.zeros(len(bd)))
    _compare(A, (19, 19), 1, "poisson", coarse_dof=40)


def test_fused_matches_reference_3d():
    p = Params(2.0, 3.0, 1e6)
    data = mms.setup_bidomain_mms(p, dim=3)
    mesh = get_mesh(5, 3)
    A, b, sizes, _ = get_system(mesh, data, p)
    # 37-diagonal stencil at gamma=1e6 accumulates more f32 rounding than
    # 2D (4.6e-5 seen); at gamma=1 the same compare is exact to 1e-7,
    # so the 3D transfer chain itself is correct.
    _compare(A, (6, 6, 6), 2, "3d", coarse_dof=50, rtol=2e-4)


def test_fused_matches_reference_3d_gamma1():
    p = Params(2.0, 3.0, 1.0)
    data = mms.setup_bidomain_mms(p, dim=3)
    mesh = get_mesh(5, 3)
    A, b, sizes, _ = get_system(mesh, data, p)
    _compare(A, (6, 6, 6), 2, "3d-g1", coarse_dof=50, rtol=2e-6)


def test_fused_pcg_solve_matches_grid_path():
    """End-to-end: PCG with the fused cycle converges like the grid path
    and reaches the same solution."""
    from tpuamg.krylov.cg import pcg
    from tpuamg.sparse.dia import dia_matvec_op
    p = Params(2.0, 3.0, 1e6)
    data = mms.setup_bidomain_mms(p, dim=2)
    mesh = get_mesh(16, 2)
    A, b, sizes, _ = get_system(mesh, data, p)
    prm = AMGParameters(cycle_type="v", maxit=1, coarse_dof=60,
                        dtype="float32")
    vc, slots, nflat = setup_grid_fused(A, (17, 17), F=2, params=prm,
                                        interpret=True)
    Aop = dia_matvec_op(grid_system_fused(A, slots, nflat,
                                          dtype=jnp.float32))
    bk = jnp.zeros(nflat, dtype=jnp.float32).at[jnp.asarray(slots)].set(
        jnp.asarray(b, dtype=jnp.float32))
    res = pcg(Aop, bk, M=fused_operator(vc), tol=1e-6, maxiter=60)
    assert res.converged and res.niters <= 25, res.niters
    x = np.asarray(res.x)[slots]
    rel = np.linalg.norm(b - A.matvec(x)) / np.linalg.norm(b)
    assert rel < 1e-5, rel


def test_solve_system_fused_wiring():
    """solve_system(grid=..., pallas='fused_interpret') routes through
    the fused cycle and matches the per-smoother grid path."""
    from tpuamg.problems.solve import solve_system
    p = Params(2.0, 3.0, 1e6)
    data = mms.setup_bidomain_mms(p, dim=2)
    mesh = get_mesh(16, 2)
    A, b, sizes, _ = get_system(mesh, data, p)
    prm = AMGParameters(cycle_type="v", maxit=1, coarse_dof=60,
                        dtype="float32")
    rep = solve_system(A, b, "metric_mono", sizes, params=prm,
                       tol=1e-5, maxiter=60, grid=((17, 17), 2),
                       dtype=jnp.float32, pallas="fused_interpret")
    assert rep.converged and rep.niters <= 25, rep.niters
    rel = np.linalg.norm(b - A.matvec(rep.x)) / np.linalg.norm(b)
    assert rel < 1e-4, rel


def test_dims_schedule_even_leading():
    sched = dims_schedule((513, 513), 2, max_levels=20, coarse_dof=2048)
    for lvl, d in enumerate(sched[:-1]):
        assert all(x % 2 == 0 for x in d[:-1]), (lvl, d)
        assert d[-1] % 2 == 0
    # halving chains exactly
    for a, bd in zip(sched, sched[1:]):
        assert all(x == y // 2 for x, y in zip(bd[:-1], a[:-1]))


def test_wmats_partition():
    for F in (1, 2, 4):
        W0, W1 = _wmats(F)
        # every coarse lane sums exactly two fine positions
        assert np.all(W0.sum(axis=0) + W1.sum(axis=0) == 2.0)
        assert set(np.unique(W0)) <= {0.0, 1.0}


def test_fused_matches_reference_fourth_kind():
    """cheb_kind=4 (fourth-kind Chebyshev smoother) parity between the
    fused kernel and the plain-JAX reference hierarchy."""
    p = Params(2.0, 3.0, 1e4)
    data = mms.setup_bidomain_mms(p, dim=2)
    mesh = get_mesh(16, 2)
    A, b, sizes, _ = get_system(mesh, data, p)
    _compare(A, (17, 17), 2, "kind4", cheb_kind=4)
