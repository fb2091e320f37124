"""Whole-chunk fused PCG kernel (amg/grid_fused.py::FusedPCG) parity vs
the launch-per-apply path (krylov.cg.pcg + FusedVCycle), in pallas
interpret mode on CPU.

The chunked kernel runs `chunk` complete PCG iterations per launch —
including the outer SpMV, both dot products, the vector updates and the
V-cycle — so its iterate/statistics stream must reproduce the reference
host loop's (same math, blockwise reduction order)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpuamg.fem import mms
from tpuamg.problems.bidomain import Params, get_mesh, get_system
from tpuamg.config import PRESETS
from tpuamg.amg.grid_fused import (setup_grid_fused, setup_grid_fused_pcg,
                                   grid_system_fused, fused_operator,
                                   pcg_fused)
from tpuamg.krylov import pcg

from dataclasses import replace


def _system(n=16, gamma=1e6):
    params = Params(2.0, 3.0, gamma)
    data = mms.setup_bidomain_mms(params, dim=2)
    mesh = get_mesh(n, 2)
    A, b, sizes, _ = get_system(mesh, data, params)
    return A, b, n


@pytest.mark.parametrize("gamma", [1.0, 1e8])
def test_fused_pcg_matches_reference(gamma):
    A, b, n = _system(16, gamma)
    prm = replace(PRESETS["metric_schwarz"], dtype="float32",
                  cycle_type="v", coarse_dof=128)
    fp, slots, nflat = setup_grid_fused_pcg(
        A, (n + 1, n + 1), F=2, params=prm, cheb_degree=3,
        interpret=True)
    bj = jnp.zeros(nflat, jnp.float32).at[jnp.asarray(slots)].set(
        jnp.asarray(b, jnp.float32))

    # reference: same hierarchy, launch-per-apply path
    vc = fp.vc
    Adia = grid_system_fused(A, slots, nflat, dtype=jnp.float32,
                             pallas=False)
    ref = pcg(Adia.matvec, bj, M=fused_operator(vc), tol=1e-6,
              maxiter=30, chunk=30)

    got = pcg_fused(fp, bj, tol=1e-6, maxiter=30, chunk=8)

    assert got.converged
    assert abs(got.niters - ref.niters) <= 1
    # early iterations must agree tightly; later ones drift by fp32
    # reduction-order noise amplified by the gamma=1e8 conditioning
    # (PCG trajectories separate exponentially under rounding)
    np.testing.assert_allclose(got.residuals[:2], ref.residuals[:2],
                               rtol=1e-4)
    np.testing.assert_allclose(got.alphas[:2], ref.alphas[:2], rtol=1e-4)
    m = min(len(got.residuals), len(ref.residuals))
    np.testing.assert_allclose(got.residuals[:m], ref.residuals[:m],
                               rtol=5e-2)
    # both iterate streams solve the system: check true residuals
    for res in (got, ref):
        rtrue = np.linalg.norm(np.asarray(bj) - np.asarray(
            Adia.matvec(jnp.asarray(res.x))))
        assert rtrue <= 2e-6 * got.true_residuals[0]


def test_fused_pcg_true_residual():
    """The kernel's ||r|| statistic equals the actual recurrence
    residual of the returned iterate stream."""
    A, b, n = _system(16, 1e4)
    prm = replace(PRESETS["metric_schwarz"], dtype="float32",
                  cycle_type="v", coarse_dof=128)
    fp, slots, nflat = setup_grid_fused_pcg(
        A, (n + 1, n + 1), F=2, params=prm, cheb_degree=3,
        interpret=True)
    bj = jnp.zeros(nflat, jnp.float32).at[jnp.asarray(slots)].set(
        jnp.asarray(b, jnp.float32))
    got = pcg_fused(fp, bj, tol=1e-6, maxiter=24, chunk=24)
    Adia = grid_system_fused(A, slots, nflat, dtype=jnp.float32,
                             pallas=False)
    r_direct = np.linalg.norm(np.asarray(bj) - np.asarray(
        Adia.matvec(jnp.asarray(got.x))))
    assert abs(r_direct - got.true_residuals[-1]) <= 1e-3 * max(
        got.true_residuals[0], 1.0)
