"""Distributed-path tests on the virtual 8-device CPU mesh
(SURVEY.md §4: 'test multi-node without a cluster')."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpuamg.fem import (tagged_unit_square, stiffness_matrix, load_vector,
                        apply_bc_monolithic, mms)
from tpuamg.dist import device_mesh
from tpuamg.dist.solve import distributed_solve, distributed_pcg_step
from tpuamg.config import AMGParameters


@pytest.fixture(scope="module")
def system():
    m = tagged_unit_square(20)
    A = stiffness_matrix(m)
    b = load_vector(m, lambda x: np.ones(len(x)))
    bd = m.boundary_vertices((1, 2, 3, 4))
    return apply_bc_monolithic(A, b, bd, np.zeros(len(bd)))


def test_eight_devices_present():
    assert len(jax.devices()) >= 8


def test_distributed_solve_matches_serial(system):
    A, b = system
    params = AMGParameters(aggregation_type="hem", cycle_type="v",
                           dtype="float64")
    res, mesh = distributed_solve(A, b, params=params, tol=1e-10,
                                  maxiter=200, dtype=jnp.float64)
    assert mesh.devices.size >= 8
    assert res.converged
    x = np.asarray(res.x)
    rel = np.linalg.norm(b - A.matvec(x)) / np.linalg.norm(b)
    assert rel < 1e-8


def test_distributed_pcg_step_runs(system):
    A, b = system
    step, state = distributed_pcg_step(A, b, dtype=jnp.float64)
    out = step(*state)
    jax.block_until_ready(out)
    x, r, z, p, rz = out
    assert np.isfinite(float(rz))
    # one step must reduce the residual of Ax=b from x=0
    assert np.linalg.norm(np.asarray(r)[:A.shape[0]]) < \
        np.linalg.norm(b)


def test_distributed_grid_hierarchy():
    """The structured (DIA/grid) hierarchy shards over the device mesh and
    solves SPMD with XLA-inserted collectives."""
    from tpuamg.problems.bidomain import Params, get_mesh, get_system
    from tpuamg.amg.grid import setup_grid, grid_system
    from tpuamg.amg import as_operator
    from tpuamg.dist import device_mesh, shard_preconditioner, shard_vector
    from tpuamg.dist.sharding import shard_dia
    from tpuamg.sparse.dia import dia_matvec_op
    from tpuamg.krylov import pcg
    from tpuamg.config import AMGParameters

    p = Params(2.0, 3.0, 1e6)
    data = mms.setup_bidomain_mms(p, dim=2)
    mesh2d = get_mesh(16, 2)
    A, b, sizes, _ = get_system(mesh2d, data, p)
    prm = AMGParameters(cycle_type="v", dtype="float64")
    prec, slots, nsl = setup_grid(A, (17, 17), F=2, params=prm,
                                  dtype=jnp.float64)
    dmesh = device_mesh()
    prec_s = shard_preconditioner(prec, dmesh, replicate_below=64)
    Adia = shard_dia(grid_system(A, slots, dtype=jnp.float64), dmesh)
    bs = jnp.zeros(nsl).at[jnp.asarray(slots)].set(jnp.asarray(b))
    res = pcg(dia_matvec_op(Adia), bs, M=as_operator(prec_s),
              tol=1e-8, maxiter=60)
    assert res.converged and res.niters < 30
    x = np.asarray(res.x)[slots]
    rel = np.linalg.norm(b - A.matvec(x)) / np.linalg.norm(b)
    assert rel < 1e-6


def test_distributed_metric_bidomain():
    from tpuamg.problems.bidomain import Params, get_mesh, get_system
    p = Params(2.0, 3.0, 1e6)
    data = mms.setup_bidomain_mms(p, dim=2)
    mesh2d = get_mesh(12, 2)
    A, b, sizes, _ = get_system(mesh2d, data, p)
    idofs = np.arange(sizes[0], sum(sizes))
    params = AMGParameters(aggregation_type="hem", cycle_type="v",
                           schwarz_levels=1, dtype="float64")
    res, _ = distributed_solve(A, b, params=params, idofs=idofs,
                               tol=1e-8, maxiter=100, dtype=jnp.float64)
    assert res.converged and res.niters < 40
