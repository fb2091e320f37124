"""Distributed solve entry points.

``distributed_solve``: host AMG setup -> shard hierarchy + operator over
the mesh -> one jitted PCG program whose SpMVs, smoother sweeps and dot
products run SPMD with XLA-inserted collectives (all_gather on the sharded
row gathers, psum on reductions).

``distributed_pcg_step``: a single sharded operator+preconditioner+CG-step
application — the "training step" analog used by the multi-chip dry run
(__graft_entry__.dryrun_multichip).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..sparse import HostCSR, ELL, matvec_op
from ..amg import setup_amg, as_operator
from ..config import AMGParameters
from ..krylov import pcg
from .sharding import (device_mesh, shard_ell, shard_vector,
                       shard_preconditioner)


def _pad_problem(A_host, b, ndev):
    from ..sparse.host import pad_csr_identity
    n = A_host.shape[0]
    A2 = pad_csr_identity(A_host, ndev)
    b2 = np.zeros(A2.shape[0], dtype=np.float64)
    b2[:n] = np.asarray(b)
    return A2, b2, n


def distributed_solve(A_host: HostCSR, b, params: AMGParameters = None,
                      idofs=None, mesh=None, tol=1e-8, maxiter=500,
                      dtype=jnp.float32):
    """Full distributed PCG solve; returns (CGResult with x trimmed to the
    original size, mesh)."""
    if mesh is None:
        mesh = device_mesh()
    ndev = mesh.devices.size
    if params is None:
        params = AMGParameters(aggregation_type="hem", cycle_type="v",
                               dtype=np.dtype(dtype).name)
    A2, b2, n = _pad_problem(A_host, b, ndev)
    prec = setup_amg(A2, params, idofs=idofs, pad_multiple=ndev)
    prec = shard_preconditioner(prec, mesh)
    Ae = shard_ell(ELL.from_host(A2, dtype=dtype), mesh)
    bj = shard_vector(jnp.asarray(b2, dtype=dtype), mesh)
    res = pcg(matvec_op(Ae), bj, M=as_operator(prec), tol=tol,
              maxiter=maxiter)
    res.x = np.asarray(res.x)[:n]
    return res, mesh


def _cg_step(A, M, x, r, z, p, rz):
    """One CG update (the solver's 'training step')."""
    Ap = A(p)
    alpha = rz / jnp.vdot(p, Ap).real
    x = x + alpha * p
    r = r - alpha * Ap
    z = M(r)
    rz_new = jnp.vdot(r, z).real
    beta = rz_new / rz
    p = z + beta * p
    return x, r, z, p, rz_new


def distributed_pcg_step(A_host: HostCSR, b, params: AMGParameters = None,
                         idofs=None, mesh=None, dtype=jnp.float32):
    """Build the sharded operators and run ONE jitted CG step SPMD.
    Returns the jitted step fn and its example state (for dry runs)."""
    if mesh is None:
        mesh = device_mesh()
    ndev = mesh.devices.size
    if params is None:
        params = AMGParameters(aggregation_type="hem", cycle_type="v",
                               schwarz_levels=1,
                               dtype=np.dtype(dtype).name)
    A2, b2, _ = _pad_problem(A_host, b, ndev)
    prec = setup_amg(A2, params, idofs=idofs, pad_multiple=ndev)
    prec = shard_preconditioner(prec, mesh)
    Ae = shard_ell(ELL.from_host(A2, dtype=dtype), mesh)
    bj = shard_vector(jnp.asarray(b2, dtype=dtype), mesh)
    Afn = matvec_op(Ae)
    Mfn = as_operator(prec)

    # operators as traced args (Partial pytrees), not closure constants
    jitted = jax.jit(_cg_step)

    def step(x, r, z, p, rz):
        return jitted(Afn, Mfn, x, r, z, p, rz)

    x0 = jnp.zeros_like(bj)
    r0 = bj
    z0 = Mfn(r0)
    rz0 = jnp.vdot(r0, z0).real
    return step, (x0, r0, z0, z0, rz0)
