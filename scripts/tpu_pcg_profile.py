"""Decompose the PCG iteration cost at n=512 (grid fused path).

The bench shows ~3 ms/iteration while the fused V-cycle kernel is
~1.2-1.7 ms and the PDIA matvec ~0.3 ms — this script times each piece
with chained value-fetch-synchronized loops to find the gap.

Run single-process on TPU:
    PYTHONPATH=.:/root/.axon_site timeout 3600 python scripts/tpu_pcg_profile.py
"""
import os
import time
from functools import partial

import numpy as np

import tpuamg
tpuamg.enable_compilation_cache()

import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from tpuamg.fem import mms
from tpuamg.problems.bidomain import Params, get_mesh, get_system
from tpuamg.config import AMGParameters
from tpuamg.amg.grid_fused import (setup_grid_fused, grid_system_fused,
                                   fused_operator)
from tpuamg.krylov.cg import pcg
from tpuamg.sparse.dia import dia_matvec_op

N = int(os.environ.get("TPUAMG_FUSED_N", "512"))
REPS = 50
GAMMA = 1e6
STORAGE = {"bf16": jnp.bfloat16, "f32": None}[
    os.environ.get("TPUAMG_BENCH_STORAGE", "bf16")]


@partial(jax.jit, static_argnames=("reps",))
def chain(op, x, reps):
    def body(c, _):
        y = op(c)
        return y / (jnp.linalg.norm(y) + 1e-30), None
    y, _ = jax.lax.scan(body, x, None, length=reps)
    return y


def timeit(label, f, *args):
    y = f(*args)
    jax.block_until_ready(y)
    t0 = time.time()
    y = f(*args)
    leaf = jax.tree_util.tree_leaves(y)[0]
    float(leaf.reshape(-1)[0])
    dt = (time.time() - t0) / REPS
    print(f"{label:28s} {dt*1e6:9.1f} us/apply", flush=True)
    return dt


def main():
    print("backend:", jax.default_backend(), "storage:",
          os.environ.get("TPUAMG_BENCH_STORAGE", "bf16"), flush=True)
    p = Params(2.0, 3.0, GAMMA)
    data = mms.setup_bidomain_mms(p, dim=2)
    mesh = get_mesh(N, 2)
    A, b, sizes, _ = get_system(mesh, data, p)
    prm = AMGParameters(cycle_type="v", maxit=1, coarse_dof=2048,
                        dtype="float32")
    vc, slots, nflat = setup_grid_fused(A, (N + 1, N + 1), F=2, params=prm,
                                        cheb_degree=4,
                                        storage_dtype=STORAGE)
    Adia = grid_system_fused(A, slots, nflat, dtype=jnp.float32)
    Mop = fused_operator(vc)
    Aop = dia_matvec_op(Adia)
    bk = jnp.zeros(nflat, dtype=jnp.float32).at[jnp.asarray(slots)].set(
        jnp.asarray(b, dtype=jnp.float32))

    t_cycle = timeit("V-cycle (fused kernel)", chain, Mop, bk, REPS)
    t_mv = timeit("A matvec (PDIA kernel)", chain, Aop, bk, REPS)

    # one full PCG step as the solver runs it
    def step(ops, state):
        Af, Mf = ops
        x, r, z, pv, rz = state
        Ap = Af(pv)
        alpha = rz / (jnp.vdot(pv, Ap).real + 1e-30)
        x = x + alpha * pv
        r = r - alpha * Ap
        z = Mf(r)
        rz2 = jnp.vdot(r, z).real
        beta = rz2 / (rz + 1e-30)
        pv = z + beta * pv
        return x, r, z, pv, rz2

    @partial(jax.jit, static_argnames=("reps",))
    def chain_step(Af, Mf, state, reps):
        def body(c, _):
            return step((Af, Mf), c), None
        out, _ = jax.lax.scan(body, state, None, length=reps)
        return out

    z0 = Mop(bk)
    state = (jnp.zeros_like(bk), bk, z0, z0, jnp.vdot(bk, z0).real)
    y = chain_step(Aop, Mop, state, REPS)
    jax.block_until_ready(y)
    t0 = time.time()
    y = chain_step(Aop, Mop, state, REPS)
    float(y[0][0])
    t_step = (time.time() - t0) / REPS
    print(f"{'CG step (scan chain)':28s} {t_step*1e6:9.1f} us/apply",
          flush=True)
    print(f"{'  vector/dot overhead':28s} "
          f"{(t_step - t_cycle - t_mv)*1e6:9.1f} us", flush=True)

    # the production chunked pcg for reference
    res = pcg(Aop, bk, M=Mop, tol=1e-12, maxiter=REPS, chunk=REPS)
    jax.block_until_ready(res.x)
    t0 = time.time()
    res = pcg(Aop, bk, M=Mop, tol=1e-12, maxiter=REPS, chunk=REPS)
    jax.block_until_ready(res.x)
    t_pcg = (time.time() - t0) / max(res.niters, 1)
    print(f"{'pcg() per iteration':28s} {t_pcg*1e6:9.1f} us "
          f"(niters={res.niters})", flush=True)


if __name__ == "__main__":
    main()
