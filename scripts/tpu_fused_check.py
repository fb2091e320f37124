"""TPU validation + timing for the fused whole-V-cycle kernel
(amg/grid_fused.py).

Run with the plain environment (TPU tunnel active), single process:
    PYTHONPATH=.:/root/.axon_site timeout 3600 python scripts/tpu_fused_check.py

Stages:
  1. correctness at n=64: Mosaic kernel vs the same kernel in interpret
     mode (identical f32 algorithm; any Mosaic lowering bug shows up);
  2. timing at n=N (default 512): per-cycle wall time via chained
     applications synchronized by value fetches;
  3. PCG iteration-count parity at n=N vs the per-smoother-launch path.
"""
import os
import time
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
                                   fused_operator, fused_vmem_bytes)
from tpuamg.krylov.cg import pcg
from tpuamg.sparse.dia import dia_matvec_op

N = int(os.environ.get("TPUAMG_FUSED_N", "512"))
REPS = int(os.environ.get("TPUAMG_FUSED_REPS", "50"))
GAMMA = 1e6


def build(n, coarse_dof, degree):
    p = Params(2.0, 3.0, GAMMA)
    data = mms.setup_bidomain_mms(p, dim=2)
    mesh = get_mesh(n, 2)
    A, b, sizes, _ = get_system(mesh, data, p)
    prm = AMGParameters(cycle_type="v", maxit=1, coarse_dof=coarse_dof,
                        dtype="float32")
    return A, b, prm


def kernel_vec(b, slots, nflat):
    return jnp.zeros(nflat, dtype=jnp.float32).at[
        jnp.asarray(slots)].set(jnp.asarray(b, dtype=jnp.float32))


from functools import partial


@partial(jax.jit, static_argnames=("reps",))
def chain(op, x, reps):
    def body(c, _):
        y = op(c)
        return y / (jnp.linalg.norm(y) + 1e-30), None
    y, _ = jax.lax.scan(body, x, None, length=reps)
    return y


def main():
    print("backend:", jax.default_backend(), flush=True)

    # ---- stage 1: small correctness --------------------------------
    A, b, prm = build(64, 60, 3)
    t0 = time.time()
    vc, slots, nflat = setup_grid_fused(A, (65, 65), F=2, params=prm)
    print(f"setup n=64: {time.time()-t0:.1f}s "
          f"vmem={fused_vmem_bytes(vc.spec)/2**20:.1f}MB", flush=True)
    vi = setup_grid_fused(A, (65, 65), F=2, params=prm,
                          interpret=True)[0]
    bk = kernel_vec(b, slots, nflat)
    t0 = time.time()
    z = np.asarray(vc.matvec(bk))
    print(f"mosaic compile+run n=64: {time.time()-t0:.1f}s", flush=True)
    zi = np.asarray(vi.matvec(bk))
    err = np.linalg.norm(z - zi) / (np.linalg.norm(zi) + 1e-30)
    print(f"n=64 mosaic vs interpret rel err: {err:.2e}", flush=True)
    assert err < 1e-5, err

    # ---- stage 2: timing at n=N -------------------------------------
    A, b, prm = build(N, 2048, 4)
    t0 = time.time()
    vc, slots, nflat = setup_grid_fused(A, (N + 1, N + 1), F=2,
                                        params=prm, cheb_degree=4)
    print(f"setup n={N}: {time.time()-t0:.1f}s "
          f"vmem={fused_vmem_bytes(vc.spec)/2**20:.1f}MB", flush=True)
    bk = kernel_vec(b, slots, nflat)
    op = fused_operator(vc)
    t0 = time.time()
    y = chain(op, bk, REPS)
    float(y[0])
    print(f"compile+first chain: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    y = chain(op, bk, REPS)
    float(y[0])
    dt = (time.time() - t0) / REPS
    print(f"fused V-cycle: {dt*1e6:9.1f} us/apply", flush=True)

    # ---- stage 3: PCG parity at n=N ---------------------------------
    Ak = grid_system_fused(A, slots, nflat, dtype=jnp.float32)
    Aop = dia_matvec_op(Ak)
    t0 = time.time()
    res = pcg(Aop, bk, M=op, tol=1e-6, maxiter=60)
    t_solve = time.time() - t0
    print(f"PCG n={N}: iters={res.niters} converged={res.converged} "
          f"time={t_solve:.2f}s (incl chunk compiles)", flush=True)
    t0 = time.time()
    res = pcg(Aop, bk, M=op, tol=1e-6, maxiter=60)
    t_solve = time.time() - t0
    per_it = t_solve / max(res.niters, 1)
    nnz_iter = 36945212 if N == 512 else None
    msg = f"PCG warm: {t_solve:.3f}s / {res.niters} it = {per_it*1e3:.2f} ms/it"
    if nnz_iter:
        msg += f"  ({nnz_iter/per_it/1e9:.2f} Gnnz/s)"
    print(msg, flush=True)


if __name__ == "__main__":
    main()
