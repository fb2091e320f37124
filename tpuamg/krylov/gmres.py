"""Restarted preconditioned GMRES (jittable).

Completes the reference's Krylov selector (CG/MINRES/GMRES,
``/root/reference/src/input_metric.dat`` linear_itsolver_type) for
nonsymmetric operators.  Fixed-size Krylov basis per restart cycle keeps
shapes static under jit; Arnoldi via modified Gram-Schmidt inside
``lax.fori_loop``.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


@dataclass
class GmresResult:
    x: object
    niters: int
    converged: bool
    residuals: np.ndarray


@partial(jax.jit, static_argnames=("restart",))
def _gmres_cycle(A, M, b, x0, restart):
    """One GMRES(restart) cycle. Returns (x_new, resnorm_new)."""
    dtype = b.dtype
    n = b.shape[0]
    m = restart
    r = M(b - A(x0))
    beta = jnp.linalg.norm(r)
    V = jnp.zeros((m + 1, n), dtype=dtype)
    H = jnp.zeros((m + 1, m), dtype=dtype)
    V = V.at[0].set(r / jnp.where(beta > 0, beta, 1.0))

    def arnoldi_step(j, carry):
        # TPU-idiomatic orthogonalization: masked classical Gram-Schmidt
        # with reorthogonalization (CGS2) — two (m+1, n) @ (n,) matmuls on
        # the MXU instead of a sequential per-vector MGS loop (in-loop
        # dynamic indexing is pathological on TPU; docs/PERF_NOTES.md).
        # CGS2 is as stable as MGS in practice.
        V, H = carry
        w = M(A(V[j]))
        mask = (jnp.arange(m + 1) <= j).astype(dtype)
        h1 = (V @ w) * mask
        w = w - V.T @ h1
        h2 = (V @ w) * mask
        w = w - V.T @ h2
        hnorm = jnp.linalg.norm(w)
        H = H.at[:, j].set(h1 + h2)
        H = H.at[j + 1, j].set(hnorm)
        V = V.at[j + 1].set(w / jnp.where(hnorm > 0, hnorm, 1.0))
        return (V, H)

    V, H = jax.lax.fori_loop(0, m, arnoldi_step, (V, H))
    # least squares min ||beta e1 - H y||
    e1 = jnp.zeros(m + 1, dtype=dtype).at[0].set(beta)
    y, *_ = jnp.linalg.lstsq(H, e1)
    x = x0 + V[:m].T @ y
    res = jnp.linalg.norm(M(b - A(x)))
    return x, res


def gmres(A, b, M=None, x0=None, tol=1e-8, maxiter=500, restart=30):
    """Left-preconditioned restarted GMRES; tolerance is relative on the
    preconditioned residual."""
    Afn = A.matvec if hasattr(A, "matvec") else A
    Mfn = (M.matvec if hasattr(M, "matvec") else M) if M is not None \
        else (lambda r: r)
    if not isinstance(Afn, jax.tree_util.Partial):
        Afn = jax.tree_util.Partial(Afn)
    if not isinstance(Mfn, jax.tree_util.Partial):
        Mfn = jax.tree_util.Partial(Mfn)
    b = jnp.asarray(b)
    x = jnp.zeros_like(b) if x0 is None else x0
    r0 = float(jnp.linalg.norm(Mfn(b - Afn(x))))
    residuals = [r0]
    niters = 0
    while niters < maxiter:
        x, res = _gmres_cycle(Afn, Mfn, b, x, int(restart))
        res = float(res)
        niters += min(restart, maxiter - niters)
        residuals.append(res)
        if res <= tol * max(r0, 1e-300):
            return GmresResult(x=x, niters=niters, converged=True,
                               residuals=np.asarray(residuals))
    return GmresResult(x=x, niters=niters, converged=False,
                       residuals=np.asarray(residuals))
