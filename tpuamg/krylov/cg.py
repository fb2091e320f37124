"""Preconditioned Conjugate Gradient, fully jittable, with the diagnostics
surface of cbc.block's ConjGrad (SURVEY.md §2b "cbc.block"):

- residual history (B-inner-product norms sqrt(r·z), as cbc.block records)
  plus true l2 recurrence-residual history,
- Lanczos coefficients (alpha/beta) -> tridiagonal eigenvalue estimates
  -> condition number of the preconditioned operator
  (/root/reference/src/bidomain_2d.py:213-216),
- relative-tolerance stopping `sqrt(rz) < tol * sqrt(rz0)`,
- arbitrary linear-operator preconditioners.

The loop body is a `lax.while_loop` with a statically-shaped history buffer:
one compiled XLA program per (n, maxiter) — the whole solve runs on device
with no per-iteration host crossings, mirroring the reference's "everything
in C" fast path (/root/reference/src/utils.py:119) rather than its
Python-per-iteration slow path.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


@dataclass
class CGResult:
    x: object
    niters: int
    converged: bool
    residuals: np.ndarray        # sqrt(r·z) history, length niters+1
    true_residuals: np.ndarray   # ||r||_2 recurrence history
    alphas: np.ndarray
    betas: np.ndarray

    def eigenvalue_estimates(self):
        """Eigenvalue estimates of B·A from the CG Lanczos tridiagonal
        (the cbc.block `eigenvalue_estimates` contract)."""
        k = len(self.alphas)
        if k == 0:
            return np.array([1.0])
        a = np.asarray(self.alphas, dtype=np.float64)
        b = np.asarray(self.betas, dtype=np.float64)
        diag = 1.0 / a
        diag[1:] += b[:-1] / a[:-1]
        off = np.sqrt(np.maximum(b[:-1], 0.0)) / a[:-1]
        return np.linalg.eigvalsh(
            np.diag(diag) + np.diag(off, 1) + np.diag(off, -1))

    @property
    def cond(self):
        ev = self.eigenvalue_estimates()
        lo = ev.min()
        return float(ev.max() / lo) if lo > 0 else float("inf")


def _identity(r):
    return r


@partial(jax.jit, static_argnames=("maxiter",))
def _pcg_kernel(A, M, b, x0, tol, maxiter):
    """One fused XLA program: full PCG solve with history buffers."""
    dtype = b.dtype
    r = b - A(x0)
    z = M(r)
    rz0 = jnp.vdot(r, z).real
    res_hist = jnp.zeros(maxiter + 1, dtype=dtype).at[0].set(jnp.sqrt(
        jnp.maximum(rz0, 0)))
    true_hist = jnp.zeros(maxiter + 1, dtype=dtype).at[0].set(
        jnp.linalg.norm(r))
    alphas = jnp.zeros(maxiter, dtype=dtype)
    betas = jnp.zeros(maxiter, dtype=dtype)

    def cond_fn(state):
        k, x, r, z, p, rz, res, true, al, be = state
        return (k < maxiter) & (jnp.sqrt(jnp.maximum(rz, 0))
                                > tol * res[0]) & (rz > 0)

    def body_fn(state):
        k, x, r, z, p, rz, res, true, al, be = state
        Ap = A(p)
        pAp = jnp.vdot(p, Ap).real
        alpha = rz / pAp
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = jnp.vdot(r, z).real
        beta = rz_new / rz
        p = z + beta * p
        res = res.at[k + 1].set(jnp.sqrt(jnp.maximum(rz_new, 0)))
        true = true.at[k + 1].set(jnp.linalg.norm(r))
        al = al.at[k].set(alpha)
        be = be.at[k].set(beta)
        return (k + 1, x, r, z, p, rz_new, res, true, al, be)

    state = (jnp.array(0), x0, r, z, z, rz0, res_hist, true_hist,
             alphas, betas)
    k, x, r, z, p, rz, res, true, al, be = jax.lax.while_loop(
        cond_fn, body_fn, state)
    return x, k, res, true, al, be


def pcg(A, b, M=None, x0=None, tol=1e-8, maxiter=500, callback=None):
    """Solve A x = b with PCG; returns CGResult.

    A, M: callables (matvec) or objects with .matvec.  Relative tolerance on
    the preconditioned residual norm, matching the reference's ConjGrad use
    (/root/reference/src/bidomain_2d.py:205).
    """
    Afn = A.matvec if hasattr(A, "matvec") else A
    Mfn = (M.matvec if hasattr(M, "matvec") else M) if M is not None \
        else _identity
    # Operators enter the jitted kernel as pytree-of-data callables so the
    # compile cache keys on *structure*, not Python object identity. A bound
    # method of a pytree (e.g. ELL.matvec) closes over that pytree and is
    # carried along by Partial.
    if not isinstance(Afn, jax.tree_util.Partial):
        Afn = jax.tree_util.Partial(Afn)
    if not isinstance(Mfn, jax.tree_util.Partial):
        Mfn = jax.tree_util.Partial(Mfn)
    b = jnp.asarray(b)
    if x0 is None:
        x0 = jnp.zeros_like(b)
    x, k, res, true, al, be = _pcg_kernel(Afn, Mfn, b, x0,
                                          jnp.asarray(tol, b.dtype),
                                          int(maxiter))
    k = int(k)
    res = np.asarray(res)[:k + 1]
    true = np.asarray(true)[:k + 1]
    if callback is not None:
        for i in range(1, k + 1):
            callback(i, None, true[i])
    converged = bool(k < maxiter) and (len(res) < 2 or res[-1] <= tol * res[0])
    return CGResult(x=x, niters=k, converged=converged, residuals=res,
                    true_residuals=true,
                    alphas=np.asarray(al)[:k], betas=np.asarray(be)[:k])
