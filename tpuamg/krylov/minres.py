"""Preconditioned MINRES (jittable), for symmetric indefinite systems.

Covers the reference's Krylov-method selector surface (CG/MINRES/GMRES,
``/root/reference/src/input_metric.dat`` linear_itsolver_type) beyond CG.
Standard Paige–Saunders recurrence with a symmetric-positive preconditioner.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


@dataclass
class MinresResult:
    x: object
    niters: int
    converged: bool
    residuals: np.ndarray


@partial(jax.jit, static_argnames=("maxiter",))
def _minres_clean(A, M, b, x0, tol, maxiter):
    dtype = b.dtype
    n = b.shape[0]
    r2 = b - A(x0)          # r_{k}
    r1 = r2                 # r_{k-1}
    y = M(r2)
    beta = jnp.sqrt(jnp.maximum(jnp.vdot(r2, y).real, 0))
    phibar = beta
    res0 = beta
    res_hist = jnp.zeros(maxiter + 1, dtype=dtype).at[0].set(beta)

    zeros = jnp.zeros(n, dtype=dtype)
    state = (jnp.array(0), x0, r1, r2, y, beta, beta,  # k x r1 r2 y beta betaold
             jnp.asarray(0.0, dtype), jnp.asarray(0.0, dtype),  # dbar epsln
             phibar, jnp.asarray(-1.0, dtype), jnp.asarray(0.0, dtype),
             zeros, zeros, res_hist)

    def cond_fn(s):
        k = s[0]
        phibar_ = s[9]
        beta_ = s[5]
        return (k < maxiter) & (phibar_ > tol * res0) & (beta_ > 0)

    def body_fn(s):
        (k, x, r1, r2, y, beta, betaold, dbar, epsln, phibar_, cs, sn,
         w, w2, res) = s
        v = y / beta
        yk = A(v)
        yk = jnp.where(k >= 1, yk - (beta / betaold) * r1, yk)
        alfa = jnp.vdot(v, yk).real
        yk = yk - (alfa / beta) * r2
        r1n, r2n = r2, yk
        yn = M(r2n)
        betaoldn = beta
        betan = jnp.sqrt(jnp.maximum(jnp.vdot(r2n, yn).real, 0))
        # apply previous rotation
        oldeps = epsln
        delta = cs * dbar + sn * alfa
        gbar = sn * dbar - cs * alfa
        epsln_n = sn * betan
        dbar_n = -cs * betan
        gamma = jnp.sqrt(gbar ** 2 + betan ** 2)
        gamma = jnp.maximum(gamma, jnp.asarray(1e-300, dtype))
        cs_n = gbar / gamma
        sn_n = betan / gamma
        phi = cs_n * phibar_
        phibar_n = sn_n * phibar_
        denom = 1.0 / gamma
        w1 = w2
        w2n = w
        wn = (v - oldeps * w1 - delta * w2n) * denom
        xn = x + phi * wn
        res = res.at[k + 1].set(phibar_n)
        return (k + 1, xn, r1n, r2n, yn, betan, betaoldn, dbar_n,
                epsln_n, phibar_n, cs_n, sn_n, wn, w2n, res)

    out = jax.lax.while_loop(cond_fn, body_fn, state)
    k, x = out[0], out[1]
    return x, k, out[14]


def minres(A, b, M=None, x0=None, tol=1e-8, maxiter=500):
    Afn = A.matvec if hasattr(A, "matvec") else A
    Mfn = (M.matvec if hasattr(M, "matvec") else M) if M is not None \
        else (lambda r: r)
    if not isinstance(Afn, jax.tree_util.Partial):
        Afn = jax.tree_util.Partial(Afn)
    if not isinstance(Mfn, jax.tree_util.Partial):
        Mfn = jax.tree_util.Partial(Mfn)
    b = jnp.asarray(b)
    if x0 is None:
        x0 = jnp.zeros_like(b)
    x, k, res = _minres_clean(Afn, Mfn, b, x0, jnp.asarray(tol, b.dtype),
                              int(maxiter))
    k = int(k)
    res = np.asarray(res)[:k + 1]
    converged = bool(k < maxiter)
    return MinresResult(x=x, niters=k, converged=converged, residuals=res)
