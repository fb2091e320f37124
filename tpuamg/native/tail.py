"""Native (C++/OpenMP) executor for the host-side f64 algebraic tail.

``build_native_tail(prec)`` converts a jax ``MGPreconditioner`` pytree
(cycle='v', maxit=1, UA transfers — the .dat metric-tail configuration)
into a tailkit.cpp handle whose ``apply`` runs the identical V-cycle from
CSR + ragged block data with OpenMP threads.  Measured motivation: the
jax-CPU tail pays padded-ELL reads sized by the MAX row length (the
3D-1D curve rows are ~1000x wider than the bulk stencil) plus padded
batched-dense Schwarz einsums on one core — ~30 s per 383k-dof cycle;
the native cycle is sub-second (docs/PERF_NOTES.md round 5).

Returns None (caller falls back to the jax tail) for any structure the
executor does not cover: non-V cycles, maxit>1, SA transfers, smoother
types outside {MetricSmoother, MulticolorGS, Chebyshev, Jacobi,
Schwarz}.  Parity vs the jax tail is tested in tests/test_native_tail.py.
"""
from __future__ import annotations

import ctypes

import numpy as np

from . import get_lib

SM_GS = 1
SM_METRIC_GS = 2
SM_SCHWARZ = 3
SM_CHEB = 4
SM_METRIC_CHEB = 5
SM_JACOBI = 6

_configured = False


def _lib():
    global _configured
    lib = get_lib()
    if lib is None or not hasattr(lib, "tk_create"):
        return None
    if not _configured:
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C")
        c = ctypes
        lib.tk_create.restype = c.c_int64
        lib.tk_free.argtypes = [c.c_int64]
        lib.tk_set_opts.argtypes = [c.c_int64, c.c_int32, c.c_int32,
                                    c.c_int32]
        lib.tk_add_level.argtypes = [c.c_int64, c.c_int64, c.c_int64,
                                     i64p, i32p, f64p, i32p, c.c_int64]
        lib.tk_level_gs.argtypes = [c.c_int64, c.c_int64, c.c_int32,
                                    i64p, i32p, f64p, c.c_double,
                                    c.c_int32]
        lib.tk_level_schwarz.argtypes = [c.c_int64, c.c_int64, c.c_int64,
                                         i64p, i32p, i64p, f64p, i32p,
                                         c.c_int32, c.c_double, c.c_int32]
        lib.tk_level_cheb.argtypes = [c.c_int64, c.c_int64, f64p,
                                      c.c_double, c.c_double, c.c_int32]
        lib.tk_level_jacobi.argtypes = [c.c_int64, c.c_int64, f64p,
                                        c.c_double]
        lib.tk_level_kind.argtypes = [c.c_int64, c.c_int64, c.c_int32]
        lib.tk_set_coarse.argtypes = [c.c_int64, c.c_int64, f64p]
        lib.tk_apply.argtypes = [c.c_int64, f64p, f64p]
        lib.tk_num_threads.restype = c.c_int32
        _configured = True
    return lib


class NativeTail:
    """Owns one tailkit handle; apply(rc) -> ec, both f64 numpy."""

    def __init__(self, handle, n0, lib):
        self._h = handle
        self.n0 = n0
        self._lib = lib

    def apply(self, rc):
        rc = np.ascontiguousarray(rc, dtype=np.float64)
        assert len(rc) == self.n0, (len(rc), self.n0)
        out = np.empty(self.n0, dtype=np.float64)
        self._lib.tk_apply(self._h, rc, out)
        return out

    def __del__(self):
        try:
            self._lib.tk_free(self._h)
        except Exception:
            pass


class _Unsupported(Exception):
    pass


def _f64(a):
    return np.ascontiguousarray(np.asarray(a), dtype=np.float64)


def _i32(a):
    return np.ascontiguousarray(np.asarray(a), dtype=np.int32)


def _i64(a):
    return np.ascontiguousarray(np.asarray(a), dtype=np.int64)


def _attach_gs(lib, h, lvl, gs):
    ids_all, invd_all, cptr = [], [], [0]
    for ids, invd in zip(gs.color_ids, gs.color_invd):
        ids_all.append(_i32(ids))
        invd_all.append(_f64(invd))
        cptr.append(cptr[-1] + len(ids_all[-1]))
    lib.tk_level_gs(h, lvl, len(cptr) - 1, _i64(cptr),
                    np.concatenate(ids_all) if ids_all else
                    np.empty(0, np.int32),
                    np.concatenate(invd_all) if invd_all else
                    np.empty(0, np.float64),
                    float(gs.omega), int(bool(gs.symmetric)))


def _attach_schwarz(lib, h, lvl, sw, n):
    if getattr(sw, "additive", False):
        raise _Unsupported("additive Schwarz")
    ids_all, inv_all, colors = [], [], []
    bptr, fptr = [0], [0]
    for c, (ids_c, inv_c) in enumerate(zip(sw.dof_ids, sw.inv_blocks)):
        ids_c = np.asarray(ids_c)
        inv_c = _f64(inv_c)
        for bk in range(ids_c.shape[0]):
            row = ids_c[bk]
            sz = int(np.sum(row < n))
            if sz == 0:
                continue
            if np.any(row[:sz] >= n):      # pad must be trailing
                raise _Unsupported("non-trailing block padding")
            ids_all.append(_i32(row[:sz]))
            inv_all.append(
                np.ascontiguousarray(inv_c[bk, :sz, :sz]).reshape(-1))
            colors.append(c)
            bptr.append(bptr[-1] + sz)
            fptr.append(fptr[-1] + sz * sz)
    nb = len(colors)
    lib.tk_level_schwarz(
        h, lvl, nb, _i64(bptr),
        np.concatenate(ids_all) if ids_all else np.empty(0, np.int32),
        _i64(fptr),
        np.concatenate(inv_all) if inv_all else np.empty(0, np.float64),
        _i32(colors), len(sw.dof_ids), float(sw.weight),
        int(bool(sw.symmetric)))


def _attach_smoother(lib, h, lvl, sm, n):
    from ..smoothers.schwarz import MetricSmoother, SchwarzSmoother
    from ..smoothers.relaxation import (MulticolorGS, ChebyshevSmoother,
                                        JacobiSmoother)
    if isinstance(sm, MetricSmoother):
        _attach_schwarz(lib, h, lvl, sm.schwarz, n)
        if sm.gs is None:
            lib.tk_level_kind(h, lvl, SM_SCHWARZ)
        elif isinstance(sm.gs, MulticolorGS):
            _attach_gs(lib, h, lvl, sm.gs)
            lib.tk_level_kind(h, lvl, SM_METRIC_GS)
        elif isinstance(sm.gs, ChebyshevSmoother):
            lib.tk_level_cheb(h, lvl, _f64(sm.gs.invd), float(sm.gs.lmax),
                              float(sm.gs.lmin), int(sm.gs.degree))
            lib.tk_level_kind(h, lvl, SM_METRIC_CHEB)
        else:
            raise _Unsupported(type(sm.gs).__name__)
    elif isinstance(sm, SchwarzSmoother):
        _attach_schwarz(lib, h, lvl, sm, n)
        lib.tk_level_kind(h, lvl, SM_SCHWARZ)
    elif isinstance(sm, MulticolorGS):
        _attach_gs(lib, h, lvl, sm)
        lib.tk_level_kind(h, lvl, SM_GS)
    elif isinstance(sm, ChebyshevSmoother):
        lib.tk_level_cheb(h, lvl, _f64(sm.invd), float(sm.lmax),
                          float(sm.lmin), int(sm.degree))
        lib.tk_level_kind(h, lvl, SM_CHEB)
    elif isinstance(sm, JacobiSmoother):   # covers L1Jacobi subclass
        lib.tk_level_jacobi(h, lvl, _f64(sm.invd), float(sm.omega))
        lib.tk_level_kind(h, lvl, SM_JACOBI)
    else:
        raise _Unsupported(type(sm).__name__)


def build_native_tail(prec):
    """MGPreconditioner -> NativeTail, or None when not convertible."""
    import os
    if os.environ.get("TPUAMG_NO_NATIVE") \
            or os.environ.get("TPUAMG_NO_NATIVE_TAIL"):
        return None
    lib = _lib()
    if lib is None:
        return None
    if prec.cycle != "v" or prec.maxit != 1:
        return None
    h = lib.tk_create()
    try:
        for lvl, L in enumerate(prec.levels):
            if L.agg is None:
                raise _Unsupported("SA transfers")
            A = L.A.to_host()
            n = A.shape[0]
            if np.asarray(A.data).dtype != np.float64:
                # the tail contract is f64; narrower levels would
                # silently change the preconditioner
                raise _Unsupported("non-f64 level")
            lib.tk_add_level(h, n, A.nnz, _i64(A.indptr),
                             _i32(A.indices), _f64(A.data),
                             _i32(L.agg), int(L.nc))
            _attach_smoother(lib, h, lvl, L.smoother, n)
        cinv = _f64(prec.coarse_inv)
        lib.tk_set_coarse(h, cinv.shape[0], cinv.reshape(-1))
        lib.tk_set_opts(h, int(prec.presmooth), int(prec.postsmooth),
                        int(bool(prec.coarse_scaling)))
    except _Unsupported:
        lib.tk_free(h)
        return None
    except Exception:
        lib.tk_free(h)
        return None
    n0 = prec.levels[0].A.shape[0] if prec.levels else cinv.shape[0]
    return NativeTail(h, n0, lib)
