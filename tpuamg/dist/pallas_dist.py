"""Sharded Pallas kernels for the distributed grid path.

Round-1 backlog item "Pallas kernels in the *distributed* path": the
GSPMD-sharded solve (dist/solve.py) previously ran the XLA DIA slice
loop (~3*ndiags ops per operator apply — dispatch-bound on the remote
TPU runtime, docs/PERF_NOTES.md).  This module wraps the fused
multi-diagonal kernels of sparse/dia_pallas.py in ``jax.shard_map``
with an explicit ppermute halo exchange, so each device runs ONE fused
kernel per operator apply / Chebyshev step on its row shard.

Distribution is *exact* (not block-Jacobi-style): every A-application
inside the Chebyshev recurrence gets a fresh halo, so the distributed
smoother computes the same polynomial as the single-device one and PCG
iteration counts are device-count independent (tested on the 8-device
virtual CPU mesh against the unsharded path).

Layout contract (``plan_sharded``): flat length n = nrows * 128 with
nrows divisible by ndev and local rows divisible by 8 — i.e.
n % (1024 * ndev) == 0.  dist/solve.py pads the problem grid on all
axes to meet this (pad_grid_problem mults); levels whose size fails the
contract keep the XLA smoother (graceful per-level fallback).

The reference has no distributed path at all (SURVEY.md §2b "MPI:
none"); this is the TPU-native scaling layer on top of the serial
algorithm of /root/reference/src/amg_parameters.py presets.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..sparse.dia import DIA
from ..sparse.dia_pallas import (LANES, HAS_PALLAS, _round_up, _shifted,
                                 _spmv_call, _residual_call, _cheb_coefs, _diag_sum,
                                 _pack_blocks, blockinv_dia)

if HAS_PALLAS:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

shard_map = jax.shard_map


def plan_sharded(n, ndev, offsets):
    """(padr, rb, rl): halo rows, kernel row-block, local rows per device.

    Raises ValueError when the layout contract cannot be met (caller
    falls back to the XLA path)."""
    if n % (LANES * ndev):
        raise ValueError(f"n={n} not divisible by 128*ndev={LANES * ndev}")
    nrows = n // LANES
    rl = nrows // ndev
    if rl % 8:
        raise ValueError(f"local rows {rl} not a multiple of 8")
    maxabs = max((abs(int(o)) for o in offsets), default=0)
    padr = _round_up(maxabs // LANES + 1, 8)
    if padr > rl:
        raise ValueError(f"halo ({padr} rows) wider than a shard ({rl})")
    rb = 0
    for cand in range(min(128, rl), 0, -8):
        if rl % cand == 0:
            rb = cand
            break
    if not rb:
        raise ValueError(f"no multiple-of-8 row-block divides rl={rl}")
    return padr, rb, rl


def _exchange(x2, padr, ndev, axis="p"):
    """(rl, 128) local block -> (rl + 2*padr, 128) with neighbor halos.

    Non-wrapping ppermute: edge devices receive zeros, which is exactly
    correct — the DIA planes are zero outside the matrix range."""
    fwd = [(i, i + 1) for i in range(ndev - 1)]
    bwd = [(i + 1, i) for i in range(ndev - 1)]
    top = jax.lax.ppermute(x2[-padr:], axis, fwd)   # prev device's tail
    bot = jax.lax.ppermute(x2[:padr], axis, bwd)    # next device's head
    return jnp.concatenate([top, x2, bot], axis=0)


@jax.tree_util.register_pytree_node_class
class ShardedPDIA:
    """Row-sharded Pallas DIA operator.

    data2: (ndiags, nrows, 128) diagonal planes, sharded P(None,"p",None).
    matvec / residual = ONE shard_map region: ppermute halo exchange +
    the fused multi-diagonal kernel per shard.  Duck-type compatible
    with sparse.dia.DIA on the solve path."""

    def __init__(self, offsets, data2, shape, nnz, padr, rb, mesh,
                 interpret=False):
        self.offsets = tuple(int(o) for o in offsets)
        self.data2 = data2
        self.shape = tuple(shape)
        self.nnz = int(nnz)
        self.padr = int(padr)
        self.rb = int(rb)
        self.mesh = mesh
        self.interpret = bool(interpret)

    def tree_flatten(self):
        return ((self.data2,), (self.offsets, self.shape, self.nnz,
                                self.padr, self.rb, self.mesh,
                                self.interpret))

    @classmethod
    def tree_unflatten(cls, aux, ch):
        (data2,) = ch
        return cls(aux[0], data2, *aux[1:])

    @property
    def dtype(self):
        return self.data2.dtype

    @classmethod
    def from_dia(cls, A: DIA, mesh, interpret=False) -> "ShardedPDIA":
        n = A.shape[0]
        ndev = mesh.shape["p"]
        padr, rb, _rl = plan_sharded(n, ndev, A.offsets)
        nd = len(A.offsets)
        data2 = jnp.asarray(A.data).reshape(nd, n // LANES, LANES)
        data2 = jax.device_put(
            data2, NamedSharding(mesh, P(None, "p", None)))
        return cls(A.offsets, data2, A.shape, A.nnz, padr, rb, mesh,
                   interpret)

    def matvec(self, x):
        ndev = self.mesh.shape["p"]
        offsets, padr, rb = self.offsets, self.padr, self.rb
        interpret = self.interpret

        def body(xl, d2):
            xp = _exchange(xl.reshape(-1, LANES), padr, ndev)
            y2 = _spmv_call(offsets, padr, rb, interpret,
                            xp.astype(jnp.float32), d2)
            return y2.reshape(-1).astype(xl.dtype)

        return shard_map(body, mesh=self.mesh,
                         in_specs=(P("p"), P(None, "p", None)),
                         out_specs=P("p"), check_vma=False)(x, self.data2)

    def residual(self, x, b):
        ndev = self.mesh.shape["p"]
        offsets, padr, rb = self.offsets, self.padr, self.rb
        interpret = self.interpret

        def body(xl, bl, d2):
            xp = _exchange(xl.reshape(-1, LANES), padr, ndev)
            b2 = bl.reshape(-1, LANES)
            y2 = _residual_call(offsets, padr, rb, interpret,
                                xp.astype(jnp.float32), b2, d2)
            return y2.reshape(-1).astype(xl.dtype)

        return shard_map(body, mesh=self.mesh,
                         in_specs=(P("p"), P("p"), P(None, "p", None)),
                         out_specs=P("p"), check_vma=False)(x, b, self.data2)

    def __matmul__(self, x):
        return self.matvec(x)

    def diagonal(self):
        n = self.shape[0]
        if 0 in self.offsets:
            return self.data2[self.offsets.index(0)].reshape(-1)[:n]
        return jnp.zeros(n, dtype=self.dtype)

    def astype(self, dtype):
        return ShardedPDIA(self.offsets, self.data2.astype(dtype),
                           self.shape, self.nnz, self.padr, self.rb,
                           self.mesh, self.interpret)


# ---------------------------------------------------------------------------
# One fused Chebyshev STEP: residual sweep (A, halo'd x) + block-inverse
# sweep (C, local) + recurrence update + iterate update, one kernel.
# The degree-k smoother is k such launches with a halo exchange between
# them — the distributed-exact decomposition of dia_pallas._cheb_kernel
# (which keeps x VMEM-resident across steps; here x must leave the
# kernel between steps so its halo can be refreshed over ICI).
# ---------------------------------------------------------------------------

def _cheb_step_kernel(offsA, offsC, p, rb, nblocks, first, ak, ck, theta,
                      xh_ref, b_ref, d_ref, dataA_ref, dataC_ref,
                      xout_ref, dout_ref, t_ref, bufA, bufC, semA, semC):
    nrows = nblocks * rb
    lane = jax.lax.broadcasted_iota(jnp.int32, (rb, LANES), 1)
    t_ref[:] = jnp.zeros_like(t_ref)

    def sweep(data_ref, buf, sem, src_ref, offs, write):
        # fully unrolled blocks, double-buffered plane DMA (see
        # dia_pallas._cheb_kernel for the rationale)
        def dma(slot, blk):
            return pltpu.make_async_copy(data_ref.at[blk], buf.at[slot],
                                         sem.at[slot])
        dma(0, 0).start()
        for blk in range(nblocks):
            slot = blk % 2
            if blk + 1 < nblocks:
                dma((blk + 1) % 2, blk + 1).start()
            dma(slot, blk).wait()
            base = blk * rb
            xblk = src_ref[base:base + rb + 2 * p, :]
            rolls = {}
            acc = _diag_sum(offs, lambda d, off: buf[slot, d] * _shifted(
                xblk, rolls, lane, p, rb, off))
            write(base, acc)

    def w_t(base, acc):
        t_ref[pl.ds(p + base, rb), :] = (
            b_ref[pl.ds(base, rb), :].astype(jnp.float32) - acc)
    sweep(dataA_ref, bufA, semA, xh_ref, offsA, w_t)

    if first:
        def w_d(base, acc):
            dout_ref[pl.ds(base, rb), :] = (1.0 / theta) * acc
    else:
        def w_d(base, acc):
            dout_ref[pl.ds(base, rb), :] = (
                ak * d_ref[pl.ds(base, rb), :] + ck * acc)
    sweep(dataC_ref, bufC, semC, t_ref, offsC, w_d)
    xout_ref[:] = xh_ref[p:p + nrows, :] + dout_ref[:]


@partial(jax.jit, static_argnames=("offsA", "offsC", "p", "rb", "first",
                                   "ak", "ck", "theta", "interpret"))
def _cheb_step_call(offsA, offsC, p, rb, first, ak, ck, theta, interpret,
                    xh2, b2, d2, dataA4, dataC4):
    nblocks, ndA = dataA4.shape[0], dataA4.shape[1]
    ndC = dataC4.shape[1]
    nrows = nblocks * rb
    kern = partial(_cheb_step_kernel, offsA, offsC, p, rb, nblocks, first,
                   ak, ck, theta)
    with jax.enable_x64(False):
        return pl.pallas_call(
            kern,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),   # x (halo'd)
                pl.BlockSpec(memory_space=pltpu.VMEM),   # b
                pl.BlockSpec(memory_space=pltpu.VMEM),   # d (carry in)
                pl.BlockSpec(memory_space=pl.ANY),       # A planes (HBM)
                pl.BlockSpec(memory_space=pl.ANY),       # C planes (HBM)
            ],
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct((nrows, LANES), jnp.float32),
                       jax.ShapeDtypeStruct((nrows, LANES), jnp.float32)),
            scratch_shapes=[
                pltpu.VMEM((nrows + 2 * p, LANES), jnp.float32),   # t
                pltpu.VMEM((2, ndA, rb, LANES), dataA4.dtype),
                pltpu.VMEM((2, ndC, rb, LANES), dataC4.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(xh2, b2, d2, dataA4, dataC4)


@jax.tree_util.register_pytree_node_class
class ShardedChebSmoother:
    """Distributed Chebyshev smoother: per step one ppermute halo
    exchange + one fused Pallas kernel, all inside a single shard_map
    region per smooth() call.

    Same recurrence as BlockChebyshevSmoother / FusedChebSmoother
    (amg/structured.py:82, sparse/dia_pallas.py) — the mask is folded
    into the C (block-inverse) planes, and C's pair blocks never cross
    a shard boundary (checked at build), so no C halo is needed.
    Symmetric (reverse is a no-op)."""

    def __init__(self, dataA4, offsA, dataC4, offsC, dataA2, n, padr, rb,
                 lmax, lmin, degree, mesh, interpret=False, n_orig=None):
        self.dataA4 = dataA4     # (nblocks, ndA, rb, 128) P("p",...)
        self.dataC4 = dataC4
        self.dataA2 = dataA2     # (ndA, nrows, 128) P(None,"p",None) —
        #                          the residual kernel's plane layout,
        #                          precomputed so smooth_residual does no
        #                          per-apply transpose of the big planes
        self.offsA = tuple(int(o) for o in offsA)
        self.offsC = tuple(int(o) for o in offsC)
        self.n = int(n)
        self.padr = int(padr)
        self.rb = int(rb)
        self.lmax = lmax
        self.lmin = lmin
        self.degree = int(degree)
        self.mesh = mesh
        self.interpret = bool(interpret)
        self.n_orig = int(n if n_orig is None else n_orig)

    def tree_flatten(self):
        return ((self.dataA4, self.dataC4, self.dataA2),
                (self.offsA, self.offsC, self.n, self.padr, self.rb,
                 self.lmax, self.lmin, self.degree, self.mesh,
                 self.interpret, self.n_orig))

    @classmethod
    def tree_unflatten(cls, aux, ch):
        dataA4, dataC4, dataA2 = ch
        return cls(dataA4, aux[0], dataC4, aux[1], dataA2, *aux[2:])

    @classmethod
    def build(cls, A_dia: DIA, blockinv, mask, lmax, lmin, degree, mesh,
              interpret=False) -> "ShardedChebSmoother":
        """blockinv: (ng, F, F) host array; mask folded into C planes.

        Levels whose size misses the kernel layout contract
        (n % 128*8*ndev, F-block shard alignment) are padded here with
        inert identity rows (zero C rows -> the smoother never touches
        them); smooth() pads/slices the iterate around the shard_map.
        This removes the per-level XLA fallback of round 1 — every
        sharded level runs the exact kernels (VERDICT item 9)."""
        import math
        n_orig = A_dia.shape[0]
        ndev = mesh.shape["p"]
        bi = np.asarray(blockinv)
        F = bi.shape[1]
        unit = math.lcm(LANES * 8 * ndev, F)
        n = -(-n_orig // unit) * unit
        if n != n_orig:
            nd = A_dia.data.shape[0]
            host = np.asarray(A_dia.data)
            data = np.zeros((nd, n), dtype=host.dtype)
            data[:, :n_orig] = host
            if 0 in A_dia.offsets:
                data[list(A_dia.offsets).index(0), n_orig:] = 1.0
            A_dia = DIA(A_dia.offsets, jnp.asarray(data), (n, n),
                        A_dia.nnz)
            bi2 = np.zeros((n // F, F, F), dtype=bi.dtype)
            bi2[:bi.shape[0]] = bi
            bi2[bi.shape[0]:] = np.eye(F)
            bi = bi2
            mask = np.concatenate(
                [np.asarray(mask), np.zeros(n - n_orig)])
        coffs, cdata = blockinv_dia(bi, np.asarray(mask))
        all_offs = tuple(A_dia.offsets) + tuple(coffs)
        padr, rb, rl = plan_sharded(n, ndev, all_offs)
        if (rl * LANES) % F:
            raise ValueError(
                f"F={F} blocks straddle the shard boundary (rl={rl})")
        nrows = n // LANES
        dt = A_dia.data.dtype
        dataA4 = _pack_blocks(jnp.asarray(A_dia.data), n, nrows, rb)
        dataC4 = _pack_blocks(jnp.asarray(cdata, dtype=dt), n, nrows, rb)
        dataA2 = jnp.asarray(A_dia.data).reshape(-1, nrows, LANES)
        sp4 = NamedSharding(mesh, P("p", None, None, None))
        sp2 = NamedSharding(mesh, P(None, "p", None))
        return cls(jax.device_put(dataA4, sp4), A_dia.offsets,
                   jax.device_put(dataC4, sp4), coffs,
                   jax.device_put(dataA2, sp2), n, padr, rb,
                   lmax, lmin, degree, mesh, interpret, n_orig=n_orig)

    def _padded(self, v):
        return jnp.pad(v, (0, self.n - self.n_orig)) \
            if self.n != self.n_orig else v

    def smooth(self, A, x, b, iters=1, reverse=False):
        del A, reverse    # symmetric; operator planes are carried
        x, b = self._padded(x), self._padded(b)
        theta, coefs = _cheb_coefs(self.lmax, self.lmin, self.degree)
        ndev = self.mesh.shape["p"]
        offsA, offsC = self.offsA, self.offsC
        padr, rb, degree = self.padr, self.rb, self.degree
        interpret = self.interpret

        def body(xl, bl, dA4, dC4):
            x2 = xl.reshape(-1, LANES).astype(jnp.float32)
            b2 = bl.reshape(-1, LANES)
            d2 = jnp.zeros_like(x2)
            for _ in range(int(iters)):
                for k in range(degree):
                    xp = _exchange(x2, padr, ndev)
                    ak, ck = (0.0, 0.0) if k == 0 else coefs[k - 1]
                    x2, d2 = _cheb_step_call(
                        offsA, offsC, padr, rb, k == 0, ak, ck, theta,
                        interpret, xp, b2, d2, dA4, dC4)
            return x2.reshape(-1).astype(xl.dtype)

        y = shard_map(body, mesh=self.mesh,
                      in_specs=(P("p"), P("p"),
                                P("p", None, None, None),
                                P("p", None, None, None)),
                      out_specs=P("p"), check_vma=False)(
            x, b, self.dataA4, self.dataC4)
        return y[:self.n_orig]

    def smooth_residual(self, A, x, b, iters=1):
        """(x_smoothed, b - A x_smoothed): the residual sweep reuses the
        step kernel's machinery with one extra exchange + launch."""
        del A
        x, b = self._padded(x), self._padded(b)
        theta, coefs = _cheb_coefs(self.lmax, self.lmin, self.degree)
        ndev = self.mesh.shape["p"]
        offsA, offsC = self.offsA, self.offsC
        padr, rb, degree = self.padr, self.rb, self.degree
        interpret = self.interpret

        def body(xl, bl, dA4, dC4, dA2):
            x2 = xl.reshape(-1, LANES).astype(jnp.float32)
            b2 = bl.reshape(-1, LANES)
            d2 = jnp.zeros_like(x2)
            for _ in range(int(iters)):
                for k in range(degree):
                    xp = _exchange(x2, padr, ndev)
                    ak, ck = (0.0, 0.0) if k == 0 else coefs[k - 1]
                    x2, d2 = _cheb_step_call(
                        offsA, offsC, padr, rb, k == 0, ak, ck, theta,
                        interpret, xp, b2, d2, dA4, dC4)
            xp = _exchange(x2, padr, ndev)
            r2 = _residual_call(offsA, padr, rb, interpret, xp, b2, dA2)
            return (x2.reshape(-1).astype(xl.dtype),
                    r2.reshape(-1).astype(xl.dtype))

        y, r = shard_map(body, mesh=self.mesh,
                         in_specs=(P("p"), P("p"),
                                   P("p", None, None, None),
                                   P("p", None, None, None),
                                   P(None, "p", None)),
                         out_specs=(P("p"), P("p")), check_vma=False)(
            x, b, self.dataA4, self.dataC4, self.dataA2)
        return y[:self.n_orig], r[:self.n_orig]
