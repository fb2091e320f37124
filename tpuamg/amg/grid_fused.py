"""Whole-V-cycle fused Pallas TPU kernel for the grid path ("mega-kernel").

Why: on the remote TPU runtime every kernel launch costs ~100-250 us of
dispatch overhead and every XLA op ~15 us (docs/PERF_NOTES.md).  The grid
V-cycle previously issued ~2 Pallas launches + ~10 XLA transfer ops PER
LEVEL per PCG iteration (~5.6 ms/iter at n=512).  This module compiles the
ENTIRE multilevel cycle — every Chebyshev smoothing sweep, residual,
restriction, prolongation, and the dense coarse solve — into ONE
`pallas_call`, so a preconditioner application is a single launch whose
cost approaches the HBM-bandwidth bound of streaming the diagonal planes.

Replaces the per-iteration HAZmath metric-AMG cycle application of the
reference (/root/reference/src/utils.py:119 fast path; cycle structure
per /root/reference/src/amg_parameters.py) on the TPU hot path.

Design
------
* Row-aligned grid layout: dof (i_lead..., ix, f) lives at flat index
  ``lead_lex * K * 128 + ix*F + f`` with ``K = ceil(dx_p * F / 128)``
  lanes chunks per grid row.  Leading axes are padded to a multiple of
  2^depth so every level's leading dims stay even; the lane axis is
  padded to even per level.  Pad dofs carry mask 0 and never couple to
  real dofs, so in-kernel they stay exactly zero.
* The operator is still DIA in this layout (stencil offsets become
  ``drow*K*128 + dx*F + df``), so the proven shifted-slice SpMV machinery
  of sparse/dia_pallas.py applies unchanged; A/C diagonal planes stream
  from HBM double-buffered.
* Transfers run INSIDE the kernel:
    - leading (y/z) axes: pair-add / row-interleave via leading-dim
      reshapes (free relayouts, validated on Mosaic);
    - lane (x) axis: static 0/1 weight matmuls ``W0/W1`` on the MXU with
      ``precision=HIGHEST`` (exact for 0/1 weights);
    - coarse dense solve: the inverse is pre-transposed per coarse row
      block and applied as ``(1, nc) @ (nc, 128)`` MXU matmuls with the
      flattened coarse residual, streamed from HBM.
* Contract: the input b must be pre-masked (``b * mask``); the wrapper
  does this.  Masked/eliminated/pad rows then stay identically zero
  through the whole cycle except for prolongation, which multiplies by a
  streamed mask plane before the correction is added.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..sparse import HostCSR
from ..sparse.dia import DIA
from ..config import AMGParameters
from ..sparse.dia_pallas import (LANES, _shifted, _cheb_coefs, HAS_PALLAS)

if HAS_PALLAS:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

HIGHEST = jax.lax.Precision.HIGHEST
VMEM_BUDGET = 15 * 2 ** 20


def _round_up(x, m):
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# Layout planning
# ---------------------------------------------------------------------------

def dims_schedule(dims, F, max_levels, coarse_dof):
    """Per-level padded dims for the fused hierarchy.

    Leading axes are padded once (at level 0) to a multiple of 2^depth so
    that halving keeps them even down to the coarsest level; the lane
    (last) axis is padded to even independently at each level.  Returns a
    list of dim tuples, one per level (levels[0..depth-1] smoothed,
    levels[depth] = coarse)."""
    dims = tuple(int(d) for d in dims)
    depth = 0
    cur = list(dims)
    while depth < max_levels - 1 and int(np.prod(cur)) * F > coarse_dof:
        cur = [(d + 1) // 2 for d in cur]
        depth += 1
    if depth == 0:
        return [dims]
    lead = [_round_up(d, 2 ** depth) for d in dims[:-1]]
    out = []
    dx = dims[-1]
    for lvl in range(depth + 1):
        dxp = dx + (dx % 2) if lvl < depth else dx
        out.append(tuple(lead) + (dxp,))
        lead = [d // 2 for d in lead]
        dx = dxp // 2
    return out


def _wmats(F):
    """W0, W1 (128,128) 0/1 restriction weights for the lane axis.

    Coarse lane j of chunk q sums fine lanes ``2*cx*F + f`` and
    ``(2*cx+1)*F + f`` (cx = coarse x, f = field), which relative to fine
    chunk 2q are ``2j - f`` and ``2j - f + F`` — q-independent when
    F | 128.  Entries < 128 go to W0 (fine chunk 2q), >= 128 to W1
    (fine chunk 2q+1)."""
    assert LANES % F == 0, "fields per node must divide 128"
    W0 = np.zeros((LANES, LANES), dtype=np.float32)
    W1 = np.zeros((LANES, LANES), dtype=np.float32)
    for j in range(LANES):
        f = j % F
        for p in (2 * j - f, 2 * j - f + F):
            if p < LANES:
                W0[p, j] += 1.0
            else:
                W1[p - LANES, j] += 1.0
    return W0, W1


def _kernel_slots(dims_p, F, K):
    """Canonical (field-interleaved lex over dims_p) -> kernel flat index."""
    n = int(np.prod(dims_p)) * F
    idx = np.arange(n)
    f = idx % F
    node = idx // F
    ix = node % dims_p[-1]
    lead = node // dims_p[-1]
    lane_x = ix * F + f
    row = lead * K + lane_x // LANES
    return row * LANES + lane_x % LANES


def _embed_coo(A: HostCSR, slots, n_out) -> HostCSR:
    r, c, v = A.to_coo()
    return HostCSR.from_coo(slots[r], slots[c], v, (n_out, n_out))


def _pack_planes(data, nflat, rows_p, rb):
    """(nd, nflat) diagonal planes -> (nblocks, nd, rb, 128) DMA blocks."""
    nd = data.shape[0]
    d2 = np.zeros((nd, rows_p * LANES), dtype=data.dtype)
    d2[:, :nflat] = data
    return np.ascontiguousarray(
        d2.reshape(nd, rows_p // rb, rb, LANES).transpose(1, 0, 2, 3))


@dataclass(frozen=True)
class _LevelSpec:
    lead: tuple          # leading (non-lane) padded dims
    K: int               # lane chunks per grid row
    rows: int            # true flat rows = prod(lead) * K
    rows_p: int          # rows padded to a multiple of rb
    padr: int            # halo rows for the A-sweep source
    nblocks: int
    offsA: tuple
    offsC: tuple
    theta: float
    coefs: tuple
    degree: int
    pre: int
    post: int


@dataclass(frozen=True)
class _CycleSpec:
    levels: tuple        # per-level _LevelSpec
    Kc: int              # coarse level lane chunks
    rows_c: int          # coarse true rows
    nc: int              # coarse flat size = rows_c * 128
    rb: int
    padt: int            # t halo rows (C offsets are intra-node: small)
    nbuf: int = 2        # DMA pipeline depth (in-flight plane blocks)


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _dot(a, b):
    return jax.lax.dot(a, b, precision=HIGHEST,
                       preferred_element_type=jnp.float32)


def _mega_kernel(spec: _CycleSpec, *refs):
    L = len(spec.levels)
    rb = spec.rb
    pt = spec.padt
    it = iter(refs)
    W0, W1, W0T, W1T, b0 = (next(it) for _ in range(5))
    A_refs = [next(it) for _ in range(L)]
    C_refs = [next(it) for _ in range(L)]
    M_refs = [next(it) for _ in range(L)]
    T_ref = next(it)
    x0 = next(it)                       # out (= fine x storage with halo)
    t0, d0 = next(it), next(it)
    xs, bs, ts, ds = [x0], [b0], [t0], [d0]
    for _ in range(1, L):
        xs.append(next(it))
        bs.append(next(it))
        ts.append(next(it))
        ds.append(next(it))
    xc = next(it)
    bufA, bufC, bufB, bufM, bufT = (next(it) for _ in range(5))
    semA, semC, semB, semM, semT = (next(it) for _ in range(5))
    lane = jax.lax.broadcasted_iota(jnp.int32, (rb, LANES), 1)

    def dma(planes, buf, sem, slot, blk):
        return pltpu.make_async_copy(planes.at[blk], buf.at[slot],
                                     sem.at[slot])

    def sweep(lv, src_ref, src_p, planes, offs, buf, sem, write,
              stream_b=False):
        """One multi-diagonal pass over level lv: write(blk, base, acc).

        Fully unrolled over the static block count (straight-line code,
        32-bit-safe — see sparse/dia_pallas.py).  When stream_b, the
        fine-level b planes stream alongside via bufB/semB.  The DMA
        pipeline keeps spec.nbuf plane blocks in flight: per-block
        compute is tiny, so the pass floor is the DMA round-trip latency
        unless several transfers overlap (docs/PERF_NOTES.md)."""
        nblocks = spec.levels[lv].nblocks
        D = spec.nbuf

        def start(slot, blk):
            dma(planes, buf, sem, slot, blk).start()
            if stream_b:
                dma(bs[0], bufB, semB, slot, blk).start()

        for pre in range(min(D, nblocks)):
            start(pre, pre)
        for blk in range(nblocks):
            slot = blk % D
            dma(planes, buf, sem, slot, blk).wait()
            if stream_b:
                dma(bs[0], bufB, semB, slot, blk).wait()
            base = blk * rb
            xblk = src_ref[base:base + rb + 2 * src_p, :]
            rolls = {}
            acc = None
            for dd, off in enumerate(offs):
                term = buf[slot, dd] * _shifted(xblk, rolls, lane, src_p,
                                                rb, off)
                acc = term if acc is None else acc + term
            write(blk, slot, base, acc)
            if blk + D < nblocks:
                # slot just consumed — safe to refill D blocks ahead
                start(slot, blk + D)

    def get_b(lv, slot, base):
        if lv == 0:
            return bufB[slot].astype(jnp.float32)
        return bs[lv][base:base + rb, :].astype(jnp.float32)

    def cheb(lv, iters):
        """`iters` degree-k Chebyshev sweeps on level lv (in-place x)."""
        S = spec.levels[lv]
        x, t, d = xs[lv], ts[lv], ds[lv]
        p = S.padr

        def w_t(blk, slot, base, acc):
            t[pt + base:pt + base + rb, :] = get_b(lv, slot, base) - acc

        for itn in range(iters):
            for k in range(S.degree):
                if itn or k:
                    x[p:p + S.rows_p, :] = x[p:p + S.rows_p, :] + d[:]
                sweep(lv, x, p, A_refs[lv], S.offsA, bufA, semA, w_t,
                      stream_b=(lv == 0))
                if k == 0:
                    def w_d(blk, slot, base, acc, s=1.0 / S.theta):
                        d[base:base + rb, :] = s * acc
                else:
                    def w_d(blk, slot, base, acc, ak=S.coefs[k - 1][0],
                            ck=S.coefs[k - 1][1]):
                        d[base:base + rb, :] = (
                            ak * d[base:base + rb, :] + ck * acc)
                sweep(lv, t, pt, C_refs[lv], S.offsC, bufC, semC, w_d)
        x[p:p + S.rows_p, :] = x[p:p + S.rows_p, :] + d[:]

    def residual(lv):
        S = spec.levels[lv]

        def w_r(blk, slot, base, acc):
            ts[lv][pt + base:pt + base + rb, :] = (
                get_b(lv, slot, base) - acc)

        sweep(lv, xs[lv], S.padr, A_refs[lv], S.offsA, bufA, semA, w_r,
              stream_b=(lv == 0))

    def restrict_value(lv):
        """t_lv -> coarse rhs value (rows_next, 128)."""
        S = spec.levels[lv]
        Kc = spec.levels[lv + 1].K if lv + 1 < L else spec.Kc
        cur = ts[lv][pt:pt + S.rows, :]
        post = S.K
        for dax in reversed(S.lead):
            a = cur.reshape(-1, 2 * post, LANES)
            cur = (a[:, :post, :] + a[:, post:, :]).reshape(-1, LANES)
            post = (dax // 2) * post
        g = cur.reshape(-1, S.K, LANES)
        chunks = []
        for q in range(Kc):
            if 2 * q >= S.K:       # coarse chunk fed only by lane pads
                chunks.append(jnp.zeros((g.shape[0], 1, LANES),
                                        jnp.float32))
                continue
            c = _dot(g[:, 2 * q, :], W0[:])
            if 2 * q + 1 < S.K:
                c = c + _dot(g[:, 2 * q + 1, :], W1[:])
            chunks.append(c[:, None, :])
        return jnp.concatenate(chunks, axis=1).reshape(-1, LANES)

    def prolong_add(lv):
        """x_lv += mask_lv * P(x_{lv+1} or x_coarse), via t_lv staging."""
        S = spec.levels[lv]
        if lv + 1 < L:
            Sn = spec.levels[lv + 1]
            src = xs[lv + 1][Sn.padr:Sn.padr + Sn.rows, :]
            Kc = Sn.K
        else:
            src = xc[0:spec.rows_c, :]
            Kc = spec.Kc
        g = src.reshape(-1, Kc, LANES)
        chunks = []
        for r in range(S.K):
            Wt = W0T if r % 2 == 0 else W1T
            chunks.append(_dot(g[:, r // 2, :], Wt[:])[:, None, :])
        cur = jnp.concatenate(chunks, axis=1).reshape(-1, LANES)
        posts = []
        post = S.K
        for dax in reversed(S.lead):
            posts.append(post)
            post = (dax // 2) * post
        for post in reversed(posts):
            gg = cur.reshape(-1, 1, post, LANES)
            cur = jnp.concatenate([gg, gg], axis=1).reshape(-1, LANES)
        t = ts[lv]
        t[pt:pt + S.rows, :] = cur
        if S.rows_p > S.rows:
            t[pt + S.rows:pt + S.rows_p, :] = jnp.zeros(
                (S.rows_p - S.rows, LANES), jnp.float32)
        x, p = xs[lv], S.padr
        D = spec.nbuf
        for pre in range(min(D, S.nblocks)):
            dma(M_refs[lv], bufM, semM, pre, pre).start()
        for blk in range(S.nblocks):
            slot = blk % D
            dma(M_refs[lv], bufM, semM, slot, blk).wait()
            base = blk * rb
            x[p + base:p + base + rb, :] = (
                x[p + base:p + base + rb, :]
                + t[pt + base:pt + base + rb, :] * bufM[slot])
            if blk + D < S.nblocks:
                dma(M_refs[lv], bufM, semM, slot, blk + D).start()

    # ---- down sweep -------------------------------------------------
    for lv in range(L):
        S = spec.levels[lv]
        xs[lv][:] = jnp.zeros_like(xs[lv])
        ts[lv][:] = jnp.zeros_like(ts[lv])
        cheb(lv, S.pre)
        residual(lv)
        rc = restrict_value(lv)
        if lv + 1 < L:
            Sn = spec.levels[lv + 1]
            bs[lv + 1][0:Sn.rows, :] = rc
            if Sn.rows_p > Sn.rows:
                bs[lv + 1][Sn.rows:Sn.rows_p, :] = jnp.zeros(
                    (Sn.rows_p - Sn.rows, LANES), jnp.float32)
        else:
            # ---- coarse dense solve: x_c[R] = b_flat @ T[R] ---------
            # (single-buffered stream: the inverse is read once per
            # cycle; saving the second 1 MB buffer matters more than
            # hiding ~rows_c small DMA latencies)
            bflat = rc.reshape(1, spec.nc)
            for R in range(spec.rows_c):
                cp = pltpu.make_async_copy(T_ref.at[R], bufT.at[0],
                                           semT.at[0])
                cp.start()
                cp.wait()
                xc[R:R + 1, :] = _dot(bflat, bufT[0])

    # ---- up sweep ---------------------------------------------------
    for lv in reversed(range(L)):
        prolong_add(lv)
        cheb(lv, spec.levels[lv].post)


def _spec_key(spec):
    """Hashable static key (dataclasses of tuples are hashable)."""
    return spec


@partial(jax.jit, static_argnames=("spec", "interpret"))
def _mega_call(spec: _CycleSpec, interpret, W0, W1, W0T, W1T, b2,
               A_planes, C_planes, M_planes, T):
    L = len(spec.levels)
    rb = spec.rb
    pt = spec.padt
    f32 = jnp.float32
    S0 = spec.levels[0]
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec(memory_space=pl.ANY)
    scratch = [
        pltpu.VMEM((S0.rows_p + 2 * pt, LANES), f32),    # t0
        pltpu.VMEM((S0.rows_p, LANES), f32),             # d0
    ]
    for S in spec.levels[1:]:
        scratch += [
            pltpu.VMEM((S.rows_p + 2 * S.padr, LANES), f32),   # x
            pltpu.VMEM((S.rows_p, LANES), f32),                # b
            pltpu.VMEM((S.rows_p + 2 * pt, LANES), f32),       # t
            pltpu.VMEM((S.rows_p, LANES), f32),                # d
        ]
    ndA = A_planes[0].shape[1]
    ndC = C_planes[0].shape[1]
    D = spec.nbuf
    scratch += [
        pltpu.VMEM((max(spec.rows_c, 8), LANES), f32),         # xc
        pltpu.VMEM((D, ndA, rb, LANES), A_planes[0].dtype),    # bufA
        pltpu.VMEM((D, ndC, rb, LANES), C_planes[0].dtype),    # bufC
        pltpu.VMEM((D, rb, LANES), b2.dtype),                  # bufB
        pltpu.VMEM((D, rb, LANES), M_planes[0].dtype),         # bufM
        pltpu.VMEM((1, spec.nc, LANES), T.dtype),              # bufT
        pltpu.SemaphoreType.DMA((D,)),
        pltpu.SemaphoreType.DMA((D,)),
        pltpu.SemaphoreType.DMA((D,)),
        pltpu.SemaphoreType.DMA((D,)),
        pltpu.SemaphoreType.DMA((1,)),
    ]
    with jax.enable_x64(False):
        out = pl.pallas_call(
            partial(_mega_kernel, spec),
            in_specs=[vspec, vspec, vspec, vspec, aspec]
            + [aspec] * (3 * L) + [aspec],
            out_specs=vspec,
            out_shape=jax.ShapeDtypeStruct(
                (S0.rows_p + 2 * S0.padr, LANES), f32),
            scratch_shapes=scratch,
            interpret=interpret,
        )(W0, W1, W0T, W1T, b2, *A_planes, *C_planes, *M_planes, T)
    return out


def fused_vmem_bytes(spec: _CycleSpec, itemA=4, itemC=4):
    f32 = 4
    S0 = spec.levels[0]
    total = (S0.rows_p + 2 * S0.padr) * LANES * f32 * 2   # x0(out) + t0 ~
    total += S0.rows_p * LANES * f32                      # d0
    for S in spec.levels[1:]:
        total += ((S.rows_p + 2 * S.padr) + (S.rows_p + 2 * spec.padt)
                  + 2 * S.rows_p) * LANES * f32
    total += max(spec.rows_c, 8) * LANES * f32
    ndA = len(spec.levels[0].offsA)
    ndC = len(spec.levels[0].offsC)
    D = spec.nbuf
    total += D * ndA * spec.rb * LANES * itemA
    total += D * ndC * spec.rb * LANES * itemC
    total += 2 * D * spec.rb * LANES * f32
    total += spec.nc * LANES * f32
    total += 4 * LANES * LANES * f32
    return total


# ---------------------------------------------------------------------------
# Host-side setup
# ---------------------------------------------------------------------------

class _PadGridLevel:
    """Reference (plain-JAX) level whose transfers re-pad the lane axis
    to the next level's even-padded dims, mirroring the fused kernel's
    layout chain.  Used only by setup_grid_fused(reference=True) parity
    tests; registered as a pytree below."""

    def __init__(self, A, smoother, mask, dims, F, cdims_p):
        self.A = A
        self.smoother = smoother
        self.mask = mask
        self.dims = tuple(dims)
        self.F = F
        self.cdims_p = tuple(cdims_p)
        self.nc = int(np.prod(self.cdims_p)) * F

    def tree_flatten(self):
        return ((self.A, self.smoother, self.mask),
                (self.dims, self.F, self.cdims_p))

    @classmethod
    def tree_unflatten(cls, aux, ch):
        A, sm, mask = ch
        return cls(A, sm, mask, *aux)

    def restrict(self, r):
        g = (r * self.mask).reshape(self.dims + (self.F,))
        for ax in range(len(self.dims)):
            d2 = self.dims[ax] // 2
            shape = g.shape[:ax] + (d2, 2) + g.shape[ax + 1:]
            g = g.reshape(shape).sum(axis=ax + 1)
        pad = self.cdims_p[-1] - g.shape[-2]
        if pad:
            g = jnp.pad(g, [(0, 0)] * (len(self.dims) - 1)
                        + [(0, pad), (0, 0)])
        return g.reshape(-1)

    def prolong(self, ec):
        g = ec.reshape(self.cdims_p + (self.F,))
        cd_last = self.dims[-1] // 2
        if self.cdims_p[-1] > cd_last:
            g = jax.lax.slice_in_dim(g, 0, cd_last,
                                     axis=len(self.dims) - 1)
        for ax in range(len(self.dims)):
            g = jnp.repeat(g, 2, axis=ax)
        return g.reshape(-1) * self.mask


jax.tree_util.register_pytree_node_class(_PadGridLevel)


def _node_blocks(A: HostCSR, F):
    n = A.shape[0]
    ng = n // F
    r, c, v = A.to_coo()
    inblk = (r // F) == (c // F)
    blocks = np.zeros((ng, F, F))
    blocks[r[inblk] // F, r[inblk] % F, c[inblk] % F] = v[inblk]
    idx = np.arange(F)
    diag = blocks[:, idx, idx]
    blocks[:, idx, idx] = np.where(diag == 0, 1.0, diag)
    return np.linalg.inv(blocks)


@jax.tree_util.register_pytree_node_class
class FusedVCycle:
    """Multilevel V-cycle preconditioner = ONE Pallas kernel launch.

    Operates on vectors in the kernel-flat grid layout (length
    rows_p(level 0) * 128); `matvec` pre-masks the input per the kernel
    contract.  Drop-in for MGPreconditioner.matvec on the solve path."""

    def __init__(self, spec, W0, W1, W0T, W1T, A_planes, C_planes,
                 M_planes, T, mask_flat, interpret=False,
                 level_nnz=(), coarse_n=0):
        self.spec = spec
        self.W0, self.W1, self.W0T, self.W1T = W0, W1, W0T, W1T
        self.A_planes = tuple(A_planes)
        self.C_planes = tuple(C_planes)
        self.M_planes = tuple(M_planes)
        self.T = T
        self.mask_flat = mask_flat
        self.interpret = bool(interpret)
        self.level_nnz = tuple(level_nnz)   # real nnz per level (bench)
        self.coarse_n = int(coarse_n)       # real coarse dofs

    def tree_flatten(self):
        return ((self.W0, self.W1, self.W0T, self.W1T, self.A_planes,
                 self.C_planes, self.M_planes, self.T, self.mask_flat),
                (self.spec, self.interpret, self.level_nnz,
                 self.coarse_n))

    @classmethod
    def tree_unflatten(cls, aux, ch):
        (W0, W1, W0T, W1T, A_p, C_p, M_p, T, mask) = ch
        return cls(aux[0], W0, W1, W0T, W1T, A_p, C_p, M_p, T, mask,
                   aux[1], aux[2], aux[3])

    def cycle_nnz(self):
        """Stored nonzeros touched per cycle application — IDENTICAL
        accounting to bench.cycle_nnz_per_iteration (one A-read per
        smoother pass + one per residual), so fused/unfused nnz/s
        numbers stay comparable."""
        total = 0
        for S, nnz in zip(self.spec.levels, self.level_nnz):
            total += nnz * (S.pre + S.post + 1)
        return total + self.coarse_n * self.coarse_n

    @property
    def nflat(self):
        return self.spec.levels[0].rows_p * LANES

    def matvec(self, b):
        S0 = self.spec.levels[0]
        rb = self.spec.rb
        b3 = (b.astype(jnp.float32) * self.mask_flat).reshape(
            S0.nblocks, rb, LANES)
        out = _mega_call(self.spec, self.interpret, self.W0, self.W1,
                         self.W0T, self.W1T, b3, self.A_planes,
                         self.C_planes, self.M_planes, self.T)
        z = out[S0.padr:S0.padr + S0.rows_p, :].reshape(-1)
        return z.astype(b.dtype)


def _plan_padr(offsets):
    maxabs = max((abs(int(o)) for o in offsets), default=0)
    return _round_up(maxabs // LANES + 1, 4)


def setup_grid_fused(A_host: HostCSR, dims, F=1, mask=None,
                     params: AMGParameters = AMGParameters(),
                     cheb_degree=3, cheb_ratio=8.0, storage_dtype=None,
                     rb=64, nbuf=4, interpret=False, reference=False):
    """Build the fused whole-V-cycle hierarchy.

    A_host in field-major order ([u1-block; u2-block]) on `dims` grid
    points (last axis fastest), like amg.grid.setup_grid.  Returns
    (FusedVCycle, slots, nflat): slots maps original dof -> kernel flat
    index (apply outside the jitted loop; RHS scatter + solution gather).

    reference=True additionally returns an MGPreconditioner built from
    the SAME padded canonical hierarchy (for parity tests).

    Raises ValueError when the cycle cannot be fused (VMEM budget, no
    levels) — callers fall back to amg.grid.setup_grid."""
    from .grid import interleave_fields, _grid_coarse
    from .hierarchy import MGPreconditioner
    from ..sparse.dia_pallas import blockinv_dia
    from .grid import _lmax_blockinv

    dims = tuple(int(d) for d in dims)
    nv = int(np.prod(dims))
    assert A_host.shape[0] == nv * F
    sched = dims_schedule(dims, F, params.max_levels, params.coarse_dof)
    if len(sched) < 2:
        raise ValueError("problem too small to fuse (no levels)")
    if params.cycle_type != "v" or params.maxit != 1:
        raise ValueError("fused cycle supports V-cycle, maxit=1")

    # ---- embed the fine operator into padded canonical order ----------
    dims0 = sched[0]
    n0 = int(np.prod(dims0)) * F
    coords = np.unravel_index(np.arange(nv), dims)
    pnode = np.ravel_multi_index(coords, dims0)
    slots_can = np.empty(nv * F, dtype=np.int64)
    for f in range(F):
        slots_can[f * nv:(f + 1) * nv] = pnode * F + f
    A = _embed_coo(A_host, slots_can, n0)
    mask_np = np.zeros(n0)
    mask_np[slots_can] = 1.0 if mask is None else np.asarray(
        mask, dtype=np.float64)

    sdtype = storage_dtype or jnp.float32
    lead_len = len(dims) - 1
    levels_spec = []
    A_planes, C_planes, M_planes = [], [], []
    ref_levels = []
    kernel_slots0 = None
    mask_flat0 = None
    ndA_max = 0
    packs = []
    level_nnz = []
    lvl = 0
    while (lvl < len(sched) - 1
           and mask_np.sum() > params.coarse_dof):
        dims_p = sched[lvl]
        K = int(np.ceil(dims_p[-1] * F / LANES))
        if lvl + 1 < len(sched):
            Kn = int(np.ceil(sched[lvl + 1][-1] * F / LANES))
            assert Kn >= (K + 1) // 2
        rows = int(np.prod(dims_p[:-1])) * K
        rows_p = _round_up(rows, rb)
        nflat = rows_p * LANES
        kslots = _kernel_slots(dims_p, F, K)
        Ak = _embed_coo(A, kslots, nflat)
        offsA, dataA = _dia_np(Ak)
        blockinv = _node_blocks(A, F)

        def apply_binv(r, bi=blockinv, s=F):
            return np.einsum("bij,bj->bi", bi,
                             r.reshape(-1, s)).reshape(-1)
        lmax = _lmax_blockinv(A, apply_binv, mask_np)
        coffs_can, cdata_can = blockinv_dia(blockinv, mask_np)
        Ck = _embed_coo(HostCSR.from_coo(
            *_dia_to_coo(coffs_can, cdata_can, A.shape[0]),
            (A.shape[0], A.shape[0])), kslots, nflat)
        offsC, dataC = _dia_np(Ck)
        theta, coefs = _cheb_coefs(1.1 * lmax, 1.1 * lmax / cheb_ratio,
                                   cheb_degree)
        padr = _plan_padr(offsA + offsC)
        nblocks = rows_p // rb
        levels_spec.append(_LevelSpec(
            lead=tuple(dims_p[:-1]), K=K, rows=rows, rows_p=rows_p,
            padr=padr, nblocks=nblocks,
            offsA=offsA, offsC=offsC,
            theta=theta, coefs=coefs, degree=int(cheb_degree),
            pre=int(params.presmooth_iter),
            post=int(params.postsmooth_iter)))
        ndA_max = max(ndA_max, len(offsA))
        level_nnz.append(int(A.nnz))
        packs.append((dataA, dataC, nflat, rows_p))
        mk = np.zeros(nflat)
        mk[kslots] = mask_np
        M_planes.append(jnp.asarray(
            mk.reshape(rows_p // rb, rb, LANES), dtype=sdtype))
        if lvl == 0:
            kernel_slots0 = kslots[slots_can]
            mask_flat0 = jnp.asarray(mk, dtype=jnp.float32)
        if reference:
            from .structured import BlockChebyshevSmoother
            sm = BlockChebyshevSmoother(
                jnp.asarray(blockinv, dtype=jnp.float64),
                jnp.asarray(mask_np, dtype=jnp.float64),
                1.1 * lmax, 1.1 * lmax / cheb_ratio, cheb_degree)
            ref_levels.append(_PadGridLevel(
                DIA.from_host(A, dtype=jnp.float64), sm,
                jnp.asarray(mask_np, dtype=jnp.float64), dims_p, F,
                sched[lvl + 1]))
        A, mask_np, _ = _grid_coarse(A, mask_np, dims_p, F)
        # re-pad the lane axis to the schedule's next padded dims
        cdims_raw = tuple(d // 2 for d in dims_p[:-1]) + (dims_p[-1] // 2,)
        if lvl + 1 < len(sched) and sched[lvl + 1][-1] > cdims_raw[-1]:
            A, mask_np = _pad_lane_axis(A, mask_np, cdims_raw,
                                        sched[lvl + 1][-1], F)
        lvl += 1

    L = lvl
    if L == 0:
        raise ValueError("no fused levels built")
    dims_c = sched[L] if L < len(sched) else sched[-1]
    Kc = int(np.ceil(dims_c[-1] * F / LANES))
    rows_c = int(np.prod(dims_c[:-1])) * Kc
    nc = rows_c * LANES
    spec = _CycleSpec(levels=tuple(levels_spec), Kc=Kc, rows_c=rows_c,
                      nc=nc, rb=rb, padt=4, nbuf=int(nbuf))
    itemA = jnp.dtype(sdtype).itemsize
    if not interpret and fused_vmem_bytes(spec, itemA, itemA) \
            > VMEM_BUDGET:
        raise ValueError(
            f"fused cycle needs {fused_vmem_bytes(spec, itemA, itemA)} "
            f"bytes VMEM (> {VMEM_BUDGET})")

    # pad all levels' planes to a uniform diagonal count (zero planes)
    A_dev, C_dev = [], []
    for (dataA, dataC, nflat, rows_p), S in zip(packs, levels_spec):
        if len(S.offsA) < ndA_max:
            dataA = np.concatenate(
                [dataA, np.zeros((ndA_max - len(S.offsA),
                                  dataA.shape[1]))], axis=0)
        A_dev.append(jnp.asarray(
            _pack_planes(dataA, nflat, rows_p, rb), dtype=sdtype))
        C_dev.append(jnp.asarray(
            _pack_planes(dataC, nflat, rows_p, rb), dtype=sdtype))
    spec = _CycleSpec(
        levels=tuple(
            _LevelSpec(lead=S.lead, K=S.K, rows=S.rows, rows_p=S.rows_p,
                       padr=S.padr, nblocks=S.nblocks,
                       offsA=S.offsA + (0,) * (ndA_max - len(S.offsA)),
                       offsC=S.offsC, theta=S.theta, coefs=S.coefs,
                       degree=S.degree, pre=S.pre, post=S.post)
            for S in levels_spec),
        Kc=Kc, rows_c=rows_c, nc=nc, rb=rb, padt=4, nbuf=int(nbuf))

    # coarse dense inverse, embedded into the kernel-flat coarse layout
    kslots_c = _kernel_slots(dims_c, F, Kc)
    inv_can = np.linalg.inv(A.toarray()) if A.shape[0] else \
        np.zeros((0, 0))
    inv_k = np.eye(nc)
    inv_k[np.ix_(kslots_c, kslots_c)] = inv_can
    T = np.stack([np.ascontiguousarray(
        inv_k[R * LANES:(R + 1) * LANES, :].T) for R in range(rows_c)])
    W0, W1 = _wmats(F)
    vc = FusedVCycle(
        spec, jnp.asarray(W0), jnp.asarray(W1),
        jnp.asarray(np.ascontiguousarray(W0.T)),
        jnp.asarray(np.ascontiguousarray(W1.T)),
        A_dev, C_dev, M_planes, jnp.asarray(T, dtype=jnp.float32),
        mask_flat0, interpret=interpret,
        level_nnz=level_nnz, coarse_n=A.shape[0])
    if reference:
        ref = MGPreconditioner(
            tuple(ref_levels),
            jnp.asarray(inv_can, dtype=jnp.float64),
            cycle="v", maxit=1, presmooth=params.presmooth_iter,
            postsmooth=params.postsmooth_iter)
        return vc, kernel_slots0, vc.nflat, ref, slots_can
    return vc, kernel_slots0, vc.nflat


def _dia_np(A: HostCSR):
    """DIA extraction without device arrays: (offsets tuple, (nd, n) np)."""
    n = A.shape[0]
    r, c, v = A.to_coo()
    offs = c - r
    uoffs = np.unique(offs)
    data = np.zeros((len(uoffs), n))
    data[np.searchsorted(uoffs, offs), r] = v
    return tuple(int(o) for o in uoffs), data


def _apply_fused(vc: "FusedVCycle", b):
    return vc.matvec(b)


def fused_operator(vc: "FusedVCycle"):
    """Partial-wrapped apply: jit cache keys on structure, not identity
    (never close over operator data — docs/PERF_NOTES.md)."""
    return jax.tree_util.Partial(_apply_fused, vc)


def _dia_to_coo(offsets, data, n):
    rows, cols, vals = [], [], []
    for d, off in enumerate(offsets):
        r = np.arange(max(0, -off), min(n, n - off))
        vv = data[d, r]
        keep = vv != 0
        rows.append(r[keep])
        cols.append(r[keep] + off)
        vals.append(vv[keep])
    return (np.concatenate(rows), np.concatenate(cols),
            np.concatenate(vals))


def _pad_lane_axis(A: HostCSR, mask, dims_cur, dx_new, F):
    """Embed operator on dims_cur into dims with last axis padded to
    dx_new (pad dofs: empty rows, mask 0)."""
    dims_new = dims_cur[:-1] + (dx_new,)
    n_old = int(np.prod(dims_cur)) * F
    n_new = int(np.prod(dims_new)) * F
    idx = np.arange(n_old)
    f = idx % F
    node = idx // F
    coords = np.unravel_index(node, dims_cur)
    pnode = np.ravel_multi_index(coords, dims_new)
    slots = pnode * F + f
    A2 = _embed_coo(A, slots, n_new)
    m2 = np.zeros(n_new)
    m2[slots] = mask
    return A2, m2


def grid_system_fused(A_host: HostCSR, slots, nflat, dtype=jnp.float32,
                      pallas=None):
    """Outer (CG) operator in the kernel-flat layout."""
    from .grid import resolve_pallas
    n = A_host.shape[0]
    r, c, v = A_host.to_coo()
    Ak = HostCSR.from_coo(slots[r], slots[c], v, (nflat, nflat))
    D = DIA.from_host(Ak, dtype=dtype)
    use_pallas, interpret = resolve_pallas(pallas)
    if use_pallas:
        from ..sparse.dia_pallas import PDIA
        return PDIA.from_dia(D, interpret=interpret)
    return D
