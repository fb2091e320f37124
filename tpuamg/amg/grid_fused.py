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
from ..sparse.dia_pallas import (LANES, _shifted, _cheb_coefs,
                                 _diag_sum, HAS_PALLAS)

if HAS_PALLAS:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

HIGHEST = jax.lax.Precision.HIGHEST
VMEM_BUDGET = 15 * 2 ** 20
# the chunked-PCG kernel is accounted exactly (fused_pcg_vmem_bytes), so
# it can run closer to the ~16 MB/core physical VMEM than the heuristic
# single-cycle budget above
PCG_VMEM_BUDGET = int(15.5 * 2 ** 20)


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


def _planes_to_device(data, rows, rows_p, rb, period, sdtype,
                      max_exc_frac=0.25):
    """Mode-compressed host->device transfer of DIA planes.

    On a uniform grid the assembled stencil is constant on interior
    rows, so each (plane, position-mod-period) class has one dominant
    value with deviations only near grid boundaries; hierarchy setup at
    n=512 is tunnel-transfer bound (docs/PERF_NOTES.md), so send the
    per-phase modes (nd x period) + exceptions (idx, val) and rebuild
    with broadcast + one one-time scatter on device.  period must be
    the padded grid-row length K*128 (so lane padding repeats too) and
    divide rows*128.  Falls back to the dense `_pack_planes` transfer
    when exceptions exceed `max_exc_frac` (non-constant coefficients).

    Returns the (nblocks, nd, rb, 128) device array `_pack_planes`
    would have produced, bit-identical in sdtype."""
    nd = data.shape[0]
    cut = rows * LANES                      # true (non-pad-row) extent
    total = rows_p * LANES
    npdt = jnp.dtype(sdtype)
    dv = np.asarray(data[:, :cut]).astype(npdt)   # storage-rounded
    nrep = cut // period
    if nrep < 2:
        return jnp.asarray(_pack_planes(data, data.shape[1], rows_p,
                                        rb), dtype=sdtype)
    dvr = dv.reshape(nd, nrep, period)
    # lower median along the repeat axis == the interior value whenever
    # >50% of grid rows agree (true away from boundaries/BC rows)
    modes = np.sort(dvr, axis=1)[:, nrep // 2, :]       # (nd, period)
    exc = dvr != modes[:, None, :]
    nexc = int(exc.sum())
    if nexc > max_exc_frac * nd * cut:
        return jnp.asarray(_pack_planes(data, data.shape[1], rows_p,
                                        rb), dtype=sdtype)
    idx = np.flatnonzero(exc.reshape(nd, cut))          # in (nd, cut)
    # map to (nd, total) flat coords
    d_i, p_i = idx // cut, idx % cut
    idx_t = (d_i * total + p_i).astype(np.int64)
    vals = dv.reshape(-1)[idx]
    dev = _rebuild_planes(jnp.asarray(modes), jnp.asarray(idx_t),
                          jnp.asarray(vals), cut, total, rows_p, rb)
    return dev


@partial(jax.jit, static_argnums=(4, 5, 6, 7))
def _coarse_inv_device(rr, cc, vv, kslots_c, ncan, nc, rows_c, sdtype):
    """Dense coarse inverse on the device (f32 LU on the MXU), embedded
    into the kernel-flat coarse layout and pre-transposed per coarse row
    block — the (rows_c, nc, 128) T tensor of the fused kernels.

    Precision note (ADVICE round-2): cond(A_c) reaches ~gamma (1e10 in
    the sweeps), so f32 LU error is large in the gamma-dominant
    subspace — but a PRECONDITIONER needs spectral equivalence, not an
    accurate inverse, and T is stored in sdtype (often bf16) anyway.
    Measured: tests/test_grid_fused.py::test_fused_pcg_gamma_1e10
    converges in reference-path iteration counts through this f32
    inverse.  Symmetric diagonal equilibration was tried and is WORSE
    here: the ill-conditioning is the near-null coupling space (pair
    blocks ~ gamma*[[1,-1],[-1,1]] + K), not row scaling, and
    equilibrating rounds the off-diagonal -1+eps to exactly -1 in f32
    (singular Ahat) — the same test then fails at 60 iters."""
    Ad = jnp.zeros((ncan, ncan), dtype=jnp.float32).at[rr, cc].set(vv)
    inv_can = jnp.linalg.inv(Ad)
    inv_k = jnp.eye(nc, dtype=jnp.float32)
    inv_k = inv_k.at[kslots_c[:, None], kslots_c[None, :]].set(inv_can)
    return inv_k.reshape(rows_c, LANES, nc).transpose(0, 2, 1).astype(
        sdtype)


@partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _rebuild_planes(modes, idx, vals, cut, total, rows_p, rb):
    nd, period = modes.shape
    base = jnp.tile(modes, (1, cut // period))          # (nd, cut)
    full = jnp.zeros((nd, total), dtype=modes.dtype)
    full = jax.lax.dynamic_update_slice(full, base, (0, 0))
    full = full.reshape(-1).at[idx].set(vals).reshape(nd, total)
    return full.reshape(nd, rows_p // rb, rb, LANES).transpose(1, 0, 2, 3)


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
    cycle: str = "v"     # "v" | "w" — W statically unrolls two visits
    #                      per coarse level (capped by max_w_work, the
    #                      MGPreconditioner semantics)
    max_w_work: int = 64


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _dot(a, b):
    return jax.lax.dot(a, b, precision=HIGHEST,
                       preferred_element_type=jnp.float32)


def _cycle_machine(spec, W0, W1, W0T, W1T, A_refs, C_refs, M_refs, T_ref,
                   xs, bs, ts, ds, xc, bufA, bufC, bufB, bufM, bufT,
                   semA, semC, semB, semM, semT, lane):
    """Build the multilevel V-cycle machinery shared by the single-cycle
    kernel and the fused-PCG kernel.

    bs[0] is an HBM ref pre-blocked as (nblocks, rb, 128); level-0 sweeps
    stream it through bufB/semB.  Returns (cycle, sweep, dma) where
    cycle() executes one full V-cycle (xs[0] := M @ bs[0])."""
    L = len(spec.levels)
    rb = spec.rb
    pt = spec.padt

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
            acc = _diag_sum(offs, lambda d, off: buf[slot, d] * _shifted(
                xblk, rolls, lane, src_p, rb, off))
            write(blk, slot, base, acc)
            if blk + D < nblocks:
                # slot just consumed — safe to refill D blocks ahead
                start(slot, blk + D)

    def get_b(lv, slot, base):
        if lv == 0:
            return bufB[slot].astype(jnp.float32)
        return bs[lv][base:base + rb, :].astype(jnp.float32)

    def cheb_step(lv, w_d):
        """One Chebyshev step — t := b - A x AND the C-apply/d-update in
        a SINGLE block loop.  The C-apply lags the t-pass by one block
        (its halo needs padt rows of the NEXT t block, padt < rb), which
        halves the per-level block-loop count vs separate sweeps — the
        per-block fixed costs (DMA waits, loop fill/drain) dominate the
        pass floor (docs/PERF_NOTES.md)."""
        S = spec.levels[lv]
        x, t = xs[lv], ts[lv]
        p = S.padr
        nblocks = S.nblocks
        D = spec.nbuf
        assert pt < rb

        def startA(slot, blk):
            dma(A_refs[lv], bufA, semA, slot, blk).start()
            if lv == 0:
                dma(bs[0], bufB, semB, slot, blk).start()

        def c_apply(blk):
            cslot = blk % D
            dma(C_refs[lv], bufC, semC, cslot, blk).wait()
            cbase = blk * rb
            tblk = t[cbase:cbase + rb + 2 * pt, :]
            rolls = {}
            acc = _diag_sum(S.offsC, lambda d, off: bufC[cslot, d]
                            * _shifted(tblk, rolls, lane, pt, rb, off))
            w_d(blk, cslot, cbase, acc)
            if blk + D < nblocks:
                dma(C_refs[lv], bufC, semC, cslot, blk + D).start()

        for pre in range(min(D, nblocks)):
            startA(pre, pre)
            dma(C_refs[lv], bufC, semC, pre, pre).start()
        for blk in range(nblocks):
            slot = blk % D
            dma(A_refs[lv], bufA, semA, slot, blk).wait()
            if lv == 0:
                dma(bs[0], bufB, semB, slot, blk).wait()
            base = blk * rb
            xblk = x[base:base + rb + 2 * p, :]
            rolls = {}
            acc = _diag_sum(S.offsA, lambda d, off: bufA[slot, d]
                            * _shifted(xblk, rolls, lane, p, rb, off))
            t[pt + base:pt + base + rb, :] = get_b(lv, slot, base) - acc
            if blk + D < nblocks:
                startA(slot, blk + D)
            if blk >= 1:
                c_apply(blk - 1)
        c_apply(nblocks - 1)

    def cheb(lv, iters):
        """`iters` degree-k Chebyshev sweeps on level lv (in-place x)."""
        S = spec.levels[lv]
        x, d = xs[lv], ds[lv]
        p = S.padr

        for itn in range(iters):
            for k in range(S.degree):
                if itn or k:
                    x[p:p + S.rows_p, :] = x[p:p + S.rows_p, :] + d[:]
                if k == 0:
                    def w_d(blk, slot, base, acc, s=1.0 / S.theta):
                        d[base:base + rb, :] = s * acc
                else:
                    def w_d(blk, slot, base, acc, ak=S.coefs[k - 1][0],
                            ck=S.coefs[k - 1][1]):
                        d[base:base + rb, :] = (
                            ak * d[base:base + rb, :] + ck * acc)
                cheb_step(lv, w_d)
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

    def coarse_solve(rc):
        # ---- coarse dense solve: x_c[R] = b_flat @ T[R] -------------
        # T streams in double-buffered column chunks: with the
        # TPU-optimal LARGE coarse spaces (dense MXU solves run at
        # near-bandwidth, unlike the shuffle-bound sweeps — so truncate
        # the hierarchy early) T is the biggest per-cycle transfer.
        # Cast on use: T may be stored reduced-precision (bf16); the
        # coarse solve is part of the preconditioner, where storage
        # rounding costs ~nothing (docs/PERF_NOTES.md).
        bflat = rc.reshape(1, spec.nc)
        tch = int(bufT.shape[1])
        tiles = [(R, ch, min(tch, spec.nc - ch))
                 for R in range(spec.rows_c)
                 for ch in range(0, spec.nc, tch)]

        def tdma(slot, t):
            R, ch, cl = t
            return pltpu.make_async_copy(
                T_ref.at[R, pl.ds(ch, cl)], bufT.at[slot, pl.ds(0, cl)],
                semT.at[slot])

        tdma(0, tiles[0]).start()
        acc = None
        for k, t in enumerate(tiles):
            slot = k % 2
            if k + 1 < len(tiles):
                tdma((k + 1) % 2, tiles[k + 1]).start()
            tdma(slot, t).wait()
            R, ch, cl = t
            part = _dot(bflat[:, ch:ch + cl],
                        bufT[slot, 0:cl, :].astype(jnp.float32))
            acc = part if ch == 0 else acc + part
            if ch + cl >= spec.nc:
                xc[R:R + 1, :] = acc

    def cycle():
        # recursive level visit, statically unrolled.  V: each level
        # visited once (the classic down/up sweep).  W: two child
        # visits per level while the recursive visit count 2^lvl stays
        # under spec.max_w_work (MGPreconditioner._cycle semantics) —
        # the second visit WARM-starts from the first one's x (skip the
        # zeroing; bs is untouched by child visits, and every level
        # gets at least one cold visit per launch, which zeroes the t
        # halo pads the sweeps rely on).
        cyc = getattr(spec, "cycle", "v")
        cap = getattr(spec, "max_w_work", 64)

        def visit(lv, warm):
            S = spec.levels[lv]
            if not warm:
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
                visit(lv + 1, False)
                if cyc == "w" and 2 ** (lv + 1) <= cap:
                    visit(lv + 1, True)
            else:
                # exact coarse solve: a second W visit would recompute
                # the identical correction (MGPreconditioner gets the
                # same numbers by discarding the first) — solve once
                coarse_solve(rc)
            prolong_add(lv)
            cheb(lv, S.post)

        visit(0, False)

    return cycle, sweep, dma


def _mega_kernel(spec: _CycleSpec, *refs):
    L = len(spec.levels)
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
    lane = jax.lax.broadcasted_iota(jnp.int32, (spec.rb, LANES), 1)
    cycle, _, _ = _cycle_machine(
        spec, W0, W1, W0T, W1T, A_refs, C_refs, M_refs, T_ref,
        xs, bs, ts, ds, xc, bufA, bufC, bufB, bufM, bufT,
        semA, semC, semB, semM, semT, lane)
    cycle()


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
        pltpu.VMEM((2, min(spec.nc, 2048), LANES), T.dtype),   # bufT
        pltpu.SemaphoreType.DMA((D,)),
        pltpu.SemaphoreType.DMA((D,)),
        pltpu.SemaphoreType.DMA((D,)),
        pltpu.SemaphoreType.DMA((D,)),
        pltpu.SemaphoreType.DMA((2,)),
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
    total += 2 * min(spec.nc, 2048) * LANES * itemA
    total += 4 * LANES * LANES * f32
    return total


# ---------------------------------------------------------------------------
# Fused whole-chunk PCG: `chunk` complete PCG iterations (outer SpMV, dot
# products, vector updates, V-cycle preconditioner, residual statistics) in
# ONE pallas_call.  The per-iteration XLA glue (~10 ops x ~15 us) and the
# two kernel dispatches (~100-250 us each) of the launch-per-apply path
# disappear; the host syncs once per chunk on the stats fetch.
#
# State placement: z (the preconditioned residual) lives in VMEM (the
# cycle's fine x storage); r / x / p live in HBM and stream blockwise —
# r doubles as the V-cycle rhs through the existing bufB streaming path.
# p is updated in place with the recompute-from-old rule
# ``p_new = z + beta * p_old`` applied uniformly to haloed tiles, so
# neighbor-block halo reads need no ordering against core writes beyond a
# one-block write lag (reads of block k+1 span block k's core tail).
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class _PCGSpec:
    offsQ: tuple         # outer (CG) operator DIA offsets, kernel layout
    chunk: int           # PCG iterations per launch
    aliased: bool        # use input_output_aliases for x/r/p/z


def _pcg_kernel(spec: _CycleSpec, pspec: _PCGSpec, *refs):
    L = len(spec.levels)
    rb = spec.rb
    S0 = spec.levels[0]
    p0 = S0.padr
    nb = S0.nblocks
    rows_p = S0.rows_p
    D = spec.nbuf
    it_refs = iter(refs)
    W0, W1, W0T, W1T = (next(it_refs) for _ in range(4))
    A_refs = [next(it_refs) for _ in range(L)]
    C_refs = [next(it_refs) for _ in range(L)]
    M_refs = [next(it_refs) for _ in range(L)]
    T_ref = next(it_refs)
    Q_ref = next(it_refs)
    rzp_ref = next(it_refs)
    x_in, r_in, p_in, z_in = (next(it_refs) for _ in range(4))
    x_hbm, r_hbm, p_hbm, z_out, stats = (next(it_refs) for _ in range(5))
    x0 = next(it_refs)
    t0, d0 = next(it_refs), next(it_refs)
    xs, bs, ts, ds = [x0], [r_hbm], [t0], [d0]
    for _ in range(1, L):
        xs.append(next(it_refs))
        bs.append(next(it_refs))
        ts.append(next(it_refs))
        ds.append(next(it_refs))
    xc = next(it_refs)
    bufA, bufC, bufB, bufM, bufT = (next(it_refs) for _ in range(5))
    semA, semC, semB, semM, semT = (next(it_refs) for _ in range(5))
    bufQ, bufP, bufX, ringP, ringX, ringR = (
        next(it_refs) for _ in range(6))
    semQ, semP, semX, semPW, semXW, semRW = (
        next(it_refs) for _ in range(6))

    lane = jax.lax.broadcasted_iota(jnp.int32, (rb, LANES), 1)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    tiny = jnp.float32(1e-30)

    cycle, _, dma = _cycle_machine(
        spec, W0, W1, W0T, W1T, A_refs, C_refs, M_refs, T_ref,
        xs, bs, ts, ds, xc, bufA, bufC, bufB, bufM, bufT,
        semA, semC, semB, semM, semT, lane)

    def copy(src, dst):
        cp = pltpu.make_async_copy(src, dst, semT.at[0])
        cp.start()
        cp.wait()

    # ---- prologue: z -> x0 (halo zeroed); un-aliased mode forwards ----
    x0[0:p0, :] = jnp.zeros((p0, LANES), jnp.float32)
    x0[p0 + rows_p:, :] = jnp.zeros((p0, LANES), jnp.float32)
    copy(z_in, x0.at[pl.ds(p0, rows_p)])
    if not pspec.aliased:
        copy(x_in, x_hbm)
        copy(r_in, r_hbm)
        copy(p_in, p_hbm)

    def phase_rz():
        """sum(r * z): r streamed from HBM via bufB, z resident in x0."""
        acc = jnp.zeros((1, 1), jnp.float32)
        for pre in range(min(D, nb)):
            dma(r_hbm, bufB, semB, pre, pre).start()
        for blk in range(nb):
            slot = blk % D
            dma(r_hbm, bufB, semB, slot, blk).wait()
            base = blk * rb
            zblk = x0[p0 + base:p0 + base + rb, :]
            acc = acc + jnp.sum(bufB[slot] * zblk, keepdims=True
                                ).reshape(1, 1)
            if blk + D < nb:
                dma(r_hbm, bufB, semB, slot, blk + D).start()
        return acc

    def phase_qp(beta):
        """p := z + beta*p and q := Q @ p -> d0 in one pass; returns p·q.

        Haloed p tiles are recomputed from OLD p everywhere (halo rows of
        already-updated neighbors give the same value by construction),
        so reads never depend on this pass's writes; core write-back lags
        one block so in-order reads of block k (spanning block k-1's core
        tail) complete before block k-1's write starts.  In-flight
        prefetches (>= k+1) start past the write's last row (rb > padr)."""
        acc = jnp.zeros((1, 1), jnp.float32)

        def rd(slot, blk):
            return pltpu.make_async_copy(
                p_hbm.at[pl.ds(blk * rb, rb + 2 * p0)], bufP.at[slot],
                semP.at[slot])

        def wr(w, blk):
            return pltpu.make_async_copy(
                ringP.at[w], p_hbm.at[pl.ds(p0 + blk * rb, rb)],
                semPW.at[w])

        def start_in(slot, blk):
            rd(slot, blk).start()
            dma(Q_ref, bufQ, semQ, slot, blk).start()

        for pre in range(min(D, nb)):
            start_in(pre, pre)
        for blk in range(nb):
            slot = blk % D
            w = blk % 2
            rd(slot, blk).wait()
            dma(Q_ref, bufQ, semQ, slot, blk).wait()
            if blk >= 1:
                wr((blk - 1) % 2, blk - 1).start()
            if blk >= 2:
                wr(w, blk - 2).wait()
            base = blk * rb
            ztile = x0[base:base + rb + 2 * p0, :]
            ptile = ztile + beta * bufP[slot]
            rolls = {}
            q = _diag_sum(pspec.offsQ, lambda d, off: bufQ[slot, d]
                          * _shifted(ptile, rolls, lane, p0, rb, off))
            d0[base:base + rb, :] = q
            pcore = ptile[p0:p0 + rb, :]
            ringP[w] = pcore
            acc = acc + jnp.sum(pcore * q, keepdims=True).reshape(1, 1)
            if blk + D < nb:
                start_in(slot, blk + D)
        wr((nb - 1) % 2, nb - 1).start()
        if nb >= 2:
            wr((nb - 2) % 2, nb - 2).wait()
        wr((nb - 1) % 2, nb - 1).wait()
        return acc

    def phase_xr(alpha):
        """x += alpha*p, r -= alpha*q(d0); returns (||r||^2, ||x||^2).
        Block-aligned read-modify-write streams (no halo -> no cross-
        block overlap -> immediate write-back is race-free)."""
        rn = jnp.zeros((1, 1), jnp.float32)
        xn = jnp.zeros((1, 1), jnp.float32)

        def rdp(slot, blk):
            return pltpu.make_async_copy(
                p_hbm.at[pl.ds(p0 + blk * rb, rb)],
                bufP.at[slot, pl.ds(0, rb)], semP.at[slot])

        def wrx(w, blk):
            return pltpu.make_async_copy(ringX.at[w], x_hbm.at[blk],
                                         semXW.at[w])

        def wrr(w, blk):
            return pltpu.make_async_copy(ringR.at[w], r_hbm.at[blk],
                                         semRW.at[w])

        def start_in(slot, blk):
            dma(x_hbm, bufX, semX, slot, blk).start()
            rdp(slot, blk).start()
            dma(r_hbm, bufB, semB, slot, blk).start()

        for pre in range(min(D, nb)):
            start_in(pre, pre)
        for blk in range(nb):
            slot = blk % D
            w = blk % 2
            dma(x_hbm, bufX, semX, slot, blk).wait()
            rdp(slot, blk).wait()
            dma(r_hbm, bufB, semB, slot, blk).wait()
            if blk >= 2:
                wrx(w, blk - 2).wait()
                wrr(w, blk - 2).wait()
            base = blk * rb
            xt = bufX[slot] + alpha * bufP[slot, 0:rb, :]
            rt = bufB[slot] - alpha * d0[base:base + rb, :]
            ringX[w] = xt
            ringR[w] = rt
            xn = xn + jnp.sum(xt * xt, keepdims=True).reshape(1, 1)
            rn = rn + jnp.sum(rt * rt, keepdims=True).reshape(1, 1)
            wrx(w, blk).start()
            wrr(w, blk).start()
            if blk + D < nb:
                start_in(slot, blk + D)
        for blk in range(max(nb - 2, 0), nb):
            w = blk % 2
            wrx(w, blk).wait()
            wrr(w, blk).wait()
        return rn, xn

    def write_stats(row, vals, full):
        out = jnp.zeros((1, LANES), jnp.float32) if full else \
            stats[pl.ds(row, 1), :]
        for ln, v in vals.items():
            out = jnp.where(lane1 == ln, v, out)
        stats[pl.ds(row, 1), :] = out

    def body(it2, rz_prev):
        rz = phase_rz()
        beta = jnp.where(rz_prev > 0, rz / (rz_prev + tiny),
                         jnp.zeros((1, 1), jnp.float32))
        # lanes 1,2 of the PREVIOUS row (harmlessly clobbers row 0 at
        # it=0; rewritten correctly at it=1)
        write_stats(jnp.maximum(it2 - 1, 0),
                    {1: beta, 2: jnp.sqrt(jnp.abs(rz))}, full=False)
        pAp = phase_qp(beta)
        alpha = rz / (pAp + tiny)
        rn, xn = phase_xr(alpha)
        write_stats(it2, {0: alpha, 3: jnp.sqrt(rn), 4: jnp.sqrt(xn)},
                    full=True)
        cycle()
        return rz

    rz0 = rzp_ref[0].reshape(1, 1)
    rz_last = jax.lax.fori_loop(0, pspec.chunk, body, rz0)
    # finalize the last row (its beta / preconditioned-residual norm come
    # from one more r·z against the fresh z); stash the chunk carry
    rz_T = phase_rz()
    beta_T = jnp.where(rz_last > 0, rz_T / (rz_last + tiny),
                       jnp.zeros((1, 1), jnp.float32))
    write_stats(pspec.chunk - 1,
                {1: beta_T, 2: jnp.sqrt(jnp.abs(rz_T))}, full=False)
    write_stats(pspec.chunk, {0: rz_T, 1: rz_last}, full=True)
    copy(x0.at[pl.ds(p0, rows_p)], z_out)


@partial(jax.jit, static_argnames=("spec", "pspec", "interpret"))
def _pcg_call(spec: _CycleSpec, pspec: _PCGSpec, interpret, W0, W1, W0T,
              W1T, A_planes, C_planes, M_planes, T, Q4, rz_prev, x3, r3,
              p2, z2):
    L = len(spec.levels)
    rb = spec.rb
    pt = spec.padt
    f32 = jnp.float32
    S0 = spec.levels[0]
    D = spec.nbuf
    p0 = S0.padr
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec(memory_space=pl.ANY)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    scratch = [
        pltpu.VMEM((S0.rows_p + 2 * p0, LANES), f32),    # x0 (z storage)
        pltpu.VMEM((S0.rows_p + 2 * pt, LANES), f32),    # t0
        pltpu.VMEM((S0.rows_p, LANES), f32),             # d0 (doubles as q)
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
    ndQ = Q4.shape[1]
    scratch += [
        pltpu.VMEM((max(spec.rows_c, 8), LANES), f32),         # xc
        pltpu.VMEM((D, ndA, rb, LANES), A_planes[0].dtype),    # bufA
        pltpu.VMEM((D, ndC, rb, LANES), C_planes[0].dtype),    # bufC
        pltpu.VMEM((D, rb, LANES), f32),                       # bufB
        pltpu.VMEM((D, rb, LANES), M_planes[0].dtype),         # bufM
        pltpu.VMEM((2, min(spec.nc, 2048), LANES), T.dtype),   # bufT
        pltpu.SemaphoreType.DMA((D,)),
        pltpu.SemaphoreType.DMA((D,)),
        pltpu.SemaphoreType.DMA((D,)),
        pltpu.SemaphoreType.DMA((D,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.VMEM((D, ndQ, rb, LANES), f32),                  # bufQ
        pltpu.VMEM((D, rb + 2 * p0, LANES), f32),              # bufP
        pltpu.VMEM((D, rb, LANES), f32),                       # bufX
        pltpu.VMEM((2, rb, LANES), f32),                       # ringP
        pltpu.VMEM((2, rb, LANES), f32),                       # ringX
        pltpu.VMEM((2, rb, LANES), f32),                       # ringR
        pltpu.SemaphoreType.DMA((D,)),   # semQ
        pltpu.SemaphoreType.DMA((D,)),   # semP
        pltpu.SemaphoreType.DMA((D,)),   # semX
        pltpu.SemaphoreType.DMA((2,)),   # semPW
        pltpu.SemaphoreType.DMA((2,)),   # semXW
        pltpu.SemaphoreType.DMA((2,)),   # semRW
    ]
    nin = 4 + 3 * L + 3          # W(4), A/C/M planes, T, Q, rz_prev
    io_alias = {nin: 0, nin + 1: 1, nin + 2: 2, nin + 3: 3} \
        if pspec.aliased else {}
    out_shape = (
        jax.ShapeDtypeStruct(x3.shape, f32),
        jax.ShapeDtypeStruct(r3.shape, f32),
        jax.ShapeDtypeStruct(p2.shape, f32),
        jax.ShapeDtypeStruct(z2.shape, f32),
        jax.ShapeDtypeStruct((pspec.chunk + 1, LANES), f32),
    )
    with jax.enable_x64(False):
        return pl.pallas_call(
            partial(_pcg_kernel, spec, pspec),
            in_specs=[vspec] * 4 + [aspec] * (3 * L)
            + [aspec, aspec, sspec] + [aspec] * 4,
            out_specs=(aspec, aspec, aspec, aspec, vspec),
            out_shape=out_shape,
            scratch_shapes=scratch,
            input_output_aliases=io_alias,
            interpret=interpret,
        )(W0, W1, W0T, W1T, *A_planes, *C_planes, *M_planes, T, Q4,
          rz_prev, x3, r3, p2, z2)


@jax.tree_util.register_pytree_node_class
class FusedPCG:
    """Whole-chunk PCG runner: `chunk` iterations per kernel launch.

    Wraps a FusedVCycle (shared hierarchy planes) plus the outer operator
    planes Q (f32 — the CG matvec defines the true residual and cannot
    take storage rounding, unlike the preconditioner)."""

    def __init__(self, vc: FusedVCycle, Q4, offsQ, interpret=False):
        self.vc = vc
        self.Q4 = Q4
        self.offsQ = tuple(int(o) for o in offsQ)
        self.interpret = bool(interpret)

    def tree_flatten(self):
        return ((self.vc, self.Q4), (self.offsQ, self.interpret))

    @classmethod
    def tree_unflatten(cls, aux, ch):
        vc, Q4 = ch
        return cls(vc, Q4, aux[0], aux[1])

    @property
    def cspec(self):
        # the chunked kernel trades plane-stream depth for its extra
        # Q/P/X buffers (nbuf=4 busts VMEM at n=512: measured 16.3 MiB)
        from dataclasses import replace as _rep
        return _rep(self.vc.spec, nbuf=min(self.vc.spec.nbuf, 2))

    def run_chunk(self, x3, r3, p2, z2, rz_prev, chunk):
        vc = self.vc
        pspec = _PCGSpec(offsQ=self.offsQ, chunk=int(chunk),
                         aliased=not self.interpret)
        return _pcg_call(self.cspec, pspec, self.interpret, vc.W0, vc.W1,
                         vc.W0T, vc.W1T, vc.A_planes, vc.C_planes,
                         vc.M_planes, vc.T, self.Q4, rz_prev, x3, r3,
                         p2, z2)


def pcg_fused(fp: FusedPCG, b, tol=1e-8, maxiter=500, chunk=32,
              stop_type=2, callback=None):
    """PCG with the whole-chunk fused kernel; mirrors krylov.cg.pcg's
    host loop, diagnostics contract (CGResult) and stop types
    (/root/reference/src/input_metric.dat:54).  b and the returned x are
    in the kernel-flat layout (length vc.nflat)."""
    from ..krylov.cg import CGResult, _TINY
    vc = fp.vc
    S0 = vc.spec.levels[0]
    nb, rb = S0.nblocks, vc.spec.rb
    rows_p, p0 = S0.rows_p, S0.padr
    b = jnp.asarray(b, jnp.float32)
    bm = b * vc.mask_flat
    maxiter = int(maxiter)
    chunk = max(1, min(int(chunk), maxiter))
    z = vc.matvec(bm)                      # z0 = M r0, r0 = b (x0 = 0)
    r3 = bm.reshape(nb, rb, LANES)
    x3 = jnp.zeros_like(r3)
    p2 = jnp.zeros((rows_p + 2 * p0, LANES), jnp.float32)
    z2 = z.reshape(rows_p, LANES).astype(jnp.float32)
    # single stacked value fetch (each host round trip costs ~30-60 ms
    # on the remote runtime — docs/PERF_NOTES.md)
    init = np.asarray(jnp.stack([jnp.vdot(bm, z), jnp.linalg.norm(bm),
                                 jnp.linalg.norm(b)]))
    rz, rnorm0 = float(init[0]), float(init[1])
    res0 = float(np.sqrt(max(rz, 0.0)))
    res_hist = [res0]
    true_hist = [rnorm0]
    norm_b = float(init[2]) if stop_type == 1 else 0.0
    alphas, betas = [], []
    k = 0
    if stop_type == 1:
        converged = rnorm0 <= tol * norm_b or norm_b == 0.0
    else:
        converged = res0 == 0.0
    rz_prev = jnp.asarray([-1.0], jnp.float32)

    def _crossed(o):
        if stop_type == 1:
            return o[:, 3] <= tol * norm_b
        if stop_type == 3:
            return o[:, 3] <= tol * np.maximum(o[:, 4], _TINY)
        return o[:, 2] <= tol * res0

    while not converged and k < maxiter:
        x3, r3, p2, z2, stats = fp.run_chunk(x3, r3, p2, z2, rz_prev,
                                             chunk)
        o = np.asarray(stats)              # value fetch = true barrier
        rz_prev = jnp.asarray([o[chunk, 1]], jnp.float32)
        o = o[:chunk, :5]
        cross = _crossed(o)
        hit = np.flatnonzero(cross | ~np.isfinite(o[:, 2]))
        take = int(hit[0]) + 1 if len(hit) else chunk
        take = min(take, maxiter - k)
        alphas.extend(o[:take, 0].tolist())
        betas.extend(o[:take, 1].tolist())
        res_hist.extend(o[:take, 2].tolist())
        true_hist.extend(o[:take, 3].tolist())
        k += take
        converged = len(hit) > 0 and np.isfinite(o[hit[0], 2]) \
            and bool(cross[hit[0]])
        if len(hit) and not converged:
            break
    res = np.asarray(res_hist)
    true = np.asarray(true_hist)
    if callback is not None:
        for i in range(1, k + 1):
            callback(i, None, true[i])
    return CGResult(x=x3.reshape(-1), niters=k, converged=bool(converged),
                    residuals=res, true_residuals=true,
                    alphas=np.asarray(alphas), betas=np.asarray(betas))


def setup_grid_fused_pcg(A_host: HostCSR, dims, F=1, mask=None,
                         params: AMGParameters = AMGParameters(),
                         cheb_degree=3, cheb_ratio=8.0, cheb_kind=1,
                         storage_dtype=None,
                         rb=64, nbuf=4, interpret=False):
    """FusedVCycle + outer-operator planes -> (FusedPCG, slots, nflat).

    Raises ValueError when the chunked kernel cannot fit (VMEM) — callers
    fall back to the launch-per-apply fused path."""
    vc, slots, nflat = setup_grid_fused(
        A_host, dims, F=F, mask=mask, params=params,
        cheb_degree=cheb_degree, cheb_ratio=cheb_ratio,
        cheb_kind=cheb_kind, storage_dtype=storage_dtype, rb=rb,
        nbuf=nbuf, interpret=interpret)
    S0 = vc.spec.levels[0]
    r, c, v = A_host.to_coo()
    Ak = HostCSR.from_coo(slots[r], slots[c], v, (nflat, nflat))
    offsQ, dataQ = _dia_np(Ak)
    if _plan_padr(offsQ) > S0.padr:
        raise ValueError("outer offsets exceed the fine-level halo")
    Q4 = _planes_to_device(dataQ, S0.rows, S0.rows_p, vc.spec.rb,
                           S0.K * LANES, jnp.float32)
    itemA = jnp.dtype(storage_dtype or jnp.float32).itemsize
    fp = FusedPCG(vc, Q4, offsQ, interpret=interpret)
    need = fused_pcg_vmem_bytes(fp.cspec, len(offsQ), itemA)
    if not interpret and need > PCG_VMEM_BUDGET:
        raise ValueError(f"fused PCG needs {need} bytes VMEM "
                         f"(> {PCG_VMEM_BUDGET})")
    return fp, slots, nflat


def fused_pcg_vmem_bytes(cspec: _CycleSpec, ndQ, itemA, chunk_max=128):
    """Exact VMEM bytes of the chunked-PCG kernel's scratch + VMEM outs."""
    f32 = 4
    D = cspec.nbuf
    rb = cspec.rb
    S0 = cspec.levels[0]
    total = (S0.rows_p + 2 * S0.padr) * LANES * f32    # x0
    total += (S0.rows_p + 2 * cspec.padt) * LANES * f32   # t0
    total += S0.rows_p * LANES * f32                   # d0
    for S in cspec.levels[1:]:
        total += ((S.rows_p + 2 * S.padr) + (S.rows_p + 2 * cspec.padt)
                  + 2 * S.rows_p) * LANES * f32
    total += max(cspec.rows_c, 8) * LANES * f32        # xc
    ndA = len(S0.offsA)
    ndC = len(S0.offsC)
    total += D * ndA * rb * LANES * itemA              # bufA
    total += D * ndC * rb * LANES * itemA              # bufC
    total += D * rb * LANES * f32                      # bufB
    total += D * rb * LANES * itemA                    # bufM
    total += 2 * min(cspec.nc, 2048) * LANES * itemA   # bufT
    total += D * ndQ * rb * LANES * f32                # bufQ
    total += D * (rb + 2 * S0.padr) * LANES * f32      # bufP
    total += D * rb * LANES * f32                      # bufX
    total += 3 * 2 * rb * LANES * f32                  # rings
    total += 4 * LANES * LANES * f32                   # W mats
    total += (chunk_max + 1) * LANES * f32             # stats
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
        visits = 1
        w = getattr(self.spec, "cycle", "v") == "w"
        cap = getattr(self.spec, "max_w_work", 64)
        for lv, (S, nnz) in enumerate(zip(self.spec.levels,
                                          self.level_nnz)):
            if w and lv and 2 ** lv <= cap:
                visits *= 2
            total += visits * nnz * (S.pre + S.post + 1)
        return total + visits * self.coarse_n * self.coarse_n

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
    # multiple of 8 = one f32 vreg of sublanes: keeps 8-aligned row
    # shifts on the free-slice path of the "aligned" shift variant
    maxabs = max((abs(int(o)) for o in offsets), default=0)
    return _round_up(maxabs // LANES + 1, 8)


def setup_grid_fused(A_host: HostCSR, dims, F=1, mask=None,
                     params: AMGParameters = AMGParameters(),
                     cheb_degree=3, cheb_ratio=8.0, cheb_kind=1,
                     storage_dtype=None,
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
    if params.cycle_type not in ("v", "w") or params.maxit != 1:
        raise ValueError("fused cycle supports V/W cycles, maxit=1")

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
                                   cheb_degree, cheb_kind)
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
                1.1 * lmax, 1.1 * lmax / cheb_ratio, cheb_degree,
                kind=cheb_kind)
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
                      nc=nc, rb=rb, padt=4, nbuf=int(nbuf),
                      cycle=params.cycle_type,
                      max_w_work=params.max_w_work)
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
        A_dev.append(_planes_to_device(dataA, S.rows, rows_p, rb,
                                       S.K * LANES, sdtype))
        C_dev.append(_planes_to_device(dataC, S.rows, rows_p, rb,
                                       S.K * LANES, sdtype))
    spec = _CycleSpec(
        levels=tuple(
            _LevelSpec(lead=S.lead, K=S.K, rows=S.rows, rows_p=S.rows_p,
                       padr=S.padr, nblocks=S.nblocks,
                       offsA=S.offsA + (0,) * (ndA_max - len(S.offsA)),
                       offsC=S.offsC, theta=S.theta, coefs=S.coefs,
                       degree=S.degree, pre=S.pre, post=S.post)
            for S in levels_spec),
        Kc=Kc, rows_c=rows_c, nc=nc, rb=rb, padt=4, nbuf=int(nbuf),
        cycle=params.cycle_type, max_w_work=params.max_w_work)

    # coarse dense inverse, embedded into the kernel-flat coarse layout
    kslots_c = _kernel_slots(dims_c, F, Kc)
    if reference or A.shape[0] == 0:
        # host f64 inverse (the parity tests compare against an
        # MGPreconditioner built from exactly this inverse)
        inv_can = np.linalg.inv(A.toarray()) if A.shape[0] else \
            np.zeros((0, 0))
        inv_k = np.eye(nc)
        inv_k[np.ix_(kslots_c, kslots_c)] = inv_can
        T = jnp.asarray(np.stack([np.ascontiguousarray(
            inv_k[R * LANES:(R + 1) * LANES, :].T)
            for R in range(rows_c)]), dtype=sdtype)
    else:
        # invert ON DEVICE (MXU LU in f32): ship only the sparse coarse
        # operator + slot map instead of the nc^2 dense inverse — the
        # inverse was the single largest setup transfer (33 MB at
        # coarse_dof=4096 bf16) and T is stored in sdtype anyway, so
        # f32 factorization error is far below the storage rounding
        rr, cc, vv = A.to_coo()
        T = _coarse_inv_device(jnp.asarray(rr), jnp.asarray(cc),
                               jnp.asarray(vv, dtype=jnp.float32),
                               jnp.asarray(kslots_c), A.shape[0], nc,
                               rows_c, jnp.dtype(sdtype))
    W0, W1 = _wmats(F)
    vc = FusedVCycle(
        spec, jnp.asarray(W0), jnp.asarray(W1),
        jnp.asarray(np.ascontiguousarray(W0.T)),
        jnp.asarray(np.ascontiguousarray(W1.T)),
        A_dev, C_dev, M_planes, T,
        mask_flat0, interpret=interpret,
        level_nnz=level_nnz, coarse_n=A.shape[0])
    if reference:
        ref = MGPreconditioner(
            tuple(ref_levels),
            jnp.asarray(inv_can, dtype=jnp.float64),
            cycle=params.cycle_type, maxit=1,
            presmooth=params.presmooth_iter,
            postsmooth=params.postsmooth_iter,
            max_w_work=params.max_w_work)
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
        from ..sparse.dia_pallas import maybe_pdia
        return maybe_pdia(D, interpret=interpret)
    return D
