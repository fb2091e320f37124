"""Fused multi-diagonal SpMV as a single Pallas TPU kernel (PDIA).

Why: the XLA DIA matvec emits one dynamic-slice + FMA pair per diagonal
(~3*ndiags ops).  On the remote TPU runtime each op in the compiled
program costs ~15 us of executor overhead, and a metric V-cycle issues
~1400 such ops per PCG iteration — the solve is dispatch-bound, not
bandwidth-bound (docs/PERF_NOTES.md).  This kernel computes the entire
multi-diagonal SpMV (optionally fused with the residual ``b - A@x``) in
ONE kernel launch.

Mosaic alignment: 1-D vector loads at arbitrary offsets are rejected
("index must be a multiple of 1024").  The kernel therefore works in a
2-D (row, lane) layout: a flat shift by a *static* diagonal offset
``o = q*128 + s`` decomposes into

    row slice by q  (static sublane slice of a VMEM-resident block)
  + lane roll by s  (pltpu.roll, static)
  + select at the lane boundary (elements with lane >= 128-s come from
    the next row).

All shift amounts are trace-time constants because DIA offsets are static.
Diagonal-value planes are streamed block-by-block through VMEM while the
(padded, reshaped) x vector stays fully VMEM-resident; rolls are shared
between diagonals with equal ``s``.

Replaces the reference's per-iteration HAZmath CSR SpMV
(/root/reference/src/utils.py:119 solve path) on the TPU hot path.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .dia import DIA
from .host import HostCSR

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False

LANES = 128
_MAX_RB = 128          # rows per grid block (128 rows x 128 lanes = 16k)
FUSED_VMEM_BUDGET = 13 * 2 ** 20   # leave headroom of the ~16MB/core VMEM


def _round_up(x, m):
    return -(-x // m) * m


_VMEM_SOFT = 12 * 2 ** 20   # leave headroom under Mosaic's 16M scope


def _plan(offsets, n, item=4):
    """(padr, rb, nrows): row padding, block rows, padded total rows.

    padr is a multiple of 8 (one full f32 vreg of sublanes) so that a
    diagonal whose row shift q is itself 8-aligned slices the VMEM block
    at a vreg boundary — free addressing instead of sublane shuffles
    (the "aligned" shift variant below).

    rb shrinks with the diagonal count so the double-buffered
    (nd, rb, 128) plane block fits VMEM — wide-band operators (3D-1D
    footprint systems reach ~200 offsets) blew the 16M scope at
    rb=128."""
    maxabs = max((abs(int(o)) for o in offsets), default=0)
    padr = _round_up(maxabs // LANES + 1, 8)
    r0 = _round_up(max(n, 1), LANES) // LANES
    rb = _MAX_RB if r0 >= _MAX_RB else _round_up(r0, 32)
    nd = max(len(offsets), 1)
    xbytes = (r0 + 2 * padr) * LANES * 4
    while rb > 32 and xbytes + 2 * nd * rb * LANES * item > _VMEM_SOFT:
        # shrink along 32-aligned sizes (24/48 sublane blocks are not
        # tile-aligned for bf16 planes)
        rb = _round_up(rb // 2, 32)
    nrows = _round_up(r0, rb)
    return padr, rb, nrows


def pdia_fits_vmem(offsets, n, item=4):
    """Whether the planned SpMV kernel fits the VMEM soft budget."""
    padr, rb, nrows = _plan(offsets, n, item)
    xbytes = (nrows + 2 * padr) * LANES * 4
    need = xbytes + 2 * len(offsets) * rb * LANES * item \
        + 2 * rb * LANES * 4
    return need <= _VMEM_SOFT


def maybe_pdia(D, interpret=False):
    """PDIA when the kernel fits VMEM at the planned block size, else
    the DIA unchanged (XLA roll-based matvec) — extreme band counts
    (irregular 3D-1D footprints after the COO spill cap) cannot stream
    their plane blocks through VMEM at any block size."""
    item = jnp.dtype(D.data.dtype).itemsize
    if not pdia_fits_vmem(D.offsets, D.shape[0], item):
        return D
    return PDIA.from_dia(D, interpret=interpret)


# Shift decomposition variant (read once at import/trace time):
#   "aligned" — per distinct lane shift s: ONE lane roll + ONE row
#               roll-by-1 (shared across every diagonal with that s);
#               each diagonal then takes two static row slices which are
#               FREE (vreg addressing) whenever padr+q lands on an
#               8-sublane boundary (padr is 8-aligned by _plan, and the
#               grid/structured row-band offsets usually give q = +-8m —
#               e.g. n=512 bidomain: row stride 1026 = 8*128 + 2).
#               Misaligned q falls back to sublane-shuffle slices, never
#               worse than "slice".  Default: fewest shuffle ops.
#   "roll"    — axis-0 pltpu.roll per (s, q) + aligned [0:rb) slice
#               (round-1 default; rotates on the shift HW)
#   "slice"   — misaligned sublane slice per diagonal
# A/B within one process won't retrace (not a jit static arg) — switch
# via the TPUAMG_SHIFT env var across processes.
import os as _os
SHIFT_VARIANT = _os.environ.get("TPUAMG_SHIFT", "aligned")


def _shifted(xblk, rolls, lane, padr, rb, off):
    """rows [padr+q, padr+q+rb) of xblk, flat-shifted by off; static."""
    q, s = divmod(int(off), LANES)
    if s not in rolls:
        # shift must be i32: under jax_enable_x64 a bare Python int
        # weakly types to i64, which Mosaic's dynamic_rotate rejects
        rolls[s] = pltpu.roll(xblk, jnp.int32(LANES - s), axis=1) \
            if s else xblk
    rs = rolls[s]
    nrtot = rs.shape[0]
    if SHIFT_VARIANT == "aligned":
        base = padr + q

        def sl(arr, b0):
            return jax.lax.slice_in_dim(arr, b0, b0 + rb, axis=0)

        def shifted_rows(key, rowshift):
            # rolls[key][i] = rs[i + rowshift] (cached per (key,) once
            # per s — shared by every diagonal with this lane shift)
            if key not in rolls:
                rolls[key] = pltpu.roll(
                    rs, jnp.int32((nrtot - rowshift) % nrtot), axis=0)
            return rolls[key]

        if s == 0:
            return sl(rs, base)
        if base % 8 != 0 and (base + 1) % 8 == 0:
            # q+1 is the vreg-aligned row: take rows q via a shared
            # roll-down-by-one, rows q+1 directly
            a = sl(shifted_rows(("dn1", s), -1), base + 1)
            return jnp.where(lane < LANES - s, a, sl(rs, base + 1))
        # rows q directly (aligned when base % 8 == 0), rows q+1 via a
        # shared roll-up-by-one
        b = sl(shifted_rows(("up1", s), 1), base)
        return jnp.where(lane < LANES - s, sl(rs, base), b)
    if SHIFT_VARIANT == "roll":

        def row_aligned(rowoff):
            key = (s, rowoff)
            if key not in rolls:
                rolls[key] = pltpu.roll(
                    rs, jnp.int32((nrtot - rowoff) % nrtot), axis=0)
            return jax.lax.slice_in_dim(rolls[key], 0, rb, axis=0)

        a = row_aligned(padr + q)
        if s == 0:
            return a
        return jnp.where(lane < LANES - s, a, row_aligned(padr + q + 1))
    a = jax.lax.slice_in_dim(rs, padr + q, padr + q + rb, axis=0)
    if s == 0:
        return a
    b = jax.lax.slice_in_dim(rs, padr + q + 1, padr + q + 1 + rb, axis=0)
    return jnp.where(lane < LANES - s, a, b)


NACC = 4   # independent FMA accumulators: break the serial add chain
           # (VPU ALU latency >> 1/throughput; LLVM won't reassociate fp)


def _diag_sum(offs, term_of):
    """Sum term_of(d, off) over diagonals with NACC round-robin
    accumulators + a final tree reduce."""
    accs = [None] * NACC
    for d, off in enumerate(offs):
        j = d % NACC
        t = term_of(d, off)
        accs[j] = t if accs[j] is None else accs[j] + t
    accs = [a for a in accs if a is not None]
    while len(accs) > 1:
        accs = [accs[i] + accs[i + 1] if i + 1 < len(accs) else accs[i]
                for i in range(0, len(accs), 2)]
    return accs[0]


def _spmv_kernel(offsets, padr, rb, xpad_ref, data_ref, out_ref):
    i = pl.program_id(0)
    xblk = xpad_ref[pl.ds(i * rb, rb + 2 * padr), :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rb, LANES), 1)
    rolls = {}
    acc = _diag_sum(offsets, lambda d, off: data_ref[d] * _shifted(
        xblk, rolls, lane, padr, rb, off))
    # lax.convert, NOT .astype: under the enable_x64(False) trace context
    # jnp canonicalizes float64 -> float32, breaking f64 kernels
    out_ref[:] = jax.lax.convert_element_type(acc, out_ref.dtype)


def _residual_kernel(offsets, padr, rb, xpad_ref, bpad_ref, data_ref,
                     out_ref):
    i = pl.program_id(0)
    xblk = xpad_ref[pl.ds(i * rb, rb + 2 * padr), :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rb, LANES), 1)
    rolls = {}
    acc = _diag_sum(offsets, lambda d, off: data_ref[d] * _shifted(
        xblk, rolls, lane, padr, rb, off))
    out_ref[:] = jax.lax.convert_element_type(
        bpad_ref[pl.ds(i * rb, rb), :] - acc, out_ref.dtype)


@partial(jax.jit, static_argnames=("offsets", "padr", "rb", "interpret"))
def _spmv_call(offsets, padr, rb, interpret, xpad2, data2):
    nd, nrows, _ = data2.shape
    # trace with x64 off: BlockSpec index maps and in-kernel scalars must
    # be 32-bit for Mosaic even when the session enables jax_enable_x64
    with jax.enable_x64(False):
        return pl.pallas_call(
            partial(_spmv_kernel, offsets, padr, rb),
        grid=(nrows // rb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((nd, rb, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nrows, LANES), xpad2.dtype),
        interpret=interpret,
    )(xpad2, data2)


@partial(jax.jit, static_argnames=("offsets", "padr", "rb", "interpret"))
def _residual_call(offsets, padr, rb, interpret, xpad2, bpad2, data2):
    nd, nrows, _ = data2.shape
    with jax.enable_x64(False):
        return pl.pallas_call(
            partial(_residual_kernel, offsets, padr, rb),
        grid=(nrows // rb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((nd, rb, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nrows, LANES), xpad2.dtype),
        interpret=interpret,
    )(xpad2, bpad2, data2)


@jax.tree_util.register_pytree_node_class
class PDIA:
    """Pallas-backed DIA operator.

    data2d: (ndiags, nrows, 128) zero-padded diagonal planes,
    data2d[d, r, l] = A[i, i+offsets[d]] at i = r*128 + l.
    Duck-type compatible with sparse.dia.DIA on the solve path
    (matvec / residual / diagonal / astype / shape / nnz / dtype).
    """

    def __init__(self, offsets, data2d, shape, nnz, padr, rb,
                 interpret=False):
        self.offsets = tuple(int(o) for o in offsets)
        self.data2d = data2d
        self.shape = tuple(shape)
        self.nnz = int(nnz)
        self.padr = int(padr)
        self.rb = int(rb)
        self.interpret = bool(interpret)

    def tree_flatten(self):
        return ((self.data2d,), (self.offsets, self.shape, self.nnz,
                                 self.padr, self.rb, self.interpret))

    @classmethod
    def tree_unflatten(cls, aux, ch):
        (data2d,) = ch
        offsets, shape, nnz, padr, rb, interpret = aux
        return cls(offsets, data2d, shape, nnz, padr, rb, interpret)

    @property
    def dtype(self):
        return self.data2d.dtype

    @classmethod
    def from_dia(cls, A: DIA, interpret=False) -> "PDIA":
        n = A.shape[0]
        padr, rb, nrows = _plan(A.offsets, n,
                                item=jnp.dtype(A.data.dtype).itemsize)
        nd = len(A.offsets)
        data2d = jnp.pad(A.data, ((0, 0), (0, nrows * LANES - n))
                         ).reshape(nd, nrows, LANES)
        return cls(A.offsets, data2d, A.shape, A.nnz, padr, rb, interpret)

    @classmethod
    def from_host(cls, A: HostCSR, dtype=jnp.float32,
                  interpret=False) -> "PDIA":
        return cls.from_dia(DIA.from_host(A, dtype=dtype),
                            interpret=interpret)

    def to_dia(self) -> DIA:
        n = self.shape[0]
        nd = self.data2d.shape[0]
        data = self.data2d.reshape(nd, -1)[:, :n]
        return DIA(self.offsets, data, self.shape, self.nnz)

    def to_host(self) -> HostCSR:
        return self.to_dia().to_host()

    def _pad_x(self, x):
        n = self.shape[0]
        nrows = self.data2d.shape[1]
        p = self.padr * LANES
        return jnp.pad(x, (p, p + nrows * LANES - n)).reshape(-1, LANES)

    def matvec(self, x):
        n = self.shape[0]
        y2 = _spmv_call(self.offsets, self.padr, self.rb, self.interpret,
                        self._pad_x(x), self.data2d)
        return y2.reshape(-1)[:n]

    def residual(self, x, b):
        """b - A @ x, fused into the SpMV launch."""
        n = self.shape[0]
        nrows = self.data2d.shape[1]
        b2 = jnp.pad(b, (0, nrows * LANES - n)).reshape(-1, LANES)
        y2 = _residual_call(self.offsets, self.padr, self.rb,
                            self.interpret, self._pad_x(x), b2, self.data2d)
        return y2.reshape(-1)[:n]

    def __matmul__(self, x):
        return self.matvec(x)

    def diagonal(self):
        n = self.shape[0]
        if 0 in self.offsets:
            return self.data2d[self.offsets.index(0)].reshape(-1)[:n]
        return jnp.zeros(n, dtype=self.dtype)

    def astype(self, dtype):
        return PDIA(self.offsets, self.data2d.astype(dtype), self.shape,
                    self.nnz, self.padr, self.rb, self.interpret)


def blockinv_dia(blockinv, mask=None, dtype=None):
    """Block-diagonal inverse (ng, F, F) as a (2F-1)-offset host-side DIA
    data array — so the smoother's B^{-1} apply is itself one fused SpMV.

    out[g*F + fi] = sum_fj blockinv[g, fi, fj] * r[g*F + fj]
    => offset o = fj - fi with plane c_o[i] = blockinv[i//F, i%F, i%F + o].
    mask (n,) rows are zeroed (ghost slots).  Returns (offsets, data)."""
    bi = np.asarray(blockinv)
    ng, F, _ = bi.shape
    n = ng * F
    offsets = list(range(-(F - 1), F))
    data = np.zeros((len(offsets), n))
    fi = np.arange(n) % F
    g = np.arange(n) // F
    for d, o in enumerate(offsets):
        fj = fi + o
        ok = (fj >= 0) & (fj < F)
        data[d, ok] = bi[g[ok], fi[ok], fj[ok]]
    if mask is not None:
        data *= np.asarray(mask)[None, :]
    return offsets, data


def pallas_available():
    return HAS_PALLAS


def default_backend_is_tpu():
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# Fused Chebyshev smoother: an entire degree-k smoother sweep (k residuals,
# k block-inverse applies, all recurrence updates) in ONE kernel launch.
# ---------------------------------------------------------------------------
#
# Data plan: the iterate x (halo-padded), b, t = b - A@x and the Chebyshev
# direction d live fully in VMEM; the diagonal-value planes of A and of the
# block-inverse C stream from HBM block-by-block with double-buffered DMA.
# Per Chebyshev step: pass 1 computes t blockwise (x fixed), pass 2 applies
# C and updates d; x += d between steps is a whole-array VMEM op.  HBM
# traffic = degree * nnz(A) reads — the bandwidth lower bound — with zero
# intermediate launches (vs ~(3*ndiags + F^2) XLA ops per step).

def _cheb_coefs(lmax, lmin, degree, kind=1):
    """Coefficients of the degree-`degree` polynomial smoother recurrence

        d_1 = r_0 / theta;   d_k = a_k d_{k-1} + c_k r_{k-1};  x += d_k

    kind=1: classical first-kind Chebyshev on [lmin, lmax].
    kind=4: fourth-kind Chebyshev (Lottes, 'Optimal polynomial smoothers
    for multigrid', arXiv:2202.08830 family — see PAPERS.md): needs only
    the UPPER spectral bound (lmin ignored), damps the whole [0, lmax]
    band as a smoother should, and typically beats first-kind inside
    multigrid where the smoother must complement coarse correction
    rather than minimize the residual on a band."""
    if kind == 4:
        theta = 0.75 * lmax                       # d_1 = 4/(3 lmax) r_0
        coefs = []
        for k in range(1, degree):
            ak = (2.0 * k - 1.0) / (2.0 * k + 3.0)
            ck = (8.0 * k + 4.0) / ((2.0 * k + 3.0) * lmax)
            coefs.append((float(ak), float(ck)))
        return float(theta), tuple(coefs)
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma1 = theta / delta
    rho = 1.0 / sigma1
    coefs = []
    for _k in range(1, degree):
        rho_new = 1.0 / (2.0 * sigma1 - rho)
        coefs.append((float(rho_new * rho), float(2.0 * rho_new / delta)))
        rho = rho_new
    return float(theta), tuple(coefs)


def _cheb_kernel(offsA, offsC, p, rb, nblocks, degree, iters, theta, coefs,
                 want_r, x_ref, b_ref, dataA_ref, dataC_ref, *refs):
    if want_r:
        out_ref, r_ref, t_ref, d_ref, bufA, bufC, semA, semC = refs
    else:
        out_ref, t_ref, d_ref, bufA, bufC, semA, semC = refs
        r_ref = None
    nrows = nblocks * rb
    out_ref[:] = x_ref[:]
    t_ref[:] = jnp.zeros_like(t_ref)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rb, LANES), 1)

    def sweep(data_ref, buf, sem, src_ref, offs, write):
        # Fully unrolled over the (static) block count: every DMA index
        # and slice offset is a trace-time constant — no scalar loop
        # state at all, which both sidesteps Mosaic's 64-bit-scalar
        # restrictions under jax_enable_x64 and gives the scheduler
        # straight-line code to pipeline.
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

    for it in range(iters):
        for k in range(degree):
            if it or k:
                out_ref[p:p + nrows, :] = (out_ref[p:p + nrows, :]
                                           + d_ref[:])
            sweep(dataA_ref, bufA, semA, out_ref, offsA, w_t)
            if k == 0:
                def w_d(base, acc, s=1.0 / theta):
                    d_ref[pl.ds(base, rb), :] = s * acc
            else:
                def w_d(base, acc, ak=coefs[k - 1][0], ck=coefs[k - 1][1]):
                    d_ref[pl.ds(base, rb), :] = (
                        ak * d_ref[pl.ds(base, rb), :] + ck * acc)
            sweep(dataC_ref, bufC, semC, t_ref, offsC, w_d)
    out_ref[p:p + nrows, :] = out_ref[p:p + nrows, :] + d_ref[:]
    if want_r:
        # one more A-pass: r = b - A x_final fused into the same launch
        # (replaces the separate residual kernel of the V-cycle)
        def w_r(base, acc):
            r_ref[pl.ds(base, rb), :] = (
                b_ref[pl.ds(base, rb), :].astype(jnp.float32) - acc)
        sweep(dataA_ref, bufA, semA, out_ref, offsA, w_r)


@partial(jax.jit, static_argnames=("offsA", "offsC", "p", "rb", "degree",
                                   "iters", "theta", "coefs", "interpret",
                                   "want_r"))
def _cheb_call(offsA, offsC, p, rb, degree, iters, theta, coefs, interpret,
               xpad2, b2, dataA4, dataC4, want_r=False):
    nblocks, ndA = dataA4.shape[0], dataA4.shape[1]
    ndC = dataC4.shape[1]
    nrows = nblocks * rb
    kern = partial(_cheb_kernel, offsA, offsC, p, rb, nblocks, degree,
                   iters, theta, coefs, want_r)
    out_shape = jax.ShapeDtypeStruct((nrows + 2 * p, LANES), jnp.float32)
    out_specs = pl.BlockSpec(memory_space=pltpu.VMEM)
    if want_r:
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((nrows, LANES), jnp.float32))
        out_specs = (out_specs, pl.BlockSpec(memory_space=pltpu.VMEM))
    with jax.enable_x64(False):
        return pl.pallas_call(
            kern,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),   # x (halo)
                pl.BlockSpec(memory_space=pltpu.VMEM),   # b
                pl.BlockSpec(memory_space=pl.ANY),    # A planes (HBM)
                pl.BlockSpec(memory_space=pl.ANY),    # C planes (HBM)
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((nrows + 2 * p, LANES), jnp.float32),   # t
                pltpu.VMEM((nrows, LANES), jnp.float32),           # d
                pltpu.VMEM((2, ndA, rb, LANES), dataA4.dtype),     # bufA
                pltpu.VMEM((2, ndC, rb, LANES), dataC4.dtype),     # bufC
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(xpad2, b2, dataA4, dataC4)


def _pack_blocks(data, n, nrows, rb):
    """(nd, n) diagonal planes -> (nblocks, nd, rb, 128) contiguous DMA
    blocks (zero padded)."""
    nd = data.shape[0]
    d2 = jnp.pad(data, ((0, 0), (0, nrows * LANES - n)))
    d4 = d2.reshape(nd, nrows // rb, rb, LANES).transpose(1, 0, 2, 3)
    return d4


def fused_cheb_vmem_bytes(n, ndA, ndC, offsets, itemA=4, itemC=4):
    """Estimated VMEM need of the fused smoother at size n."""
    padr, rb, nrows = _plan(offsets, n, item=max(itemA, itemC))
    f32 = 4
    vec = (nrows + 2 * padr) * LANES * f32
    return (3 * vec                        # x, out, t
            + nrows * LANES * f32          # d
            + nrows * LANES * f32          # b
            + 2 * ndA * rb * LANES * itemA
            + 2 * ndC * rb * LANES * itemC)


@jax.tree_util.register_pytree_node_class
class FusedChebSmoother:
    """Chebyshev smoother whose whole degree-k sweep is one Pallas launch.

    A and C(=masked B^{-1}) are stored as pre-blocked diagonal planes
    (nblocks, nd, rb, 128).  Drop-in for BlockChebyshevSmoother on the
    grid/structured paths (the `A` argument of smooth() is ignored — the
    smoother carries its own operator planes).  Symmetric (reverse no-op),
    matching Chebyshev's self-adjointness in the B inner product."""

    def __init__(self, dataA4, offsA, dataC4, offsC, n, padr, rb,
                 lmax, lmin, degree=3, kind=1, interpret=False):
        self.dataA4 = dataA4
        self.dataC4 = dataC4
        self.offsA = tuple(int(o) for o in offsA)
        self.offsC = tuple(int(o) for o in offsC)
        self.n = int(n)
        self.padr = int(padr)
        self.rb = int(rb)
        self.lmax = lmax
        self.lmin = lmin
        self.degree = int(degree)
        self.kind = int(kind)
        self.interpret = bool(interpret)

    def tree_flatten(self):
        return ((self.dataA4, self.dataC4),
                (self.offsA, self.offsC, self.n, self.padr, self.rb,
                 self.lmax, self.lmin, self.degree, self.kind,
                 self.interpret))

    @classmethod
    def tree_unflatten(cls, aux, ch):
        dataA4, dataC4 = ch
        (offsA, offsC, n, padr, rb, lmax, lmin, degree, kind,
         interpret) = aux
        return cls(dataA4, offsA, dataC4, offsC, n, padr, rb, lmax, lmin,
                   degree, kind, interpret)

    @classmethod
    def build(cls, A_dia: DIA, C_dia: DIA, lmax, lmin, degree=3, kind=1,
              interpret=False):
        n = A_dia.shape[0]
        all_offs = tuple(A_dia.offsets) + tuple(C_dia.offsets)
        padr, rb, nrows = _plan(
            all_offs, n,
            item=max(jnp.dtype(A_dia.data.dtype).itemsize,
                     jnp.dtype(C_dia.data.dtype).itemsize))
        dataA4 = _pack_blocks(A_dia.data, n, nrows, rb)
        dataC4 = _pack_blocks(C_dia.data, n, nrows, rb)
        return cls(dataA4, A_dia.offsets, dataC4, C_dia.offsets, n,
                   padr, rb, lmax, lmin, degree, kind, interpret)

    def smooth(self, A, x, b, iters=1, reverse=False):
        del A, reverse
        n = self.n
        nrows = self.dataA4.shape[0] * self.rb
        p = self.padr * LANES
        xpad2 = jnp.pad(x, (p, p + nrows * LANES - n)).reshape(-1, LANES)
        b2 = jnp.pad(b, (0, nrows * LANES - n)).reshape(-1, LANES)
        theta, coefs = _cheb_coefs(self.lmax, self.lmin, self.degree,
                                   getattr(self, "kind", 1))
        y2 = _cheb_call(self.offsA, self.offsC, self.padr, self.rb,
                        self.degree, int(iters), theta, coefs,
                        self.interpret, xpad2, b2, self.dataA4, self.dataC4)
        return y2.reshape(-1)[p:p + n]

    def smooth_residual(self, A, x, b, iters=1):
        """(x_smoothed, b - A x_smoothed) in ONE launch — replaces the
        separate residual kernel of the V-cycle's restrict step."""
        del A
        n = self.n
        nrows = self.dataA4.shape[0] * self.rb
        p = self.padr * LANES
        xpad2 = jnp.pad(x, (p, p + nrows * LANES - n)).reshape(-1, LANES)
        b2 = jnp.pad(b, (0, nrows * LANES - n)).reshape(-1, LANES)
        theta, coefs = _cheb_coefs(self.lmax, self.lmin, self.degree,
                                   getattr(self, "kind", 1))
        y2, r2 = _cheb_call(self.offsA, self.offsC, self.padr, self.rb,
                            self.degree, int(iters), theta, coefs,
                            self.interpret, xpad2, b2, self.dataA4,
                            self.dataC4, want_r=True)
        return y2.reshape(-1)[p:p + n], r2.reshape(-1)[:n]
