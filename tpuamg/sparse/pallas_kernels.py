"""Pallas TPU kernels for the hot sparse ops.

`dia_spmv_pallas`: fused multi-diagonal SpMV.  The XLA fallback emits one
dynamic-slice + FMA pair per diagonal (~2*ndiags ops); this kernel streams
the diagonal-value planes block-by-block through VMEM while the (padded)
x vector sits entirely in VMEM, accumulating all diagonals in one pass —
one kernel launch, VMEM-bandwidth bound.

Usable when (n + 2*pad) f32 fits comfortably in VMEM (~2M rows); callers
fall back to the XLA slice loop otherwise (DIA.matvec).

STATUS: experimental. Mosaic currently rejects misaligned 1-D vector loads
("cannot statically prove that index ... is a multiple of 1024") for
arbitrary diagonal offsets; until slices go through DMA or a 2-D
(row, lane) shift decomposition, the XLA dynamic-slice path in DIA.matvec
(0.8 s compile, bandwidth-class runtime when the operator is passed as an
argument, never a closure constant) remains the production kernel.
dia_spmv_pallas works for offsets that are multiples of the 1024-element
alignment and is exercised that way in tests.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False


def _dia_kernel(offsets, pad, block, xpad_ref, data_ref, out_ref):
    i = pl.program_id(0)
    base = i * block
    acc = data_ref[0, :] * xpad_ref[pl.ds(base + pad + offsets[0], block)]
    for d in range(1, len(offsets)):
        seg = xpad_ref[pl.ds(base + pad + offsets[d], block)]
        acc = acc + data_ref[d, :] * seg
    out_ref[:] = acc


@partial(jax.jit, static_argnames=("offsets", "n", "block"))
def _dia_spmv_call(offsets, n, block, xpad, data_padded):
    nblocks = n // block
    pad = (len(xpad) - n) // 2
    kernel = partial(_dia_kernel, offsets, pad, block)
    return pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),          # full xpad
            pl.BlockSpec((len(offsets), block),
                         lambda i: (0, i),
                         memory_space=pltpu.VMEM),          # data block
        ],
        out_specs=pl.BlockSpec((block,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n,), xpad.dtype),
    )(xpad, data_padded)


def dia_spmv_pallas(A, x, block=8192):
    """y = A @ x for a DIA matrix via the fused Pallas kernel.

    Pads n up to a block multiple and x by max|offset| on both sides."""
    n = A.shape[0]
    offsets = A.offsets
    pad = max((abs(o) for o in offsets), default=0)
    n2 = ((n + block - 1) // block) * block
    data = A.data
    if n2 != n:
        data = jnp.pad(data, ((0, 0), (0, n2 - n)))
    xpad = jnp.pad(x, (pad, pad + (n2 - n)))
    y = _dia_spmv_call(tuple(offsets), n2, block, xpad, data)
    return y[:n]
