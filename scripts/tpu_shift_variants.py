"""Microbenchmark: shift-decomposition variants for the DIA SpMV kernel.

Question: what sets the ~105us/pass floor (vs ~45us bandwidth-bound)?
Variants:
  A. current: misaligned sublane slice per diagonal (slice_in_dim)
  B. axis-0 pltpu.roll + aligned [0:rb] slice
  C. variant A with rb=256 / rb=512 (fewer grid steps)
Run single-process on TPU:  python scripts/tpu_shift_variants.py
"""
import time
from functools import partial

import numpy as np

import tpuamg
tpuamg.enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
REPS = 100


def kernel(offsets, padr, rb, variant, xpad_ref, data_ref, out_ref):
    i = pl.program_id(0)
    xblk = xpad_ref[pl.ds(i * rb, rb + 2 * padr), :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rb, LANES), 1)
    rolls = {}
    acc = None
    for d, off in enumerate(offsets):
        q, s = divmod(int(off), LANES)
        if s not in rolls:
            rolls[s] = pltpu.roll(xblk, jnp.int32(LANES - s), axis=1) \
                if s else xblk
        rs = rolls[s]
        if variant == "slice":
            a = jax.lax.slice_in_dim(rs, padr + q, padr + q + rb, axis=0)
            if s:
                b = jax.lax.slice_in_dim(rs, padr + q + 1,
                                         padr + q + 1 + rb, axis=0)
                sh = jnp.where(lane < LANES - s, a, b)
            else:
                sh = a
        else:  # roll variant (axis-0 roll must be non-negative)
            nrtot = rb + 2 * padr
            ra = pltpu.roll(rs, jnp.int32((nrtot - padr - q) % nrtot),
                            axis=0)
            a = jax.lax.slice_in_dim(ra, 0, rb, axis=0)
            if s:
                rb2 = pltpu.roll(
                    rs, jnp.int32((nrtot - padr - q - 1) % nrtot), axis=0)
                b = jax.lax.slice_in_dim(rb2, 0, rb, axis=0)
                sh = jnp.where(lane < LANES - s, a, b)
            else:
                sh = a
        t = data_ref[d] * sh
        acc = t if acc is None else acc + t
    out_ref[:] = acc


@partial(jax.jit, static_argnames=("offsets", "padr", "rb", "variant"))
def call(offsets, padr, rb, variant, xpad2, data2):
    nd, nrows, _ = data2.shape
    with jax.enable_x64(False):
        return pl.pallas_call(
            partial(kernel, offsets, padr, rb, variant),
            grid=(nrows // rb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((nd, rb, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rb, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nrows, LANES), jnp.float32),
            interpret=False,
        )(xpad2, data2)


@partial(jax.jit, static_argnames=("offsets", "padr", "rb", "variant"))
def chain(offsets, padr, rb, variant, xpad2, data2):
    def body(c, _):
        y = call(offsets, padr, rb, variant, c, data2)
        # re-embed output as next input (keep shapes static)
        c2 = jax.lax.dynamic_update_slice(c, y, (padr, 0))
        return c2, None
    c, _ = jax.lax.scan(body, xpad2, None, length=REPS)
    return c


def run(offsets, n, variant, rbmax):
    maxabs = max(abs(o) for o in offsets)
    padr = -(-(maxabs // LANES + 1) // 8) * 8
    r0 = -(-n // LANES)
    rb = min(rbmax, -(-r0 // 32) * 32)
    nrows = -(-r0 // rb) * rb
    nd = len(offsets)
    rng = np.random.default_rng(0)
    data2 = jnp.asarray(rng.standard_normal((nd, nrows, LANES)),
                        jnp.float32)
    xpad2 = jnp.asarray(rng.standard_normal((nrows + 2 * padr, LANES)),
                        jnp.float32)
    c = chain(tuple(offsets), padr, rb, variant, xpad2, data2)
    float(c[padr, 0])
    t0 = time.time()
    c = chain(tuple(offsets), padr, rb, variant, xpad2, data2)
    float(c[padr, 0])
    dt = (time.time() - t0) / REPS
    gb = nd * nrows * LANES * 4 / 1e9
    print(f"{variant:6s} rb={rb:4d}: {dt*1e6:8.1f} us/pass "
          f"({gb/dt:.0f} GB/s effective)", flush=True)
    return dt


def main():
    print("backend:", jax.default_backend())
    nx = 513
    offs = []
    for base in (-2 * nx, -2 * nx + 2, -2, 0, 2, 2 * nx - 2, 2 * nx):
        offs += [base - 1, base, base + 1]
    offs = sorted(set(offs))
    n = 2 * nx * nx
    print(f"n={n}, ndiags={len(offs)}")
    run(offs, n, "slice", 128)
    run(offs, n, "roll", 128)
    run(offs, n, "slice", 256)
    run(offs, n, "slice", 512)
    run(offs, n, "roll", 512)


if __name__ == "__main__":
    main()
