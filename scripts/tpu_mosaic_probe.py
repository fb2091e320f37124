"""Mosaic feature probe for the fused whole-V-cycle kernel design.

Tests whether Mosaic (Pallas TPU) accepts the value-level ops the
in-kernel grid transfers need:

  P1  leading-dim reshape + slice-add:  (R,128) -> (R/2K, 2K, 128),
      y[:, :K] + y[:, K:]  (y-direction restriction = grid-row pair add)
  P2  in-kernel matmul (m,128) @ (128,128) on the MXU
      (x-direction restriction/prolongation as static 0/1 weight matmuls)
  P3  row interleave: (m, K,128) x2 -> (2m*K, 128)
      (y-direction prolongation = repeat grid rows)
  P4  chunk extraction from a (m*K,128) value: reshape -> [:, q, :]

Run: timeout 1800 python scripts/tpu_mosaic_probe.py   (plain env, TPU)
"""
import numpy as np

import tpuamg
tpuamg.enable_compilation_cache()

import jax
import jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, K = 32, 4          # R flat rows, K chunks per grid row -> 8 grid rows
LANES = 128


def check(name, got, want, atol=1e-5):
    ok = np.allclose(np.asarray(got), want, atol=atol)
    print(f"{name}: {'OK' if ok else 'MISMATCH'}"
          f"  (max err {np.abs(np.asarray(got) - want).max():.2e})")
    return ok


def p1_kernel(K, x_ref, o_ref):
    v = x_ref[:]                                   # (R,128)
    g = v.reshape(v.shape[0] // (2 * K), 2 * K, LANES)
    o_ref[:] = (g[:, :K, :] + g[:, K:, :]).reshape(-1, LANES)


def p2_kernel(x_ref, w_ref, o_ref):
    o_ref[:] = jnp.dot(x_ref[:], w_ref[:],
                       preferred_element_type=jnp.float32)


def p2h_kernel(x_ref, w_ref, o_ref):
    o_ref[:] = jax.lax.dot(x_ref[:], w_ref[:],
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)


def p5_kernel(K, x_ref, o_ref):
    v = x_ref[:]                                   # (R,128)
    g = v.reshape(-1, K, LANES)                    # (R/K, K, 128)
    o_ref[:] = jnp.pad(g, ((0, 0), (0, 1), (0, 0))).reshape(-1, LANES)


def p7a_kernel(x_ref, o_ref):
    # flatten sublanes into lanes: (R,128) -> (1, R*128)
    o_ref[:] = x_ref[:].reshape(1, -1)


def p7b_kernel(x_ref, o_ref):
    # widen lanes into sublanes: (1, R*128) -> (R, 128)
    o_ref[:] = x_ref[:].reshape(-1, LANES)


def p8_kernel(x_ref, t_ref, o_ref):
    # coarse dense solve row: z[R] = b_flat @ T_R with b flattened in-kernel
    bflat = x_ref[:].reshape(1, -1)
    for Rr in range(o_ref.shape[0]):
        o_ref[Rr:Rr + 1, :] = jax.lax.dot(
            bflat, t_ref[Rr], precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)


def p3_kernel(K, x_ref, o_ref):
    v = x_ref[:]                                   # (R,128): R/K grid rows
    g = v.reshape(v.shape[0] // K, 1, K, LANES)
    o_ref[:] = jnp.concatenate([g, g], axis=1).reshape(-1, LANES)


def p4_kernel(K, q, x_ref, o_ref):
    v = x_ref[:].reshape(-1, K, LANES)
    o_ref[:] = v[:, q, :]


def run(kern, out_rows, *args):
    with jax.enable_x64(False):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((out_rows, LANES), jnp.float32),
        )(*args)


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    x = rng.standard_normal((R, LANES)).astype(np.float32)
    w = rng.standard_normal((LANES, LANES)).astype(np.float32)
    xd, wd = jnp.asarray(x), jnp.asarray(w)

    g = x.reshape(R // (2 * K), 2 * K, LANES)
    want1 = (g[:, :K] + g[:, K:]).reshape(-1, LANES)
    check("P1 rowpair-add ", run(partial(p1_kernel, K), R // 2, xd), want1)

    def attempt(name, fn):
        try:
            fn()
        except Exception as e:
            print(f"{name}: FAIL ({type(e).__name__}: {str(e)[:120]})")

    attempt("P2 mxu matmul  ", lambda: check(
        "P2 mxu matmul  ", run(p2_kernel, R, xd, wd), x @ w, atol=1e-3))
    attempt("P2h highest    ", lambda: check(
        "P2h highest    ", run(p2h_kernel, R, xd, wd), x @ w, atol=1e-4))

    g5 = x.reshape(-1, K, LANES)
    want5 = np.pad(g5, ((0, 0), (0, 1), (0, 0))).reshape(-1, LANES)
    attempt("P5 zero-pad    ", lambda: check(
        "P5 zero-pad    ", run(partial(p5_kernel, K), R + R // K, xd),
        want5))

    def run7a():
        with jax.enable_x64(False):
            out = pl.pallas_call(p7a_kernel, out_shape=jax.ShapeDtypeStruct(
                (1, R * LANES), jnp.float32))(xd)
        check("P7a flatten    ", out, x.reshape(1, -1))
    attempt("P7a flatten    ", run7a)

    xw = jnp.asarray(x[:8].reshape(1, -1))           # (1, 1024)
    attempt("P7b widen      ", lambda: check(
        "P7b widen      ", run(p7b_kernel, 8, xw), x[:8]))

    # P8 sized to fit VMEM: 8 coarse rows, 8*128-dof system
    x8 = x[:8]
    t8 = rng.standard_normal((8, 8 * LANES, LANES)).astype(np.float32)
    want8 = np.stack([x8.reshape(-1) @ t8[Rr] for Rr in range(8)])
    attempt("P8 coarse solve", lambda: check(
        "P8 coarse solve", run(p8_kernel, 8, jnp.asarray(x8),
                               jnp.asarray(t8)), want8,
        atol=1e-3 * np.abs(want8).max()))

    gg = x.reshape(R // K, 1, K, LANES)
    want3 = np.concatenate([gg, gg], 1).reshape(-1, LANES)
    check("P3 interleave  ", run(partial(p3_kernel, K), 2 * R, xd), want3)

    want4 = x.reshape(-1, K, LANES)[:, 1, :]
    check("P4 chunk slice ", run(partial(p4_kernel, K, 1), R // K, xd),
          want4)


if __name__ == "__main__":
    main()
