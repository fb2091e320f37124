"""TPU validation + timing for the fused Pallas DIA SpMV (PDIA).

Run with the plain environment (TPU tunnel active), single process:
    timeout 1800 python scripts/tpu_pallas_check.py

Measures per-matvec time by chaining REPS matvecs in one jitted scan and
synchronizing via value fetches (block_until_ready is not a barrier on
the axon runtime — docs/PERF_NOTES.md).
"""
import time
import numpy as np

import tpuamg
tpuamg.enable_compilation_cache()

import jax
jax.config.update("jax_enable_x64", True)   # match bench.py conditions
import jax.numpy as jnp

from tpuamg.sparse import HostCSR
from tpuamg.sparse.dia import DIA
from tpuamg.sparse.dia_pallas import PDIA

REPS = 100


def random_dia(n, offsets, seed=0):
    rng = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    for o in offsets:
        r = np.arange(max(0, -o), min(n, n - o))
        rows.append(r)
        cols.append(r + o)
        vals.append(rng.standard_normal(len(r)))
    return HostCSR.from_coo(np.concatenate(rows), np.concatenate(cols),
                            np.concatenate(vals), (n, n))


@jax.jit
def chain(op, x):
    def body(c, _):
        return op(c), None
    y, _ = jax.lax.scan(body, x, None, length=REPS)
    return y


def bench(op, x, label):
    y = chain(op, x)
    float(y[0])                      # warm + sync
    t0 = time.time()
    y = chain(op, x)
    float(y[0])
    dt = (time.time() - t0) / REPS
    print(f"{label}: {dt*1e6:9.1f} us/matvec")
    return dt


def main():
    print("backend:", jax.default_backend())
    # bidomain-2D-like stencil at n=512: 17 offsets over 2 fields
    nx = 513
    offs = []
    for base in (-2 * nx, -2 * nx + 2, -2, 0, 2, 2 * nx - 2, 2 * nx):
        offs += [base]
    offs = sorted(set(offs + [o + 1 for o in offs] + [o - 1 for o in offs]))
    n = 2 * nx * nx
    A = random_dia(n, offs)
    print(f"n={n}, ndiags={len(offs)}")
    x = jnp.asarray(np.random.default_rng(1).standard_normal(n),
                    dtype=jnp.float32)

    D = DIA.from_host(A)
    P = PDIA.from_dia(D)

    # correctness first
    y_ref = np.asarray(D.matvec(x))
    y_pal = np.asarray(P.matvec(x))
    err = np.linalg.norm(y_pal - y_ref) / np.linalg.norm(y_ref)
    print(f"matvec rel err vs XLA DIA: {err:.2e}")
    assert err < 1e-5, "PallasDIA mismatch"

    b = jnp.asarray(np.random.default_rng(2).standard_normal(n),
                    dtype=jnp.float32)
    r_ref = np.asarray(b) - y_ref
    r_pal = np.asarray(P.residual(x, b))
    err_r = np.linalg.norm(r_pal - r_ref) / np.linalg.norm(r_ref)
    print(f"residual rel err: {err_r:.2e}")
    assert err_r < 1e-5

    import jax.tree_util as jtu
    t_x = bench(jtu.Partial(lambda M, v: M.matvec(v), D), x, "XLA DIA   ")
    t_p = bench(jtu.Partial(lambda M, v: M.matvec(v), P), x, "Pallas DIA")
    print(f"speedup: {t_x / t_p:.1f}x")

    # bf16 storage variant
    Pb = PDIA.from_dia(D.astype(jnp.bfloat16))
    y_b = np.asarray(Pb.matvec(x))
    err_b = np.linalg.norm(y_b - y_ref) / np.linalg.norm(y_ref)
    print(f"bf16-storage rel err: {err_b:.2e}")
    bench(jtu.Partial(lambda M, v: M.matvec(v), Pb), x, "Pallas bf16")




def check_fused_smoother():
    """Mosaic acceptance + timing of the one-launch Chebyshev smoother."""
    import jax.tree_util as jtu
    from tpuamg.sparse.dia_pallas import (FusedChebSmoother, blockinv_dia,
                                          PDIA)
    from tpuamg.amg.structured import DiaChebyshevSmoother

    nx = 513
    offs = []
    for base in (-2 * nx, -2 * nx + 2, -2, 0, 2, 2 * nx - 2, 2 * nx):
        offs += [base]
    offs = sorted(set(offs + [o + 1 for o in offs] + [o - 1 for o in offs]))
    n = 2 * nx * nx
    A = random_dia(n, offs, seed=10)
    # SPD-ish block inverse (random 2x2 with dominant diagonal)
    rng = np.random.default_rng(11)
    ng = n // 2
    bi = rng.standard_normal((ng, 2, 2)) * 0.1
    bi[:, 0, 0] += 1.0
    bi[:, 1, 1] += 1.0
    coffs, cdata = blockinv_dia(bi, np.ones(n))

    from tpuamg.sparse.dia import DIA
    D = DIA.from_host(A)
    C = DIA(coffs, jnp.asarray(cdata, jnp.float32), (n, n))
    lmax, lmin = 1.9, 0.24
    fus = FusedChebSmoother.build(D, C, lmax, lmin, degree=4)
    ref = DiaChebyshevSmoother(PDIA.from_dia(C), lmax, lmin, degree=4)
    Dp = PDIA.from_dia(D)

    x0 = jnp.asarray(np.random.default_rng(12).standard_normal(n),
                     jnp.float32)
    b = jnp.asarray(np.random.default_rng(13).standard_normal(n),
                    jnp.float32)
    y_ref = np.asarray(ref.smooth(Dp, x0, b, 1))
    y_fus = np.asarray(fus.smooth(None, x0, b, 1))
    err = np.linalg.norm(y_fus - y_ref) / np.linalg.norm(y_ref)
    print(f"fused cheb smoother rel err: {err:.2e}")
    assert err < 1e-4

    t_ref = bench(jtu.Partial(
        lambda s, M, bb, v: s.smooth(M, v, bb, 1), ref, Dp, b),
        x0, "launch-per-op smooth")
    t_fus = bench(jtu.Partial(
        lambda s, bb, v: s.smooth(None, v, bb, 1), fus, b),
        x0, "fused smooth       ")
    print(f"smoother speedup: {t_ref / t_fus:.1f}x")


if __name__ == "__main__":
    main()
    check_fused_smoother()
