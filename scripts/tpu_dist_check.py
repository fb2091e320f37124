"""TPU Mosaic validation of the sharded distributed-path kernels
(dist/pallas_dist.py).

The CI suite runs these kernels in interpret mode on an 8-device virtual
CPU mesh (tests/test_dist_pallas.py); this script compiles the SAME
kernels with Mosaic on the real single chip (1-device mesh — the
ppermute halo exchange degenerates to zero edge halos, exercising the
full kernel + shard_map wrapping), comparing against interpret mode.

Run with the plain environment (TPU tunnel active), single process:
    PYTHONPATH=.:/root/.axon_site timeout 1800 python scripts/tpu_dist_check.py
"""
import time
import numpy as np

import tpuamg
tpuamg.enable_compilation_cache()

import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from tpuamg.sparse.dia import DIA
from tpuamg.dist.sharding import device_mesh
from tpuamg.dist.pallas_dist import ShardedPDIA, ShardedChebSmoother


def banded(n, offsets, seed=0, dd=4.0):
    rng = np.random.default_rng(seed)
    data = np.zeros((len(offsets), n))
    for d, off in enumerate(offsets):
        lo, hi = max(0, -off), min(n, n - off)
        data[d, lo:hi] = rng.standard_normal(hi - lo) * 0.1
    data[offsets.index(0), :] += dd
    return DIA(offsets, jnp.asarray(data, dtype=jnp.float32), (n, n))


def main():
    print("backend:", jax.default_backend(), flush=True)
    mesh = device_mesh(1)
    ndev = 1
    n = 128 * 8 * ndev * 16     # 16384
    offsets = [-130, -128, -3, -1, 0, 1, 3, 128, 130]
    A = banded(n, offsets)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
    b = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)

    t0 = time.time()
    As_m = ShardedPDIA.from_dia(A, mesh, interpret=False)
    As_i = ShardedPDIA.from_dia(A, mesh, interpret=True)
    ym = np.asarray(As_m.matvec(x))
    print(f"spmv mosaic compile+run: {time.time()-t0:.1f}s", flush=True)
    yi = np.asarray(As_i.matvec(x))
    err = np.linalg.norm(ym - yi) / np.linalg.norm(yi)
    print(f"sharded spmv  mosaic vs interpret: {err:.2e}", flush=True)
    assert err < 1e-5, err
    rm = np.asarray(As_m.residual(x, b))
    ri = np.asarray(As_i.residual(x, b))
    err = np.linalg.norm(rm - ri) / np.linalg.norm(ri)
    print(f"sharded resid mosaic vs interpret: {err:.2e}", flush=True)
    assert err < 1e-5, err

    F = 2
    blockinv = np.linalg.inv(
        rng.standard_normal((n // F, F, F)) * 0.1 + 2 * np.eye(F))
    mask = np.ones(n)
    t0 = time.time()
    sm_m = ShardedChebSmoother.build(A, blockinv, mask, 2.5, 0.3, 3, mesh,
                                     interpret=False)
    sm_i = ShardedChebSmoother.build(A, blockinv, mask, 2.5, 0.3, 3, mesh,
                                     interpret=True)
    xm = np.asarray(sm_m.smooth(None, x, b, iters=1))
    print(f"cheb mosaic compile+run: {time.time()-t0:.1f}s", flush=True)
    xi = np.asarray(sm_i.smooth(None, x, b, iters=1))
    err = np.linalg.norm(xm - xi) / np.linalg.norm(xi)
    print(f"sharded cheb  mosaic vs interpret: {err:.2e}", flush=True)
    assert err < 1e-5, err
    xm2, rm2 = sm_m.smooth_residual(None, x, b, iters=1)
    xi2, ri2 = sm_i.smooth_residual(None, x, b, iters=1)
    err = max(
        np.linalg.norm(np.asarray(xm2) - np.asarray(xi2))
        / np.linalg.norm(np.asarray(xi2)),
        np.linalg.norm(np.asarray(rm2) - np.asarray(ri2))
        / np.linalg.norm(np.asarray(ri2)))
    print(f"sharded cheb+r mosaic vs interpret: {err:.2e}", flush=True)
    assert err < 1e-5, err
    print("OK", flush=True)


if __name__ == "__main__":
    main()
