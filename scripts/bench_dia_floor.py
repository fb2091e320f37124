"""Microbenchmark: where is the fused-DIA per-pass floor?

CLAUDE.md "Still open": the SpMV/Chebyshev pass floor sits ~2-3x above
pure-FMA, attributed to per-diagonal VPU shuffles (misaligned sublane
slices / lane rolls).  This isolates the shuffle cost by timing the SAME
kernel plan (identical padr / rb / diagonal count / bytes streamed) over
offset sets that differ ONLY in shift class:

  free     every offset = q*1024 (q*8 sublanes, lane shift 0): both row
           slices land on vreg boundaries — zero shuffle work, the
           pure load+FMA ceiling of this kernel structure.
  rowmis   offsets = q*128 with q NOT 8-aligned (lane shift 0,
           misaligned row base): per-diagonal sublane-shuffle slices.
  lane     offsets with distinct lane shifts s=1..4 (shared lane rolls
           + borrow blend, aligned q): the "aligned" variant's cost for
           lane-shifted diagonals.
  real     the n=512 bidomain 17-diagonal stencil offsets (row stride
           1026 = 8*128 + 2: mixed lane shifts + misaligned rows).

K matvecs run INSIDE one jitted fori_loop so the remote-runtime launch
cost (~ms/dispatch over the tunnel) amortizes away; wall time is
bracketed by a value fetch (CLAUDE.md hazard 2).  The conclusion feeds
docs/PERF_NOTES.md: if `real ~ free`, the floor is NOT shuffles; if
`free` itself sits at the observed Gnnz/s, the floor is memory traffic
/ kernel structure and the aligned-q layout lever is dead.

  python scripts/bench_dia_floor.py [n_rows_of_128] [K]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import tpuamg
tpuamg.enable_compilation_cache()

from tpuamg.sparse.dia_pallas import PDIA, LANES, _plan

ND = 17            # diagonal count of the n=512 bidomain flagship
STRIDE = 1026      # its flattened row stride (513 points x 2 fields)


def offset_sets():
    real = [0]
    for d in (1, STRIDE - 1, STRIDE, STRIDE + 1, 2, STRIDE - 2,
              STRIDE + 2, 2 * STRIDE):
        real += [d, -d]
    k = ND // 2
    return {
        "free": [i * 1024 for i in range(-k, k + 1)],
        "rowmis": [i * 128 + (0 if i % 8 == 0 and i else 0)
                   for i in range(-k, k + 1)],
        "lane": sorted([0] + [i * 1024 + s for s in (1, 2, 3, 4)
                              for i in (-1, 1)]
                       + [i * 2048 + s for s in (1, 2, 3, 4)
                          for i in (-1, 1)]),
        "real": sorted(real[:ND]),
    }


def bench(offs, n, K, padr, rb, nrows, rng):
    nd = len(offs)
    data = np.zeros((nd, nrows * LANES), np.float32)
    data[:, :n] = rng.standard_normal((nd, n)) / (nd * 0.9)
    A = PDIA(tuple(offs), jnp.asarray(data.reshape(nd, nrows, LANES)),
             (n, n), nnz=nd * n, padr=padr, rb=rb)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)

    @jax.jit
    def chain(A, x):
        return lax.fori_loop(0, K, lambda i, v: A.matvec(v), x)

    y = chain(A, x)
    float(y[0])                       # compile + sync
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        y = chain(A, x)
        float(y[0])                   # true completion barrier
        best = min(best, (time.time() - t0) / K)
    return best


def main():
    nrows_arg = int(sys.argv[1]) if len(sys.argv) > 1 else 4104
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    n = nrows_arg * LANES
    rng = np.random.default_rng(0)
    sets = offset_sets()
    # ONE shared plan sized for the widest offset set: identical VMEM
    # blocking and padding across variants
    allofs = [o for offs in sets.values() for o in offs]
    padr, rb, nrows = _plan(allofs, n)
    dev = jax.devices()[0].platform
    bytes_pass = (ND * n + 2 * n) * 4
    print(f"# device={dev} n={n} ({ND} diagonals, f32) K={K} "
          f"padr={padr} rb={rb} bytes/pass={bytes_pass/1e6:.1f} MB",
          flush=True)
    print("variant us_per_matvec Gnnz_s GB_s", flush=True)
    for name, offs in sets.items():
        assert len(offs) == ND, (name, len(offs))
        dt = bench(offs, n, K, padr, rb, nrows, rng)
        print(f"{name} {dt*1e6:.1f} {ND*n/dt/1e9:.2f} "
              f"{bytes_pass/dt/1e9:.1f}", flush=True)
    # the real stencil at its OWN plan (what production runs), plus
    # diagonal-count scaling at that plan: if time ~ nd, the pass is
    # plane-streaming-bound (memory); a flat tail = fixed per-pass cost
    for nd_s in (ND, 9, 5, 1):
        offs = sorted(sets["real"], key=abs)[:nd_s]
        p2, rb2, nr2 = _plan(offs, n)
        dt = bench(offs, n, K, p2, rb2, nr2, rng)
        bp = (nd_s * n + 2 * n) * 4
        print(f"real_own_nd{nd_s} {dt*1e6:.1f} {nd_s*n/dt/1e9:.2f} "
              f"{bp/dt/1e9:.1f} (padr={p2} rb={rb2})", flush=True)


if __name__ == "__main__":
    main()
