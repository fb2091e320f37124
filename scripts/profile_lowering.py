"""Profile jax lowering time of the hybrid-tail PCG program (CPU).

The TPU solve at mesh_n=8 spends 30+ minutes inside
mlir._cached_lowering / core.__eq__ BEFORE any backend compile
(faulthandler stack, docs/PERF_NOTES.md round 3).  Lowering is
platform-independent Python — reproduce and profile it on CPU.

  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python scripts/profile_lowering.py [chunk]
"""
import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import resource
resource.setrlimit(resource.RLIMIT_STACK,
                   (resource.RLIM_INFINITY, resource.RLIM_INFINITY))

import numpy as np
import jax
import jax.numpy as jnp
jax.config.update("jax_enable_x64", True)

from dataclasses import replace
from tpuamg.io_utils import load_system, dat_to_amg_parameters
from tpuamg.amg.structured import setup_structured, structured_system
from tpuamg.amg.hierarchy import as_operator
from tpuamg.sparse.dia import dia_matvec_op
from tpuamg.krylov.cg import _pcg_scan_chunk, _pcg_init

DATA = os.path.join("results", "scale_3d1d", "data_n8_g1e8")


def main():
    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    amg_params, _cfg = dat_to_amg_parameters(
        "tpuamg/problems/input_metric.dat")
    prm = replace(amg_params, dtype="float32", gs_max_colors=6)
    A, b, idofs, idofs3d, coords = load_system(DATA, with_coords=True)
    dtype = jnp.float32
    t0 = time.time()
    prec, slots, nsl = setup_structured(
        A, coords, prm, dtype=dtype, pallas=False,
        idofs=np.asarray(idofs), order="auto", algebraic_below=60000)
    Aop = dia_matvec_op(structured_system(
        A, slots, nsl, dtype=dtype, pallas=False,
        idofs=np.asarray(idofs)))
    M = as_operator(prec)
    bj = jnp.zeros(nsl, dtype=dtype).at[jnp.asarray(slots)].set(
        jnp.asarray(b, dtype=dtype))
    print(f"setup {time.time()-t0:.1f}s nsl={nsl}", flush=True)

    t0 = time.time()
    traced = _pcg_scan_chunk.trace(Aop, M, bj, bj, bj, bj,
                                   jnp.float32(1.0), chunk=chunk)
    print(f"trace {time.time()-t0:.1f}s", flush=True)
    pr = cProfile.Profile()
    t0 = time.time()
    pr.enable()
    low = traced.lower()
    pr.disable()
    print(f"lower {time.time()-t0:.1f}s", flush=True)
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
    print(s.getvalue())
    t0 = time.time()
    low.compile()
    print(f"backend compile {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
