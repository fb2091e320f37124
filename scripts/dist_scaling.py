"""Virtual-device scaling table for the distributed grid path.

For ndev in {1, 2, 4, 8} (virtual CPU devices via
xla_force_host_platform_device_count) runs the sharded-Pallas
(interpret-mode on CPU) distributed bidomain solve and records
iteration counts (must be device-count INVARIANT — the sharded kernels
are exact), per-iteration wall time, and exact-kernel level coverage.

Wall times on the virtual mesh share 2 physical cores, so the time
column measures overhead trends, not real ICI scaling — the
iteration-invariance and full Pallas coverage columns are the
correctness claims (VERDICT round-1 item 9).

Each ndev runs in a fresh subprocess (device count is process-global).

  python scripts/dist_scaling.py [n] [outfile]
"""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

CHILD = r"""
import os, sys, time, resource
resource.setrlimit(resource.RLIMIT_STACK,
                   (resource.RLIM_INFINITY, resource.RLIM_INFINITY))
sys.path.insert(0, %(root)r)
import numpy as np, jax
jax.config.update("jax_enable_x64", True)
import tpuamg
tpuamg.enable_compilation_cache()
from tpuamg.fem import mms
from tpuamg.problems.bidomain import Params, get_mesh, get_system
from tpuamg.dist.solve import distributed_grid_solve
n = %(n)d
p = Params(2.0, 3.0, 1e6)
data = mms.setup_bidomain_mms(p, dim=2)
mesh = get_mesh(n, 2)
A, b, sizes, _ = get_system(mesh, data, p)
t0 = time.time()
res, dmesh = distributed_grid_solve(A, b, (n + 1, n + 1), F=2,
                                    tol=1e-8, maxiter=120,
                                    pallas="interpret")
t_total = time.time() - t0
# warm rerun for per-iteration time without compile
t0 = time.time()
res2, _ = distributed_grid_solve(A, b, (n + 1, n + 1), F=2,
                                 tol=1e-8, maxiter=120,
                                 pallas="interpret")
t_warm = time.time() - t0
info = res.dist_info
print("ROW", info["ndev"], res.niters, res2.niters,
      f"{t_warm / max(res2.niters, 1):.4f}",
      info["pallas_levels"], info["sharded_levels"],
      int(info["outer_pallas"]), info["nflat"], flush=True)
assert res.converged
"""


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        ROOT, "docs", "sample_results", "dist_scaling.txt")
    rows = []
    for ndev in (1, 2, 4, 8):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                            f" --xla_force_host_platform_device_count"
                            f"={ndev}")
        r = subprocess.run([sys.executable, "-c",
                            CHILD % {"root": ROOT, "n": n}],
                           env=env, capture_output=True, text=True,
                           cwd=ROOT)
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("ROW")]
        if not line:
            print(f"ndev={ndev} FAILED:\n{r.stdout}\n{r.stderr[-2000:]}")
            sys.exit(1)
        rows.append(line[0].split()[1:])
        print("ndev", rows[-1], flush=True)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write(f"# distributed grid path, bidomain 2D n={n} (f32, "
                "V-cycle, gamma=1e6), virtual CPU devices,\n"
                "# sharded-Pallas interpret mode.  iters must be "
                "ndev-invariant (exact sharded kernels);\n"
                "# pallas_lv == sharded_lv means NO XLA fallback on any "
                "sharded level.  s_per_iter shares\n"
                "# 2 physical cores across all virtual devices -> "
                "overhead trend only, not ICI scaling.\n"
                "ndev iters iters_warm s_per_iter pallas_lv sharded_lv "
                "outer_pallas nflat\n")
        for row in rows:
            f.write(" ".join(row) + "\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
