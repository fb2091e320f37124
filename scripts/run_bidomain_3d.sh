#!/bin/bash
# Sweep-parity with /root/reference/run_bidomain_3d.sh:
# 2 preconditioners x 6 gamma values, nrefs 4.
NREFS=${NREFS:-4}
for precond in hazmath hazmath_HEM; do
  for gamma in 1 100 10000 1000000 100000000 10000000000; do
    python3 -m tpuamg.problems.bidomain_3d -nrefs "$NREFS" -gamma "$gamma" -precond "$precond"
  done
done
