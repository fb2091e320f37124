#!/bin/bash
# Sweep-parity with /root/reference/run_bidomain_2d.sh:
# 4 preconditioners x 6 gamma values, nrefs 5.
NREFS=${NREFS:-5}
for precond in hazmath hazmath_Schwarz hazmath_HEM metric_mono; do
  for gamma in 1 100 10000 1000000 100000000 10000000000; do
    python3 -m tpuamg.problems.bidomain_2d -nrefs "$NREFS" -gamma "$gamma" -precond "$precond"
  done
done
