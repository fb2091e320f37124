#!/bin/bash
# Sweep-parity with /root/reference/run_emi_3d.sh: metric precond x 6 gammas.
NREFS=${NREFS:-5}
for gamma in 1 100 10000 1000000 100000000 10000000000; do
  python3 -m tpuamg.problems.emi_3d -nrefs "$NREFS" -gamma "$gamma" -precond metric
done
