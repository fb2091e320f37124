#!/bin/bash
# Sweep-parity with /root/reference/run_bidomain_2d_firedrake.sh:
# geometric-MG comparison path, 6 gamma values.
NREFS=${NREFS:-5}
for gamma in 1 100 10000 1000000 100000000 10000000000; do
  python3 -m tpuamg.problems.bidomain_2d_gmg -nrefs "$NREFS" \
      -gamma "$gamma" -mg_type mg
done
