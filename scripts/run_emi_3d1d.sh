#!/bin/bash
# Sweep-parity with /root/reference/run_emi_3d1d.sh:
# radius x gamma grid; dump -> offline solve -> (optional) visualize.
MESH_N=${MESH_N:-16}
for radius in 0.0 0.2 1.0 5.0; do
  for gamma in 1 100 10000 1000000 100000000 10000000000; do
    outdir="./data/emi_3d1d_r${radius}_g${gamma}/"
    resdir="./results/emi_3d1d_r${radius}_g${gamma}/"
    python3 -m tpuamg.problems.emi_3d1d -gamma "$gamma" -radius "$radius" \
        -dump 1 -outdir "$outdir" -mesh_n "$MESH_N"
    python3 -m tpuamg.problems.run_solver_3d1d \
        -infile ./tpuamg/problems/input_metric.dat \
        -indir "$outdir" -outdir "$resdir" | tee "$resdir/output.txt"
    if [ "${SAVE_PVD:-0}" = "1" ]; then
      cp "$resdir/solution.txt" "$outdir"
      python3 -m tpuamg.problems.emi_3d1d -gamma "$gamma" -radius "$radius" \
          -load_solution "$outdir" -mesh_n "$MESH_N"
    fi
  done
done
