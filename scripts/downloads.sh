#!/bin/bash
# Fetch the neuron/brain meshes used by the 3D-1D EMI problem
# (role of /root/reference/downloads.sh; same gdown-hosted data).
# If the environment has no network access, the drivers fall back to the
# synthetic branching-neuron generator
# (tpuamg.problems.emi_3d1d.synthetic_neuron_curve).
set -e
mkdir -p ./data
pip show gdown >/dev/null 2>&1 || pip install gdown
cd ./data
# neuron curve mesh (HDF5) used by emi_3d1d.py
gdown --folder https://drive.google.com/drive/folders/1SGSu9jLL8bB1IG4mnDhZQeGBblQVqF2V || {
  echo "download failed (no network?) — synthetic neuron will be used"; exit 0; }
