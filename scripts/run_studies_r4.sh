#!/usr/bin/env bash
# Round-4 study driver: width x depth grid (SIREN + Fourier), then the
# 5-method weight-removal study. Single-host, threaded launcher for
# compile overlap on the heterogeneous-shape grid.
set -x
cd /root/repo
echo "=== width_depth: siren ==="
python -m implicit_image_tpu.compress -m img=synthetic mlp=siren \
    mlp.hidden_size=64,96,128,256 mlp.depth=4,6,8,10 \
    masking=none quant=none entropy_coding=none launcher.n_jobs=4
echo "=== width_depth: fourier ==="
python -m implicit_image_tpu.compress -m img=synthetic mlp=fourier \
    mlp.hidden_size=64,96,128,256 mlp.depth=4,6,8,10 \
    masking=none quant=none entropy_coding=none launcher.n_jobs=4
echo "=== weight_removal ==="
bash scripts/sparsify.sh synthetic
echo "=== STUDIES DONE ==="
