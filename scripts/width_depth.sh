#!/usr/bin/env bash
# Width/depth grid (reference slurm_scripts/width_depth.sh:53-72).
set -e
IMG=${1:-synthetic}
for mlp in siren fourier; do
  python -m implicit_image_tpu.compress -m img="$IMG" mlp=$mlp \
      mlp.hidden_size=64,96,128,256 mlp.depth=4,6,8,10 \
      masking=none quant=none entropy_coding=none
done
