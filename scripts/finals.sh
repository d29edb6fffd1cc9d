#!/usr/bin/env bash
# Finals density ladders per benchmark image (reference slurm_scripts/finals.sh:50-80):
# hidden 182 + 9-bit quant for building/bridge, default for flower.
set -e
for img in flower big_building bridge; do
  extra=""
  if [ "$img" != "flower" ]; then extra="mlp.hidden_size=182 quant.bits=9"; fi
  python -m implicit_image_tpu.compress -m img=$img entropy_coding=zstd \
      train.multiplier=5 masking=RigL \
      masking.density=0.01,0.02,0.05,0.1,0.2,0.3,0.4,0.5,0.75,0.95 $extra
done
