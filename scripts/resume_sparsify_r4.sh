#!/usr/bin/env bash
# Resume the weight-removal study: RigL d=0.05 already done.
set -x
cd /root/repo
IMG=synthetic
for density in 0.1 0.25 0.5 0.75; do
  python -m implicit_image_tpu.compress img=$IMG masking=RigL \
      masking.density=$density train.multiplier=5 entropy_coding=zstd
done
for method in SNFS Pruning Small_Dense Feathermap; do
  for density in 0.05 0.1 0.25 0.5 0.75; do
    extra=""
    [ "$method" = "Pruning" ] && extra="masking.final_density=$density masking.density=1.0"
    python -m implicit_image_tpu.compress img=$IMG masking=$method \
        masking.density=$density train.multiplier=5 entropy_coding=zstd $extra
  done
done
python -m implicit_image_tpu.compress img=$IMG masking=none train.multiplier=5
echo "=== SPARSIFY DONE ==="
