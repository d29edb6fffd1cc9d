#!/usr/bin/env bash
# Weight-removal study via ONE-COMPILE ladders (VERDICT r3 item 1a):
# RigL/SNFS/Pruning amortize the sparse in-scan compile (~10 min on this
# tunnel) across all 5 densities in one vmapped program; Small_Dense and
# Feathermap change layer SHAPES with density (not vmappable) and run
# serially as dense fits; dense control last.
set -x
cd /root/repo
# wait for any in-flight serial run to free the chip
while pgrep -f "masking=RigL masking.density=0.1 " >/dev/null 2>&1; do sleep 20; done
python -m implicit_image_tpu.parallel.ladder img=synthetic entropy_coding=zstd \
    train.multiplier=5 masking=RigL masking.density=0.05,0.1,0.25,0.5,0.75
python -m implicit_image_tpu.parallel.ladder img=synthetic entropy_coding=zstd \
    train.multiplier=5 masking=SNFS masking.density=0.05,0.1,0.25,0.5,0.75
python -m implicit_image_tpu.parallel.ladder img=synthetic entropy_coding=zstd \
    train.multiplier=5 masking=Pruning masking.density=1.0 \
    masking.final_density=0.05,0.1,0.25,0.5,0.75
for density in 0.05 0.1 0.25 0.5 0.75; do
  python -m implicit_image_tpu.compress img=synthetic masking=Small_Dense \
      masking.density=$density train.multiplier=5 entropy_coding=zstd
done
for density in 0.05 0.1 0.25 0.5 0.75; do
  python -m implicit_image_tpu.compress img=synthetic masking=Feathermap \
      masking.density=$density train.multiplier=5 entropy_coding=zstd
done
python -m implicit_image_tpu.compress img=synthetic masking=none train.multiplier=5 entropy_coding=zstd
echo "=== SPARSIFY LADDER DONE ==="
