#!/usr/bin/env bash
# Sparsity-method study (reference slurm_scripts/sparsify.sh).
#
# RigL/SNFS/GMP sweep their density axis through the ONE-COMPILE vmapped
# ladder (parallel/ladder.py): a sparse in-scan segment program costs
# ~10-12 min of server-side compile on the tunneled runtime (NOTES.md
# "Tunnel compile economics"), so one compile amortized over all 5
# densities beats 5 serial compress.py runs ~4x on wall. Small-Dense and
# Feathermap change layer SHAPES with density (width/hash scaling) — not
# vmappable — and run serially; dense control last.
set -e
IMG=${1:-synthetic}
python -m implicit_image_tpu.parallel.ladder img=$IMG entropy_coding=zstd \
    train.multiplier=5 masking=RigL masking.density=0.05,0.1,0.25,0.5,0.75
python -m implicit_image_tpu.parallel.ladder img=$IMG entropy_coding=zstd \
    train.multiplier=5 masking=SNFS masking.density=0.05,0.1,0.25,0.5,0.75
python -m implicit_image_tpu.parallel.ladder img=$IMG entropy_coding=zstd \
    train.multiplier=5 masking=Pruning masking.density=1.0 \
    masking.final_density=0.05,0.1,0.25,0.5,0.75
for method in Small_Dense Feathermap; do
  for density in 0.05 0.1 0.25 0.5 0.75; do
    python -m implicit_image_tpu.compress img=$IMG masking=$method \
        masking.density=$density train.multiplier=5 entropy_coding=zstd
  done
done
python -m implicit_image_tpu.compress img=$IMG masking=none train.multiplier=5 entropy_coding=zstd
python tools/weight_removal_table.py
