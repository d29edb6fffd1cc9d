#!/usr/bin/env bash
# Sparsity-method study (reference slurm_scripts/sparsify.sh, run as a
# single-host loop; each job is one compress.py invocation).
set -e
IMG=${1:-synthetic}
for method in RigL SNFS Pruning Small_Dense Feathermap; do
  for density in 0.05 0.1 0.25 0.5 0.75; do
    extra=""
    [ "$method" = "Pruning" ] && extra="masking.final_density=$density masking.density=1.0"
    python -m implicit_image_tpu.compress img="$IMG" masking=$method \
        masking.density=$density train.multiplier=5 entropy_coding=zstd $extra
  done
done
python -m implicit_image_tpu.compress img="$IMG" masking=none train.multiplier=5
