#!/usr/bin/env bash
# Re-run the weight-removal SERIAL members (Small_Dense / Feathermap /
# dense control) with DISTINCT run dirs. The first r5 pass ran them
# without -m overrides, so every run wrote to the bare exp root and
# clobbered the previous member's summary — only the dense control
# (last) survived in the store. exp_name per member fixes the layout;
# stale r4 dirs (outputs/recovered, the collided ladder root, old
# n_jobs serial dirs) were deleted so the store holds only clean tf32
# provenance (VERDICT r4 item 1: "re-earning the log-recovered rows").
set -x
cd /root/repo
mkdir -p outputs/r5_logs
for density in 0.05 0.1 0.25 0.5 0.75; do
  tag=$(echo $density | tr -d '.')
  python -m implicit_image_tpu.compress img=synthetic masking=Small_Dense \
      masking.density=$density train.multiplier=5 entropy_coding=zstd \
      exp_name=wr_sd_$tag > outputs/r5_logs/wr2_sd_$density.log 2>&1
done
for density in 0.05 0.1 0.25 0.5 0.75; do
  tag=$(echo $density | tr -d '.')
  python -m implicit_image_tpu.compress img=synthetic masking=Feathermap \
      masking.density=$density train.multiplier=5 entropy_coding=zstd \
      exp_name=wr_fm_$tag > outputs/r5_logs/wr2_fm_$density.log 2>&1
done
python -m implicit_image_tpu.compress img=synthetic masking=none \
    train.multiplier=5 entropy_coding=zstd exp_name=wr_dense \
    > outputs/r5_logs/wr2_dense.log 2>&1
python tools/weight_removal_table.py > outputs/r5_logs/wr2_table.log 2>&1
echo "=== WR SERIAL FIXUP DONE ==="
