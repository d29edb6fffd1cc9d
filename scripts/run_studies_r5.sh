#!/usr/bin/env bash
# Round-5 tf32 re-baseline driver (VERDICT r4 item 1): re-run every
# protocol study table under the new train.matmul_precision=tensorfloat32
# default (config.yaml — the ladder/fleet/sequence paths now thread it).
# Stages run strictly serially: the tunneled runtime serializes compiles
# fleet-wide, so interleaving TPU jobs only adds contention (NOTES.md
# "tunnel compile economics"). Each stage logs to outputs/r5_logs/.
set -x
cd /root/repo
mkdir -p outputs/r5_logs

echo "=== weight-removal: sparse ladders (one compile per method) ==="
python -m implicit_image_tpu.parallel.ladder img=synthetic entropy_coding=zstd \
    train.multiplier=5 masking=RigL masking.density=0.05,0.1,0.25,0.5,0.75 \
    > outputs/r5_logs/wr_rigl.log 2>&1
python -m implicit_image_tpu.parallel.ladder img=synthetic entropy_coding=zstd \
    train.multiplier=5 masking=SNFS masking.density=0.05,0.1,0.25,0.5,0.75 \
    > outputs/r5_logs/wr_snfs.log 2>&1
python -m implicit_image_tpu.parallel.ladder img=synthetic entropy_coding=zstd \
    train.multiplier=5 masking=Pruning masking.density=1.0 \
    masking.final_density=0.05,0.1,0.25,0.5,0.75 \
    > outputs/r5_logs/wr_gmp.log 2>&1

echo "=== weight-removal: shape-changing methods (serial) + dense ==="
for density in 0.05 0.1 0.25 0.5 0.75; do
  python -m implicit_image_tpu.compress img=synthetic masking=Small_Dense \
      masking.density=$density train.multiplier=5 entropy_coding=zstd \
      > outputs/r5_logs/wr_sd_$density.log 2>&1
done
for density in 0.05 0.1 0.25 0.5 0.75; do
  python -m implicit_image_tpu.compress img=synthetic masking=Feathermap \
      masking.density=$density train.multiplier=5 entropy_coding=zstd \
      > outputs/r5_logs/wr_fm_$density.log 2>&1
done
python -m implicit_image_tpu.compress img=synthetic masking=none \
    train.multiplier=5 entropy_coding=zstd \
    > outputs/r5_logs/wr_dense.log 2>&1
python tools/weight_removal_table.py > outputs/r5_logs/wr_table.log 2>&1

echo "=== width x depth grid (threaded compile overlap) ==="
python -m implicit_image_tpu.compress -m img=synthetic mlp=siren \
    mlp.hidden_size=64,96,128,256 mlp.depth=4,6,8,10 \
    masking=none quant=none entropy_coding=none launcher.n_jobs=4 \
    > outputs/r5_logs/wd_siren.log 2>&1
python -m implicit_image_tpu.compress -m img=synthetic mlp=fourier \
    mlp.hidden_size=64,96,128,256 mlp.depth=4,6,8,10 \
    masking=none quant=none entropy_coding=none launcher.n_jobs=4 \
    > outputs/r5_logs/wd_fourier.log 2>&1

echo "=== wavelet points ==="
python -m implicit_image_tpu.compress img=synthetic mlp=wavelet_siren \
    masking=none quant=kmeans entropy_coding=zstd exp_name=wavelet_none_r5 \
    > outputs/r5_logs/wavelet_dense.log 2>&1
python -m implicit_image_tpu.compress img=synthetic mlp=wavelet_siren \
    masking=RigL masking.density=0.25 quant=kmeans entropy_coding=zstd \
    exp_name=wavelet_RigL_r5 > outputs/r5_logs/wavelet_rigl.log 2>&1

echo "=== OOD A/B (tf32 artifact) ==="
python benchmarks/metainit_ood.py > outputs/r5_logs/ood.log 2>&1

echo "=== progressive x delta A/B (ctx_lo containers) ==="
python benchmarks/progressive_delta_ab.py steps=1200 \
    > outputs/r5_logs/prog_delta.log 2>&1

echo "=== decode-speed refresh (tf32 decoder default) ==="
python benchmarks/decode_speed.py 512 auto > outputs/r5_logs/decode_512.log 2>&1

echo "=== sequence: long clip (.iiv amortization + steady decode fps) ==="
python benchmarks/sequence_decode.py frames=48 gop=8 \
    out=outputs/bench/seqdec48 > outputs/r5_logs/seq48.log 2>&1

echo "=== R5 STUDIES DONE ==="
