#!/usr/bin/env bash
# Finish the weight-removal study with THREADED multiruns (compile
# overlap — serial per-process dense compiles degraded to ~20 min each
# on the tunnel), then run the round-4 measurement batch.
set -x
cd /root/repo
# let the in-flight Small_Dense d=0.25 run finish
while pgrep -f "masking=Small_Dense masking.density=0.25" >/dev/null 2>&1; do sleep 20; done
python -m implicit_image_tpu.compress -m img=synthetic masking=Small_Dense \
    masking.density=0.5,0.75 train.multiplier=5 entropy_coding=zstd launcher.n_jobs=2
python -m implicit_image_tpu.compress -m img=synthetic masking=Feathermap \
    masking.density=0.05,0.1,0.25,0.5,0.75 train.multiplier=5 \
    entropy_coding=zstd launcher.n_jobs=5
python -m implicit_image_tpu.compress img=synthetic masking=none \
    train.multiplier=5 entropy_coding=zstd
python tools/weight_removal_table.py
echo "=== SPARSIFY DONE ==="

echo "=== QAT pipeline point (item 2) + kmeans control + wavelet (item 3), threaded ==="
python -m implicit_image_tpu.compress -m img=synthetic masking=none \
    quant=qat,kmeans entropy_coding=zstd launcher.n_jobs=2 \
    output_dir='outputs/bench/${quant.name}_point'
python -m implicit_image_tpu.compress -m img=synthetic mlp=wavelet_siren \
    masking=none,RigL masking.density=0.25 quant=kmeans entropy_coding=zstd \
    launcher.n_jobs=2 output_dir='outputs/bench/wavelet_${masking.name}'
echo "=== OOD warm/cold A/B (item 4) ==="
python benchmarks/metainit_ood.py
echo "=== progressive x delta A/B (item 5) ==="
python benchmarks/progressive_delta_ab.py
echo "=== sequence decode throughput (item 6) ==="
python benchmarks/sequence_decode.py
echo "=== ALL MEASUREMENTS DONE ==="
