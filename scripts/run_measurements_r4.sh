#!/usr/bin/env bash
# Round-4 measurement batch (VERDICT items 2,3,4,5,6): runs after the
# weight-removal study frees the chip.
set -x
cd /root/repo
# wait for the sparsify study to finish
while kill -0 $(cat /tmp/studies.pid 2>/dev/null) 2>/dev/null; do sleep 30; done

echo "=== QAT pipeline point (item 2) ==="
python -m implicit_image_tpu.compress img=synthetic masking=none \
    quant=qat entropy_coding=zstd output_dir=outputs/bench/qat_point
echo "=== kmeans control at the same fit ==="
python -m implicit_image_tpu.compress img=synthetic masking=none \
    quant=kmeans entropy_coding=zstd output_dir=outputs/bench/kmeans_point

echo "=== wavelet-SIREN measured (item 3) ==="
python -m implicit_image_tpu.compress img=synthetic mlp=wavelet_siren \
    masking=none quant=kmeans entropy_coding=zstd \
    output_dir=outputs/bench/wavelet_dense
python -m implicit_image_tpu.compress img=synthetic mlp=wavelet_siren \
    masking=RigL masking.density=0.25 quant=kmeans entropy_coding=zstd \
    output_dir=outputs/bench/wavelet_d025

echo "=== OOD warm/cold A/B (item 4) ==="
python benchmarks/metainit_ood.py

echo "=== progressive x delta A/B (item 5) ==="
python benchmarks/progressive_delta_ab.py

echo "=== sequence decode throughput (item 6) ==="
python benchmarks/sequence_decode.py

echo "=== MEASUREMENTS DONE ==="
