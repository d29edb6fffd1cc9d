#!/usr/bin/env bash
# Round-5 tf32 refresh of the BASELINE.md "Tracked configs" operating
# points (VERDICT r4 item 1 tail). Row 5 (batched) is measured in-run by
# bench.py now; row 6's ladder-wall economics were re-measured by the r5
# weight-removal ladders (553 s / 5 x 10000-step members).
set -x
cd /root/repo
mkdir -p outputs/r5_logs

# row 4: dense full pipeline at the protocol point (2000 steps)
python -m implicit_image_tpu.compress img=synthetic masking=none \
    quant=kmeans entropy_coding=auto exp_name=tracked_dense_r5 \
    > outputs/r5_logs/tracked_dense.log 2>&1

# row 2: w=512 d=8 at the stable lr (width-aware auto-segmentation)
python -m implicit_image_tpu.compress img=synthetic masking=none \
    mlp.hidden_size=512 optim.lr=1e-4 quant=none entropy_coding=none \
    exp_name=tracked_w512_r5 > outputs/r5_logs/tracked_w512.log 2>&1

# row 3: the finals R-D ladder (full 5x protocol, ECVQ lambda=1,
# half=auto containers, decoded PSNR) — one compile, 6 densities
python -m implicit_image_tpu.parallel.ladder img=synthetic \
    entropy_coding=auto train.multiplier=5 masking=RigL \
    masking.density=0.05,0.1,0.2,0.4,0.75,0.95 \
    > outputs/r5_logs/tracked_finals_ladder.log 2>&1

echo "=== TRACKED R5 DONE ==="
