#!/bin/bash
# Round-3 chip campaign: run once the TPU backend recovers.
# Sequential (one process owns the chip); logs to /tmp/chip_campaign.log.
set -x
cd /root/repo

# 1. refined-evaluate artifacts (README table's --geom-refine column)
timeout 2400 python -m ssf_slam_tpu.cli evaluate --synthetic --seed 100 \
    --frames 40 --ckpt runs/ssf_r3/best --seg-ckpt runs/segnet_r3/best \
    --variants sf,ssf,ssfc --geom-refine --out-dir results_r3_refine \
    > /tmp/eval_refine.out 2>&1

# 2. headline bench (confirm 110 with the eig3 plane-fit change)
timeout 2400 python bench.py > /tmp/bench1.out 2>&1

# 3. refine-cost bench (opt-in path cost after eig3; was 37.7 scans/s)
SSF_BENCH_GEOM_REFINE=1 timeout 2400 python bench.py > /tmp/bench_refine.out 2>&1

echo CAMPAIGN-DONE
