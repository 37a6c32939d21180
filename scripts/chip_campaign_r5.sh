#!/bin/bash
# Round-5 chip campaign. Sequential — ONE process owns the TPU at a time.
# Logs under /tmp/r5_*.out; artifacts under results_r5*/ + docs tables.
set -x
cd /root/repo

# 1. evo-protocol evaluation, all six variants RAW (reference README:64-72
#    protocol; gated checkpoint, same scene as results_r3 for comparability)
timeout 5400 python -m ssf_slam_tpu.cli evaluate --synthetic --seed 100 \
    --frames 40 --ckpt runs/ssf_r3ft2/best --seg-ckpt runs/segnet_r3/best \
    --variants onlypc,noseg,sf,ssf,ssfc --out-dir results_r5 \
    > /tmp/r5_eval_raw.out 2>&1

# 2. the --geom-refine column (confirms the sf+refine trim_static_mask fix)
timeout 5400 python -m ssf_slam_tpu.cli evaluate --synthetic --seed 100 \
    --frames 40 --ckpt runs/ssf_r3ft2/best --seg-ckpt runs/segnet_r3/best \
    --variants sf,ssf,ssfc --geom-refine --out-dir results_r5_refine \
    > /tmp/r5_eval_refine.out 2>&1

# 3. streaming depth sweep (completion vs dispatch latency, depth 1/2/4)
timeout 3600 python scripts/bench_streaming.py > /tmp/r5_stream.out 2>&1

# 4. the vmap-batch economics table
timeout 3600 python scripts/batch_economics.py > /tmp/r5_batch.out 2>&1

# 5. Town02 movers through the FULL learned path (8192 pts, fused net)
timeout 3600 python scripts/eval_town02.py --ckpt runs/ssf_r3ft2/best \
    --out-json results_r5/town02_movers.json > /tmp/r5_town02.out 2>&1

# 6. point-shard banded chip smoke (single-device mesh, compiled kernels)
timeout 2400 python scripts/pointshard_chip_smoke.py > /tmp/r5_pshard.out 2>&1

echo CAMPAIGN-R5-DONE
