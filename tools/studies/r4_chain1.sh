#!/bin/bash
# r4 TPU chain 1: run AFTER the CPU accuracy jobs finish (2-core box —
# local XLA compiles starve under CPU contention; one job at a time).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
# 1. SSD: measure the bucket3@176 tier (bucket2 numbers already in
#    docs/ssd_bucket2_r4.json)
timeout 1800 python tools/studies/ssd_bucket3_r4.py
# 2. model-level roofline attribution (MNv1/R50/ERNIE + R50 ablations)
timeout 7000 python tools/studies/r50_roofline_r4.py
# 3. ppocr_det serving batch table after deconv_pack (the b8 cliff check)
timeout 2400 python -m paddle_lite_tpu.tools.batch_tune --model ppocr_det \
  --buckets 1,2,4,8,16 --int8
# 4. depthwise re-race with the hoisted kernels + in-model validation
timeout 3600 python tools/studies/dw_remeasure_r4.py
timeout 3600 python tools/studies/dw_validate_r4.py
# 5. bigru fate sweep
timeout 2400 python tools/studies/bigru_sweep_r4.py
# 6. DBNet per-op latency profile (shipping config) — attribution for the
#    remaining head/trunk cost + profiler-acceptance data point
timeout 5400 python -m paddle_lite_tpu.tools.profile --model ppocr_det \
  --batch 4 --image-size 640 --out docs/profile_dbnet_r4.jsonl
# 7. profiler acceptance: per-op sums vs whole-model on MNv3/SSD/ERNIE
timeout 9000 python tools/studies/profile_validate_r4.py
# 8. refresh the BASELINE rows for the two changed configs
timeout 3600 python tools/studies/remeasure_r4.py
# 9. ppocr_det serving batch table, corrected flags (b8 cliff check)
timeout 3000 python -m paddle_lite_tpu.tools.batch_tune --model ppocr_det \
  --buckets 1,2,4,8,16 --image-size 640
