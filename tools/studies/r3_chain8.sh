#!/bin/bash
# Round-3 serial TPU chain, part 8 (final): SSD per-region profile (the
# candidate-prep open item) and the fp32 serving-batch counterpoints for
# the b128 int8 peaks.  NEVER edit this file while it runs.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
cd /root/repo

timeout 1800 python -m paddle_lite_tpu.tools.batch_tune --model mobilenet_v1 --buckets 128 --fp32 --autotune-dir /tmp/fp32bt > /tmp/bt_mnv1_fp32.log 2>&1
timeout 1800 python -m paddle_lite_tpu.tools.batch_tune --model ppocr_rec --image-size 320 --buckets 128 --fp32 --autotune-dir /tmp/fp32bt > /tmp/bt_rec_fp32.log 2>&1
timeout 2400 python tools/studies/ssd_profile.py > /tmp/ssd_profile.log 2>&1
echo CHAIN8_DONE
