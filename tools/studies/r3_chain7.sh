#!/bin/bash
# Round-3 serial TPU chain, part 7: SSD dw-precision A/B, then serving
# batch tables for the rest of the zoo (the continuous batcher's measured
# best-batch data).  NEVER edit this file while it runs.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
cd /root/repo

timeout 2400 python tools/studies/ssd_dw_ab.py > /tmp/ssd_dw_ab.log 2>&1
timeout 2400 python -m paddle_lite_tpu.tools.batch_tune --model mobilenet_v1 --buckets 16,32,64,128,256 > /tmp/bt_mnv1.log 2>&1
timeout 2400 python -m paddle_lite_tpu.tools.batch_tune --model resnet --buckets 8,16,32,64,128 > /tmp/bt_resnet.log 2>&1
timeout 2400 python -m paddle_lite_tpu.tools.batch_tune --model ssd --image-size 300 --buckets 8,16,32,64 > /tmp/bt_ssd.log 2>&1
timeout 2400 python -m paddle_lite_tpu.tools.batch_tune --model ppocr_rec --image-size 320 --buckets 16,32,64,128 > /tmp/bt_rec.log 2>&1
timeout 2400 python -m paddle_lite_tpu.tools.batch_tune --model ernie_tiny --buckets 8,16,32,64 > /tmp/bt_ernie.log 2>&1
echo CHAIN7_DONE
