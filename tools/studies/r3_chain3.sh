#!/bin/bash
# Round-3 serial TPU chain, part 3 (reordered for leverage): high-impact
# tunes first (ERNIE FFN buckets + block sweep, CRNN bigru), then the
# ResNet/MNv1 block sweeps, then DBNet's dw entries, then the MNv3
# component-attribution ablation and the DBNet dw-compute sweep.
# NEVER edit this file while it runs (bash reads incrementally).
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
cd /root/repo

timeout 3600 python tools/studies/tune_r3.py ernie_tiny ppocr_rec > /tmp/tune_r3_a.log 2>&1
timeout 4800 python tools/studies/tune_r3.py resnet mobilenet_v1 > /tmp/tune_r3_b.log 2>&1
timeout 4800 python tools/studies/tune_r3.py ppocr_det > /tmp/tune_r3_c.log 2>&1
timeout 3600 python tools/studies/mnv3_ablate.py > /tmp/mnv3_ablate.log 2>&1
timeout 2400 python tools/studies/dbnet_dw.py > /tmp/dbnet_dw.log 2>&1
echo CHAIN3_DONE
