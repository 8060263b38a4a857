#!/bin/bash
# Round-3 serial TPU chain, part 2: the models the crashed ppocr_det tune
# skipped (now guarded), the GEMM block sweeps, bigru table entries, and the
# ERNIE act-act A/B.  NEVER edit this file while it runs (bash reads
# incrementally — the part-1 chain skipped stages when edited live).
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
cd /root/repo

timeout 7200 python tools/studies/tune_r3.py ppocr_det resnet mobilenet_v1 ppocr_rec ernie_tiny > /tmp/tune_r3b.log 2>&1
timeout 2400 python tools/studies/ernie_ab.py > /tmp/ernie_ab.log 2>&1
echo CHAIN2_DONE
