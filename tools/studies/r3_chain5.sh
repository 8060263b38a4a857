#!/bin/bash
# Round-3 serial TPU chain, part 5: MNv3 batch-regime + dw-precision study
# (follow-up to the ablation), then the ppocr_rec/ernie_tiny tune rerun
# (part 3's crashed on CRNN's multiplier-2 depthwise, fixed in f758750),
# then row re-measures.  NEVER edit this file while it runs.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
cd /root/repo

timeout 3600 python tools/studies/mnv3_batch_dw.py > /tmp/mnv3_batch_dw.log 2>&1
timeout 4800 python tools/studies/tune_r3.py ppocr_rec ernie_tiny > /tmp/tune_r3_d.log 2>&1
timeout 3600 python tools/studies/remeasure_r3.py ppocr_rec ernie_tiny > /tmp/remeasure_d.log 2>&1
echo CHAIN5_DONE
