#!/bin/bash
# Round-3 serial TPU chain, part 6: official re-measures for rows whose
# recommended config changed (DBNet now ships dw=float), then the TPU
# verify drive and the headline bench.  NEVER edit this file while it runs.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
cd /root/repo

timeout 2400 python tools/studies/remeasure_r3.py ppocr_det > /tmp/remeasure_det.log 2>&1
timeout 1800 python bench.py > /tmp/bench_r3.log 2>&1
echo CHAIN6_DONE
