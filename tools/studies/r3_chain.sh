#!/bin/bash
# Round-3 serial TPU job chain (one measurement job at a time — CLAUDE.md).
# Run AFTER remeasure_r3.py completes.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
cd /root/repo

timeout 2400 python tools/studies/mnv3_dw.py   > /tmp/mnv3_dw.log 2>&1
timeout 3600 python tools/studies/mnv3_ablate.py > /tmp/mnv3_ablate.log 2>&1
timeout 5400 python tools/studies/tune_r3.py   > /tmp/tune_r3.log 2>&1
timeout 2400 python tools/studies/ernie_ab.py > /tmp/ernie_ab.log 2>&1
timeout 2400 python tools/studies/ernie_profile.py > /tmp/ernie_profile.log 2>&1
echo CHAIN_DONE
