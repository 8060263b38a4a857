"""r4: re-race every depthwise table bucket after the sublane-shift-hoist
rewrite of the Pallas dw kernels (ops/kernels/depthwise.py): the old
kernels paid one Mosaic relayout copy per tap per row chunk (9x the slab
for 3x3); the rewrite pays kw copies once per grid step.  measure_dw
stores fresh winners in .autotune/gemm.json; any bucket that flips to
pallas must then pass validate_in_model (run separately) before shipping.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/studies/dw_remeasure_r4.py
"""
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from paddle_lite_tpu.ops.kernels import tune_cache  # noqa: E402

# representative (batch, h, c, k, s) per dw bucket in the committed table;
# batch matches the model that owns the bucket (64 for the mobilenets,
# 32 SSD, 4 DBNet)
SHAPES = [
    (64, 112, 32, 3, 1), (64, 112, 64, 3, 2), (64, 56, 128, 3, 1),
    (64, 56, 128, 3, 2), (64, 28, 256, 3, 1), (64, 28, 256, 3, 2),
    (64, 14, 512, 3, 1), (64, 14, 512, 3, 2), (64, 7, 1024, 3, 1),
    (64, 28, 240, 5, 1), (64, 14, 480, 3, 1), (64, 14, 672, 5, 1),
    (64, 14, 672, 5, 2), (64, 7, 960, 5, 1),
    (32, 19, 512, 3, 1), (32, 10, 1024, 3, 1),
]

results = {}
for b, h, c, k, s in SHAPES:
    try:
        w = tune_cache.measure_dw(b, h, c, k=k, s=s, verbose=True)
        results[f"{b}x{h}x{c} k{k}s{s}"] = w
    except Exception as e:
        print(f"  {b}x{h}x{c} k{k}s{s}: FAILED {type(e).__name__}: {e}",
              flush=True)
print(json.dumps(results, indent=1))
