"""Re-measure the stale round-1 fp32 baselines (BASELINE.md rows marked
1a: SSD / DBNet / CRNN / ERNIE) under the current pipeline — fp32 now runs
the same fusion pipeline as int8 (conv_bn fold, act fusion, float stem),
so the old fp32 numbers understate the honest baseline. Re-measures both
precisions per model with each model's measured-best island_dtype.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools_scratch_remeasure.py
"""
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from paddle_lite_tpu.tools.benchmark import bench_model  # noqa: E402

CONFIGS = [
    # (model, batch, image_size/seq, island_dtype) — islands per BASELINE.md
    ("ssd", 32, 300, "bfloat16"),
    ("ppocr_det", 4, 640, "float32"),
    ("ppocr_rec", 64, 320, "bfloat16"),
    ("ernie_tiny", 32, 128, "bfloat16"),
]

rows = []
for model, batch, size, island in CONFIGS:
    kw = dict(batch=batch, int8=True, with_fp32=True, island_dtype=island)
    if model == "ernie_tiny":
        kw["seq_len"] = size
    else:
        kw["image_size"] = size
    r = bench_model(model, **kw)
    r["island_dtype"] = island
    rows.append(r)
    print(json.dumps(r), flush=True)

with open("/tmp/remeasure.json", "w") as f:
    json.dump(rows, f, indent=1)
