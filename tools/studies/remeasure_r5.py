"""r5: re-measure the BASELINE rows whose shipped pipeline changed this
round — SSD (multiclass_nms now drops the background class before the NMS
cores + empty-instance guard; exact, both precisions share the NMS).
Rows land in docs/bench_rows_r5.jsonl (full snapshot copied from r4 with
changed models replaced).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/studies/remeasure_r5.py [models...]
"""
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from paddle_lite_tpu.tools.benchmark import bench_model  # noqa: E402

CONFIGS = {
    "ssd": (32, 300),
}


def main():
    names = sys.argv[1:] or list(CONFIGS)
    here = os.path.dirname(__file__)
    r4 = os.path.join(here, "..", "..", "docs", "bench_rows_r4.jsonl")
    out_path = os.path.join(here, "..", "..", "docs", "bench_rows_r5.jsonl")
    base = [json.loads(l) for l in open(r4)] if os.path.exists(r4) else []
    if os.path.exists(out_path):
        for r in (json.loads(l) for l in open(out_path)):
            base = [r if b["model"] == r["model"] else b for b in base]
    fresh = {}
    for model in names:
        batch, size = CONFIGS[model]
        kw = dict(batch=batch, image_size=size)
        row = {"model": model, "batch": batch, "size": size, "note": "r5"}
        b = bench_model(model, int8=True, with_fp32=True,
                        island_dtype="float32", **kw)
        row["fp32"] = b["fp32_items_per_sec"]
        row["int8_fp32_islands"] = b["int8_items_per_sec"]
        bf = bench_model(model, int8=True, with_fp32=False,
                         island_dtype="bfloat16", **kw)
        row["int8_bf16_islands"] = bf["int8_items_per_sec"]
        row["int8_best"] = max(row["int8_fp32_islands"],
                               row["int8_bf16_islands"])
        row["best_island"] = ("bfloat16" if row["int8_bf16_islands"]
                              >= row["int8_fp32_islands"] else "float32")
        row["speedup"] = round(row["int8_best"] / row["fp32"], 3)
        fresh[model] = row
        print(json.dumps(row), flush=True)
    merged = [fresh.pop(b["model"], b) for b in base]
    merged += list(fresh.values())
    with open(out_path, "w") as f:
        for r in merged:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
