"""r4: re-measure the BASELINE.md rows whose configs changed this round
(SSD: top-3-per-bucket default selection; DBNet: deconv_pack head), fp32 +
both int8 island dtypes, same hardened method as remeasure_r3.  Rows land
in docs/bench_rows_r4.jsonl (full snapshot copied from r3 with the changed
models replaced).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/studies/remeasure_r4.py [models...]
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
    "ppocr_det": (4, 640),
}


def main():
    names = sys.argv[1:] or list(CONFIGS)
    here = os.path.dirname(__file__)
    r3 = os.path.join(here, "..", "..", "docs", "bench_rows_r3.jsonl")
    out_path = os.path.join(here, "..", "..", "docs", "bench_rows_r4.jsonl")
    base = [json.loads(l) for l in open(r3)] if os.path.exists(r3) else []
    if os.path.exists(out_path):
        for r in (json.loads(l) for l in open(out_path)):
            base = [r if b["model"] == r["model"] else b for b in base]
    fresh = {}
    for model in names:
        batch, size = CONFIGS[model]
        kw = dict(batch=batch, image_size=size)
        row = {"model": model, "batch": batch, "size": size, "note": "r4"}
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
    print("wrote", os.path.normpath(out_path), flush=True)


if __name__ == "__main__":
    main()
