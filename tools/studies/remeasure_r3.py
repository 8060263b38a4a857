"""Round-3 full re-measurement of BASELINE.md's measured table (VERDICT r2
missing #4): all seven configs, fp32 + int8, current pipeline, hardened
iteration-delta method.  int8 runs under BOTH island dtypes so the
per-model bf16-island decision is re-validated on the same code that sets
the committed row (r2 changed fp32 baselines and the SSD NMS default, so
every ratio needed re-derivation).

Appends one JSON row per config to stdout; the committed snapshot lives in
docs/bench_rows_r3.jsonl and BASELINE.md cites it.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/studies/remeasure_r3.py
"""
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from paddle_lite_tpu.tools.benchmark import bench_model  # noqa: E402

CONFIGS = [
    # (model, batch, image_size/seq_len)
    ("mobilenet_v1", 64, 224),
    ("resnet", 32, 224),
    ("mobilenet_v3", 64, 224),
    ("ssd", 32, 300),
    ("ppocr_det", 4, 640),
    ("ppocr_rec", 64, 320),
    ("ernie_tiny", 32, 128),
]


def main():
    import sys

    out_path = os.path.join(os.path.dirname(__file__), "..", "..",
                            "docs", "bench_rows_r3.jsonl")
    configs = CONFIGS
    note = None
    if len(sys.argv) > 1:  # re-measure only the named models (post-tune)
        names = set(sys.argv[1:])
        configs = [c for c in CONFIGS if c[0] in names]
        note = "partial re-measure " + ",".join(sorted(names))
    rows = []
    for model, batch, size in configs:
        kw = dict(batch=batch)
        if model == "ernie_tiny":
            kw["seq_len"] = size
        else:
            kw["image_size"] = size
        row = {"model": model, "batch": batch, "size": size}
        base = bench_model(model, int8=True, with_fp32=True,
                           island_dtype="float32", **kw)
        row["fp32"] = base["fp32_items_per_sec"]
        row["int8_fp32_islands"] = base["int8_items_per_sec"]
        bf = bench_model(model, int8=True, with_fp32=False,
                         island_dtype="bfloat16", **kw)
        row["int8_bf16_islands"] = bf["int8_items_per_sec"]
        row["int8_best"] = max(row["int8_fp32_islands"],
                               row["int8_bf16_islands"])
        row["best_island"] = ("bfloat16"
                              if row["int8_bf16_islands"]
                              >= row["int8_fp32_islands"] else "float32")
        row["speedup"] = round(row["int8_best"] / row["fp32"], 3)
        if note:
            row["note"] = note
        rows.append(row)
        print(json.dumps(row), flush=True)
    # full runs rewrite the snapshot; filtered runs MERGE by model so the
    # file never holds a stale row alongside its replacement (consumers
    # that take the first match per model would read the outdated number)
    merged = rows
    if note and os.path.exists(out_path):
        with open(out_path) as f:
            old = [json.loads(l) for l in f if l.strip()]
        fresh = {r["model"]: r for r in rows}
        merged = [fresh.pop(r["model"], r) for r in old]
        merged += [r for r in rows if r["model"] in fresh]
    with open(out_path, "w") as f:
        for r in merged:
            f.write(json.dumps(r) + "\n")
    print("wrote", os.path.normpath(out_path), flush=True)


if __name__ == "__main__":
    main()
