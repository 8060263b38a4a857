"""r5: the latency story (VERDICT r4 missing #1).

The reference's entire published benchmark table is ms/image at small
batch; our BASELINE rows are throughput at serving batches.  This study
commits the small-batch latency table: ms/batch (and ms/item) at b1/b4/b8
for every zoo config, both precisions, on-device iteration-delta method —
including where fp32 WINS at small batch (the honest rows BASELINE.md
admits in prose).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/studies/latency_r5.py [model...]
Writes docs/latency_r5.json (merged per model so it can be run piecemeal).
"""
import os, sys, json

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax  # noqa: E402
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from paddle_lite_tpu.tools.benchmark import bench_model  # noqa: E402

CONFIGS = {
    "mobilenet_v1": {"image_size": 224},
    "resnet": {"image_size": 224},
    "mobilenet_v3": {"image_size": 224},
    "ssd": {"image_size": 300},
    "ppocr_det": {"image_size": 640},
    "ppocr_rec": {"image_size": 320},
    "ernie_tiny": {"seq_len": 128},
    "crnn_long": {"image_size": 1600},   # r5 long-strip OCR config
}
BATCHES = (1, 4, 8)
OUT = "/root/repo/docs/latency_r5.json"


def main():
    names = sys.argv[1:] or list(CONFIGS)
    table = json.load(open(OUT)) if os.path.exists(OUT) else {}
    for model in names:
        kw = CONFIGS[model]
        rows = []
        for b in BATCHES:
            r = bench_model(model, batch=b, int8=True, with_fp32=True, **kw)
            row = {
                "batch": b,
                "fp32_ms_batch": round(b / r["fp32_items_per_sec"] * 1e3, 3),
                "int8_ms_batch": round(b / r["int8_items_per_sec"] * 1e3, 3),
                "fp32_ms_item": round(1e3 / r["fp32_items_per_sec"], 3),
                "int8_ms_item": round(1e3 / r["int8_items_per_sec"], 3),
                "int8_wins": r["int8_items_per_sec"]
                > r["fp32_items_per_sec"],
            }
            rows.append(row)
            print(f"{model} b{b}: fp32 {row['fp32_ms_batch']}ms "
                  f"int8 {row['int8_ms_batch']}ms "
                  f"({'int8' if row['int8_wins'] else 'FP32'} wins)",
                  flush=True)
        table[model] = rows
        json.dump(table, open(OUT, "w"), indent=1)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
