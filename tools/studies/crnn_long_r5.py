"""r5: ship the bigru Pallas kernel's one measured win region (VERDICT r4
next-round #8) — the long-strip OCR recognition config (T=400, hidden=64,
b16), where the r4 sweep measured pallas ahead of XLA's scan.

Measures the crnn_long zoo config end-to-end: fp32, int8 with the table
route (bigru_384x16x192 -> pallas), and int8 with the entry forced to xla
— the in-model A/B that decides whether the kernel actually serves.
Writes docs/crnn_long_r5.json and leaves the table entry at the winner.
"""
import os, json

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from paddle_lite_tpu.tools.benchmark import bench_model
from paddle_lite_tpu.ops.kernels import tune_cache

KEY = "bigru_384x16x192"
B, W = 16, 1600
results = {}

r = bench_model("crnn_long", batch=B, image_size=W, int8=True,
                with_fp32=True)
results["fp32"] = r["fp32_items_per_sec"]
results["int8_pallas_route"] = r["int8_items_per_sec"]
print(f"fp32 {r['fp32_items_per_sec']} int8(pallas bigru) "
      f"{r['int8_items_per_sec']}", flush=True)

orig = tune_cache._load().get(KEY)
tune_cache._store({KEY: "xla"})
try:
    r2 = bench_model("crnn_long", batch=B, image_size=W, int8=True,
                     with_fp32=False)
    results["int8_xla_bigru"] = r2["int8_items_per_sec"]
    print(f"int8(xla bigru) {r2['int8_items_per_sec']}", flush=True)
finally:
    tune_cache._store({KEY: orig or "pallas"})

winner = ("pallas" if results["int8_pallas_route"]
          >= results["int8_xla_bigru"] else "xla")
tune_cache._store({KEY: winner})
results["winner"] = winner
results["note"] = ("crnn_long = build_rec(width=1600, hidden=64), b16; "
                   "the bigru kernel's measured win region")

out = "/root/repo/docs/crnn_long_r5.json"
json.dump(results, open(out, "w"), indent=1)
print("wrote", out, "winner:", winner, flush=True)
