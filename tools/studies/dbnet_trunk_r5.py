"""r5: DBNet early-trunk lane-starvation A/B (VERDICT r4 next-round #3).

The validated r4 profile (docs/profile_dbnet_r4.jsonl) puts 0.86 of the
1.97 ms b4 batch in the stem conv (0.26) + the 320px 16-channel FLOAT
depthwise (0.59).  A 16-channel f32 tensor is stored 8x lane-padded
((8,128) tiling), so that dw streams ~210 MB physical for ~26 MB logical.
DBNet ships quant_depthwise=False from the r3 all-or-nothing sweep; r5
adds a width threshold (QuantConfig.quant_depthwise=<int>) so only the
lane-starved narrow dw goes int8 (1 byte/elem: 8x fewer physical bytes).

Variants (whole-model, b4@640, int8 pipeline, fp32 islands):
  base        quant_depthwise=False (shipped)
  qdw16_i32   narrow dw (C<=16) int8, int32 compute
  qdw16_bf16  narrow dw (C<=16) int8, bf16 compute (bit-identical windows)
  qdw32_bf16  C<=32 threshold
  qdw_all_bf16  every dw int8/bf16 (re-check the r3 all-int8 loss under
                bf16 compute)
Writes docs/dbnet_trunk_r5.json.
"""
import os, json

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from paddle_lite_tpu.models.ppocr import build_det
from paddle_lite_tpu.quant.quantize_pass import QuantConfig
from paddle_lite_tpu.tools.opt import optimize
from paddle_lite_tpu.tools.benchmark import device_throughput

B = 4
rng = np.random.default_rng(0)
feed = {"image": rng.normal(size=(B, 640, 640, 3)).astype(np.float32)}
results = {}

PLANS = {
    "base": dict(quant_depthwise=False),
    "qdw16_i32": dict(quant_depthwise=16, depthwise_compute="int32"),
    "qdw16_bf16": dict(quant_depthwise=16, depthwise_compute="bf16"),
    "qdw32_bf16": dict(quant_depthwise=32, depthwise_compute="bf16"),
    "qdw_all_bf16": dict(quant_depthwise=True, depthwise_compute="bf16"),
}

for name, kw in PLANS.items():
    g = build_det(batch=B, image_size=640, seed=0)
    optimize(g, quant=QuantConfig(**kw), calib_batches=[feed])
    n_dw8 = sum(1 for op in g.ops if op.op_type == "depthwise_conv2d"
                and op.attrs.get("enable_int8"))
    ips = device_throughput(g, feed)
    print(f"{name}: {ips:.1f} items/s ({n_dw8} int8 dw)", flush=True)
    results[name] = {"items_per_sec": round(ips, 1), "int8_dw": n_dw8}

out = "/root/repo/docs/dbnet_trunk_r5.json"
json.dump(results, open(out, "w"), indent=1)
print("wrote", out, flush=True)
