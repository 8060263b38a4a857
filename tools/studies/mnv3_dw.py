"""MobileNetV3 depthwise-compute A/B on the v5e (the open item behind the
1.01x headline): int8 with dw_compute=int32 (default) vs bf16 (int8 HBM
edges, bf16 VPU multiplies — bit-identical, see ops/nn.py), vs fp32
baseline, plus island_dtype=bfloat16 combinations.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools_scratch_mnv3_dw.py
"""
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from paddle_lite_tpu.tools.benchmark import bench_model  # noqa: E402

rows = []
# fp32 baseline once
r = bench_model("mobilenet_v3", batch=64, image_size=224, int8=False,
                with_fp32=True)
rows.append({"variant": "fp32", **r})
print(json.dumps(rows[-1]), flush=True)

for dw in ("int32", "bf16"):
    for island in ("float32", "bfloat16"):
        r = bench_model("mobilenet_v3", batch=64, image_size=224, int8=True,
                        with_fp32=False, island_dtype=island, dw_compute=dw)
        rows.append({"variant": f"int8 dw={dw} island={island}", **r})
        print(json.dumps(rows[-1]), flush=True)

with open("/tmp/mnv3_dw_ab.json", "w") as f:
    json.dump(rows, f, indent=1)
