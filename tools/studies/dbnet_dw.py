"""DBNet int8 variant sweep: the honest fp32 baseline (deconv-as-GEMM +
broadcast upsample) now matches int8 — suspect the dw-heavy trunk: int8
depthwise lowers to int32 VPU multiplies (no int8 MAC) plus quant-boundary
traffic at 640-px activations. Sweep dw_compute int32/bf16 and
quant_depthwise on/off, islands bf16 (measured best).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools_scratch_dbnet_dw.py
"""
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from paddle_lite_tpu import QuantConfig  # noqa: E402
from paddle_lite_tpu.models import ppocr  # noqa: E402
from paddle_lite_tpu.tools.benchmark import device_throughput  # noqa: E402
from paddle_lite_tpu.tools.opt import optimize  # noqa: E402

BATCH, SIZE = 4, 640
rng = np.random.default_rng(0)
feed = {"image": rng.normal(size=(BATCH, SIZE, SIZE, 3)).astype(np.float32)}

rows = []
for name, cfg in [
    ("int8 dw=int32", QuantConfig(island_dtype="bfloat16")),
    ("int8 dw=bf16", QuantConfig(island_dtype="bfloat16",
                                 depthwise_compute="bf16")),
    ("int8 dw=float", QuantConfig(island_dtype="bfloat16",
                                  quant_depthwise=False)),
]:
    g = ppocr.build_det(batch=BATCH, image_size=SIZE)
    optimize(g, quant=cfg, calib_batches=[feed])
    ips = device_throughput(g, dict(feed))
    rows.append({"variant": name, "items_per_sec": round(ips, 1)})
    print(json.dumps(rows[-1]), flush=True)

with open("/tmp/dbnet_dw.json", "w") as f:
    json.dump(rows, f, indent=1)
