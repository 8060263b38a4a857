"""r4: DBNet spatial-in-lanes head A/B — deconv_pack on vs off, whole
model at the official config (b4, 640px, int8 + fp32 islands +
quant_depthwise=False per the measured zoo config) plus the fp32 baseline
both ways.

The r3 brackets (dense 12.3k vs tiled 1.24k items/s, measured 1.83k —
CLAUDE.md) say the padded deconv/conv head dominates: every head op past
the first deconv runs at 320/640px with 24/1 channels, so the 128-lane
tile is mostly padding.  deconv_pack keeps the head PACKED at 160px with
96/16 lanes and unpacks once at the end (passes/fusion.py).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/studies/dbnet_pack_r4.py
"""
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from paddle_lite_tpu.models.ppocr import build_det  # noqa: E402
from paddle_lite_tpu.models.zoo_config import recommended_quant  # noqa: E402
from paddle_lite_tpu.tools.benchmark import device_throughput  # noqa: E402
from paddle_lite_tpu.tools import opt  # noqa: E402

BATCH = 4
rng = np.random.default_rng(0)
feed = {"image": rng.normal(size=(BATCH, 640, 640, 3)).astype(np.float32)}


def build(int8, pack):
    saved = list(opt.FUSION_PASSES)
    if not pack:
        opt.FUSION_PASSES = [p for p in saved if p != "deconv_pack"]
    try:
        g = build_det(batch=BATCH, image_size=640)
        if int8:
            opt.optimize(g, quant=recommended_quant("ppocr_det"),
                         calib_batches=[feed])
        else:
            opt.optimize(g)
    finally:
        opt.FUSION_PASSES = saved
    return g


rows = []
for name, int8, pack in [
        ("int8_pack", True, True),
        ("int8_nopack", True, False),
        ("fp32_pack", False, True),
        ("fp32_nopack", False, False)]:
    ips = device_throughput(build(int8, pack), dict(feed))
    rows.append({"variant": name, "items_per_sec": round(ips, 1)})
    print(json.dumps(rows[-1]), flush=True)

with open("docs/dbnet_pack_r4.json", "w") as f:
    json.dump(rows, f, indent=1)
