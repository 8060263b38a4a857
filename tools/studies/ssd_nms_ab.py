"""SSD whole-model A/B: Pallas VMEM-resident NMS vs the XLA fixed point
(the 7.6ms-of-10ms op from the per-region profile), measured at the
headline config (b32, 300px, int8 + bf16 islands) plus the fp32 baseline
with the same NMS kernel (NMS is precision-independent — the honest ratio
gives both sides the better kernel).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools_scratch_ssd_nms_ab.py
"""
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from paddle_lite_tpu import QuantConfig  # noqa: E402
from paddle_lite_tpu.models import ssd  # noqa: E402
from paddle_lite_tpu.tools.benchmark import device_throughput  # noqa: E402
from paddle_lite_tpu.tools.opt import optimize  # noqa: E402

BATCH = 32
rng = np.random.default_rng(0)
feed = {"image": rng.normal(size=(BATCH, 300, 300, 3)).astype(np.float32)}


def set_nms(g, kernel, approx):
    for op in g.ops:
        if op.op_type.startswith("multiclass_nms"):
            op.attrs["kernel"] = kernel
            op.attrs["approx_top_k"] = approx


def build_int8(nms_kernel, approx=True):
    g = ssd.build(batch=BATCH)
    optimize(g, quant=QuantConfig(island_dtype="bfloat16"),
             calib_batches=[feed])
    set_nms(g, nms_kernel, approx)
    return g


def build_fp32(nms_kernel, approx=True):
    g = optimize(ssd.build(batch=BATCH))
    set_nms(g, nms_kernel, approx)
    return g


rows = []
for name, build in [
        ("int8_nms_pallas_bucket", lambda: build_int8("pallas", "bucket")),
        ("fp32_nms_pallas_bucket", lambda: build_fp32("pallas", "bucket")),
        ("int8_nms_pallas_approx", lambda: build_int8("pallas", True)),
        ("int8_nms_pallas_exact", lambda: build_int8("pallas", False))]:
    ips = device_throughput(build(), dict(feed))
    rows.append({"variant": name, "img_per_sec": round(ips, 1)})
    print(json.dumps(rows[-1]), flush=True)

with open("/tmp/ssd_nms_ab.json", "w") as f:
    json.dump(rows, f, indent=1)
