"""r4: SSD candidate-selection A/B — top-2-per-bucket (loc=256, k=512)
vs the existing tiers, whole model at the headline config (b32, 300px,
int8 + bf16 islands).

The r3 per-region profile (docs/ssd_profile_r3.txt) put multiclass_nms at
5.29 of 7.70 ms/batch; the bucket@512 tier proved the region runs at
~3.6 ms but trades recall (two detections sharing a bucket keep only
one). bucket2 keeps the top-2 of 256 wider buckets — identical 512-
candidate NMS cost, one extra dense (N,C,loc,bs) reduction, no gathers.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/studies/ssd_bucket2_r4.py
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


def build_int8(approx, bucket=None):
    g = ssd.build(batch=BATCH)
    optimize(g, quant=QuantConfig(island_dtype="bfloat16"),
             calib_batches=[feed])
    for op in g.ops:
        if op.op_type.startswith("multiclass_nms"):
            op.attrs["kernel"] = "pallas"
            op.attrs["approx_top_k"] = approx
            if bucket is not None:
                op.attrs["bucket_candidates"] = bucket
    return g


rows = []
for name, approx, bucket in [
        ("int8_bucket2_256", "bucket2", 256),
        ("int8_bucket2_192", "bucket2", 192),
        ("int8_bucket_512", "bucket", 512),
        ("int8_approx_max_k", True, None),
        ("int8_exact", False, None)]:
    ips = device_throughput(build_int8(approx, bucket), dict(feed))
    rows.append({"variant": name, "img_per_sec": round(ips, 1)})
    print(json.dumps(rows[-1]), flush=True)

with open("docs/ssd_bucket2_r4.json", "w") as f:
    json.dump(rows, f, indent=1)
