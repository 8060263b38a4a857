"""r4 bonus: finer bucket-tier candidate counts — k=432 (bucket3@144) and
k=448 (bucket2@224) vs the shipped k=528 (bucket3@176).  NMS IoU work
scales with k^2, so if the recall gate still clears, these are straight
headline wins.  Run alongside docs/accuracy_ssd.json regeneration.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/studies/ssd_finer_r4.py
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

rows = json.load(open("docs/ssd_bucket2_r4.json"))
for approx, bucket in [("bucket3", 144), ("bucket2", 224)]:
    g = ssd.build(batch=BATCH)
    optimize(g, quant=QuantConfig(island_dtype="bfloat16"),
             calib_batches=[feed])
    for op in g.ops:
        if op.op_type.startswith("multiclass_nms"):
            op.attrs["kernel"] = "pallas"
            op.attrs["approx_top_k"] = approx
            op.attrs["bucket_candidates"] = bucket
    ips = device_throughput(g, dict(feed))
    rows.append({"variant": f"int8_{approx}_{bucket}",
                 "img_per_sec": round(ips, 1)})
    print(json.dumps(rows[-1]), flush=True)

with open("docs/ssd_bucket2_r4.json", "w") as f:
    json.dump(rows, f, indent=1)
