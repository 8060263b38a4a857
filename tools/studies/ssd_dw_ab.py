"""SSD dw-precision A/B: does DBNet's dw=float win transfer to SSD's
MobileNetV1 trunk at 300 px, or does the MNv1 all-int8-trunk lesson hold
(BASELINE.md methodology note: boundary traffic dwarfs the per-op effect
when dw neighbors are int8 1x1 convs)?

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/studies/ssd_dw_ab.py
"""
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from paddle_lite_tpu.models import ssd  # noqa: E402
from paddle_lite_tpu.models.zoo_config import recommended_quant  # noqa: E402
from paddle_lite_tpu.tools.benchmark import device_throughput  # noqa: E402
from paddle_lite_tpu.tools.opt import optimize  # noqa: E402

BATCH, SIZE = 32, 300
rng = np.random.default_rng(0)
feed = {"image": rng.normal(size=(BATCH, SIZE, SIZE, 3)).astype(np.float32)}

rows = []
for name, q in [
    ("recommended (dw int8)", recommended_quant("ssd")),
    ("dw float", recommended_quant("ssd", quant_depthwise=False)),
    ("dw bf16 compute", recommended_quant("ssd", depthwise_compute="bf16")),
]:
    g = ssd.build(batch=BATCH, image_size=SIZE)
    optimize(g, quant=q, calib_batches=[feed])
    v = device_throughput(g, dict(feed))
    rows.append({"variant": name, "items_per_sec": round(v, 1)})
    print(json.dumps(rows[-1]), flush=True)
with open("/tmp/ssd_dw_ab.json", "w") as f:
    json.dump(rows, f, indent=1)
