"""Coarse per-region latency profile of SSD-MobileNetV1 int8 (the probe
named in CLAUDE.md open items / VERDICT weak #2): where does the batch go —
backbone, extra stages, heads, softmax/box_coder, NMS?

Prefix boundaries are placed at every detection-post op and every ~12 trunk
ops; full per-op granularity over the async tunnel would take hours.
Run: PYTHONPATH=/root/repo:/root/.axon_site python tools_scratch_ssd_profile.py
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
from paddle_lite_tpu.tools.opt import optimize  # noqa: E402
from paddle_lite_tpu.tools.profile import latency_report  # noqa: E402

BATCH = 32

g = ssd.build(batch=BATCH)
rng = np.random.default_rng(0)
feed = {"image": rng.normal(size=(BATCH, 300, 300, 3)).astype(np.float32)}
optimize(g, quant=QuantConfig(island_dtype="bfloat16"), calib_batches=[feed])

order = g.topological_order()
post = {"softmax", "box_coder", "multiclass_nms", "concat", "prior_box",
        "reshape", "reshape2"}
ks = []
for i, op in enumerate(order, 1):
    if op.op_type in post or i % 12 == 0 or i == len(order):
        ks.append(i)
ks = sorted(set(ks))
print(f"{len(order)} ops, {len(ks)} prefixes", flush=True)

out = open("/tmp/ssd_profile.jsonl", "w")


def prog(row):
    out.write(json.dumps(row) + "\n")
    out.flush()
    print(f"k={row['k']:>3} {row['op']:<16} n={row['n_ops']:>2} "
          f"ms={row['ms']:.4f} cum={row['cum_ms']:.3f}", flush=True)


rows = latency_report(g, feed, ks=ks, min_window=0.3, progress=prog)
out.close()
total = rows[-1]["cum_ms"]
print(f"total {total:.3f} ms -> {BATCH / total * 1e3:.0f} img/s")
