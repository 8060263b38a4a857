"""DBNet bf16-island anomaly probe (CLAUDE.md open item / VERDICT weak #2):
bf16 islands measured -13% on DBNet while every other model gains. Localize
it: per-region latency profile of the SAME int8 graph under
island_dtype=fp32 vs bfloat16, regions bounded at the FPN/head ops
(interp, conv_transpose, eltwise add, concat, sigmoid) plus every ~10
trunk ops. The per-region delta names the op family responsible.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools_scratch_dbnet_bf16.py
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
from paddle_lite_tpu.tools.opt import optimize  # noqa: E402
from paddle_lite_tpu.tools.profile import latency_report  # noqa: E402

BATCH = 4
SIZE = 640

rng = np.random.default_rng(0)
feed = {"image": rng.normal(size=(BATCH, SIZE, SIZE, 3)).astype(np.float32)}

BOUNDARY = {"nearest_interp", "conv2d_transpose", "elementwise_add",
            "concat", "sigmoid", "relu", "batch_norm"}


def profile(island):
    g = ppocr.build_det(batch=BATCH, image_size=SIZE)
    optimize(g, quant=QuantConfig(island_dtype=island), calib_batches=[feed])
    order = g.topological_order()
    ks = []
    for i, op in enumerate(order, 1):
        if op.op_type in BOUNDARY or i % 10 == 0 or i == len(order):
            ks.append(i)
    ks = sorted(set(ks))
    print(f"[{island}] {len(order)} ops, {len(ks)} prefixes", flush=True)

    def prog(row):
        print(f"[{island}] k={row['k']:>3} {row['op']:<18} n={row['n_ops']:>2}"
              f" ms={row['ms']:.4f} cum={row['cum_ms']:.3f}", flush=True)

    rows = latency_report(g, feed, ks=ks, min_window=0.3, progress=prog)
    return rows


rows32 = profile("float32")
rows16 = profile("bfloat16")

with open("/tmp/dbnet_bf16_probe.json", "w") as f:
    json.dump({"fp32": rows32, "bf16": rows16}, f)

# join on prefix index (same graph topology either way)
print("\n=== region deltas (bf16 - fp32) ===")
k32 = {r["k"]: r for r in rows32}
for r in rows16:
    o = k32.get(r["k"])
    if not o:
        continue
    d = r["ms"] - o["ms"]
    flag = " <<<" if abs(d) > 0.05 else ""
    print(f"k={r['k']:>3} {r['op']:<18} fp32={o['ms']:.4f} "
          f"bf16={r['ms']:.4f} d={d:+.4f}{flag}")
print(f"\ntotal fp32={rows32[-1]['cum_ms']:.3f} ms  "
      f"bf16={rows16[-1]['cum_ms']:.3f} ms")
