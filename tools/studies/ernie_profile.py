"""ERNIE-tiny per-region latency probe: the headline is 1.25x int8/fp32 and
bf16 islands only bought +3% — both suggest the fp machinery around the
int8 GEMMs (layer_norm / gelu / softmax / transposes / residuals)
dominates. Localize: per-region profile of the int8 graph under
island_dtype fp32 vs bf16, boundaries at every LN / softmax / matmul /
mul / activation.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools_scratch_ernie_profile.py
"""
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from paddle_lite_tpu import QuantConfig  # noqa: E402
from paddle_lite_tpu.models import ernie_tiny  # noqa: E402
from paddle_lite_tpu.tools.opt import optimize  # noqa: E402
from paddle_lite_tpu.tools.profile import latency_report  # noqa: E402

BATCH, LEN = 32, 128
rng = np.random.default_rng(0)


def make_feed(g):
    feed = {}
    for name in g.inputs:
        shape = g.vars[name].shape
        feed[name] = rng.integers(0, 100, shape).astype(np.int32)
    return feed


BOUNDARY = {"layer_norm", "softmax", "matmul", "mul", "gelu",
            "elementwise_add", "transpose", "transpose2"}


def profile(island):
    g = ernie_tiny.build(batch=BATCH, seq_len=LEN)
    feed = make_feed(g)
    optimize(g, quant=QuantConfig(island_dtype=island), calib_batches=[feed])
    order = g.topological_order()
    ks = []
    for i, op in enumerate(order, 1):
        if op.op_type in BOUNDARY or i == len(order):
            ks.append(i)
    ks = sorted(set(ks))
    print(f"[{island}] {len(order)} ops, {len(ks)} prefixes", flush=True)

    def prog(row):
        print(f"[{island}] k={row['k']:>3} {row['op']:<16} n={row['n_ops']:>2}"
              f" ms={row['ms']:.4f} cum={row['cum_ms']:.3f}", flush=True)

    return latency_report(g, feed, ks=ks, min_window=0.3, progress=prog)


rows32 = profile("float32")
rows16 = profile("bfloat16")
with open("/tmp/ernie_probe.json", "w") as f:
    json.dump({"fp32": rows32, "bf16": rows16}, f)

print("\n=== per-op-type totals (int8 + fp32 islands) ===")
tot = {}
for r in rows32:
    tot[r["op"]] = tot.get(r["op"], 0.0) + r["ms"]
for op, ms in sorted(tot.items(), key=lambda kv: -kv[1]):
    print(f"{op:<18} {ms:.4f} ms")
print(f"\ntotal fp32-islands={rows32[-1]['cum_ms']:.3f} ms  "
      f"bf16-islands={rows16[-1]['cum_ms']:.3f} ms")
