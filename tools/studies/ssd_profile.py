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

# Resume-on-crash: the TPU worker died mid-profile once (a single >30s
# device call over the tunnel — since fixed in latency_report's window
# sizing); rows already in the jsonl are kept and their ks skipped.
PATH = "/tmp/ssd_profile.jsonl"
done = {}
if os.path.exists(PATH):
    with open(PATH) as f:
        for line in f:
            if line.strip():
                row = json.loads(line)
                done[row["k"]] = row
missing = [k for k in ks if k not in done]
print(f"{len(order)} ops, {len(ks)} prefixes ({len(missing)} to measure)",
      flush=True)

out = open(PATH, "a")


def prog(row):
    out.write(json.dumps(row) + "\n")
    out.flush()
    print(f"k={row['k']:>3} {row['op']:<16} ms={row['ms']:.4f} "
          f"cum={row['cum_ms']:.3f}", flush=True)


if missing:
    latency_report(g, feed, ks=missing, min_window=0.3, progress=prog)
out.close()

# merge: recompute per-region ms from cum_ms over the full sorted k set
with open(PATH) as f:
    done = {r["k"]: r for r in map(json.loads, f) if r}
rows = [done[k] for k in sorted(done)]
prev = 0.0
for r in rows:
    r["ms"] = max(r["cum_ms"] - prev, 0.0)
    prev = r["cum_ms"]
    print(f"k={r['k']:>3} {r['op']:<16} ms={r['ms']:.4f} "
          f"cum={r['cum_ms']:.3f}")
total = rows[-1]["cum_ms"]
print(f"total {total:.3f} ms -> {BATCH / total * 1e3:.0f} img/s")
