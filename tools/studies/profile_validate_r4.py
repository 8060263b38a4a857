"""r4: latency-profiler acceptance — per-op sums vs the whole-model
iteration-delta number (VERDICT r3 missing #1 / next #6).

For each model where r3's attribution drove decisions (MNv3, SSD, ERNIE —
plus DBNet whose fresh profile motivated the r4 head work), run the
isotonic-fitted latency_report AND the independent device_throughput
whole-model measurement, and record sum(per-op ms) / whole-model ms.
Acceptance: within ~10%.  The r3 profiler failed this (MNv3 per-type sum
2.44 ms vs 1.79 ms whole model) because negative noise diffs were
rectified at zero; the PAV fit telescopes by construction, so the residual
ratio here measures ONLY the prefix-program-vs-full-program bias (frontier
materialization at the final prefix is just the graph outputs, same as the
full model).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/studies/profile_validate_r4.py
"""
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from paddle_lite_tpu.models.zoo_config import recommended_quant  # noqa: E402
from paddle_lite_tpu.tools.benchmark import (  # noqa: E402
    device_throughput, resolve_builder)
from paddle_lite_tpu.tools.opt import optimize  # noqa: E402
from paddle_lite_tpu.tools.profile import (  # noqa: E402
    latency_report, per_type_summary)

CONFIGS = [
    ("mobilenet_v3", dict(batch=64, image_size=224)),
    ("ssd", dict(batch=32, image_size=300)),
    ("ernie_tiny", dict(batch=32, seq_len=128)),
]

rows = []
for model, kw in CONFIGS:
    builder = resolve_builder(model)
    g = builder(**kw)
    rng = np.random.default_rng(0)
    feed = {}
    for name in g.inputs:
        shape = g.vars[name].shape
        dt = g.vars[name].precision.np_dtype
        feed[name] = (rng.integers(0, 100, shape).astype(dt)
                      if np.issubdtype(dt, np.integer)
                      else rng.normal(size=shape).astype(dt))
    optimize(g, quant=recommended_quant(model), calib_batches=[feed])

    items = device_throughput(g, dict(feed))
    batch = feed[list(feed)[0]].shape[0]
    whole_ms = batch / items * 1e3

    prof = latency_report(g, feed, min_window=0.25, reps=3)
    s = sum(r["ms"] for r in prof)
    row = {"model": model, "whole_model_ms": round(whole_ms, 4),
           "per_op_sum_ms": round(s, 4),
           "final_prefix_ms": round(prof[-1]["cum_ms_fit"], 4),
           "sum_over_whole": round(s / whole_ms, 4),
           "top_types": [{"op": t["op"], "ms": round(t["ms"], 4)}
                         for t in per_type_summary(prof)[:6]]}
    rows.append(row)
    print(json.dumps(row), flush=True)

with open("docs/profile_validate_r4.json", "w") as f:
    json.dump(rows, f, indent=1)
print("wrote docs/profile_validate_r4.json")
