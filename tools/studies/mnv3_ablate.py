"""MobileNetV3 whole-model ablation A/B (VERDICT r2 task 2 — attribute the
1.79 ms b64 int8 batch / the 1.0x int8-vs-fp32 ratio to components).

Prefix-diff attribution is unreliable on this model (the stem measured
137 us in isolation vs 599 us attributed; the attributed per-type sum,
2.44 ms, exceeds the whole-model 1.79 ms), so component costs are measured
as END-TO-END deltas instead: rebuild the model with one structural piece
ablated (SE gates / stride-1 depthwise stages / hard_swish->relu) and
measure the full jitted model both precisions.  delta(fp32) ~= delta(int8)
for a component is direct evidence that component is precision-neutral and
caps the achievable int8/fp32 ratio.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/studies/mnv3_ablate.py
"""
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from paddle_lite_tpu import QuantConfig  # noqa: E402
from paddle_lite_tpu.models import mobilenet_v3  # noqa: E402
from paddle_lite_tpu.tools.benchmark import device_throughput  # noqa: E402
from paddle_lite_tpu.tools.opt import optimize  # noqa: E402

BATCH, SIZE = 64, 224
rng = np.random.default_rng(0)

VARIANTS = {
    "full": {},
    "no_se": {"ablate_se": True},
    "no_dw": {"ablate_dw": True},
    "relu": {"ablate_hs": True},
    "no_se_no_dw": {"ablate_se": True, "ablate_dw": True},
}


def bench(kw, int8):
    g = mobilenet_v3.build(batch=BATCH, image_size=SIZE, with_softmax=True,
                           **kw)
    feed = {"image": rng.normal(
        size=(BATCH, SIZE, SIZE, 3)).astype(np.float32)}
    if int8:
        optimize(g, quant=QuantConfig(), calib_batches=[feed])
    else:
        optimize(g)
    return device_throughput(g, feed)


rows = {}
for name, kw in VARIANTS.items():
    r = {"fp32": bench(kw, False), "int8": bench(kw, True)}
    r["ms_fp32"] = BATCH / r["fp32"] * 1e3
    r["ms_int8"] = BATCH / r["int8"] * 1e3
    rows[name] = r
    print(json.dumps({name: r}), flush=True)

full = rows["full"]
print("\n=== component costs (end-to-end deltas, ms/batch) ===")
for name in ("no_se", "no_dw", "relu"):
    d32 = full["ms_fp32"] - rows[name]["ms_fp32"]
    d8 = full["ms_int8"] - rows[name]["ms_int8"]
    print(f"{name:<12} fp32 {d32:+.3f} ms   int8 {d8:+.3f} ms")
with open("/tmp/mnv3_ablate.json", "w") as f:
    json.dump(rows, f, indent=1)
