"""MobileNetV3 follow-up to the round-3 ablation (tools/studies/mnv3_ablate.py).

The ablation's end-to-end component deltas showed (a) depthwise costs MORE
under int8 than fp32 (+0.535 vs +0.429 ms/batch — quant-boundary traffic
around a VPU op with no int8 MAC), and (b) even the dw+SE-ablated skeleton
only reaches 1.18x int8/fp32 at b64 — the model's per-op work is too small
at b64 for the MXU win to separate, i.e. the 1.0x headline is partly a
batch-regime artifact, not pure op physics.  Two consequences measured here:

1. batch scaling: fp32 vs int8 at b64/b128/b256 — if the ratio rises with
   batch, the serving answer (continuous batcher at the measured best
   batch) recovers the int8 win and the committed parity note must say so.
2. dw precision: quant_depthwise=False (dw stays float between int8
   neighbors) and depthwise_compute="bf16" at b64 and the best batch from
   (1) — the ablation says int8 dw is the single most expensive component
   delta, so the boundary-traffic-vs-op-cost tradeoff (BASELINE.md:94-101
   measured it for MNv1) needs re-measuring on MNv3's thinner channels.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/studies/mnv3_batch_dw.py
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

SIZE = 224
rng = np.random.default_rng(0)


def bench(batch, quant=None):
    g = mobilenet_v3.build(batch=batch, image_size=SIZE, with_softmax=True)
    feed = {"image": rng.normal(
        size=(batch, SIZE, SIZE, 3)).astype(np.float32)}
    if quant is not None:
        optimize(g, quant=quant, calib_batches=[feed])
    else:
        optimize(g)
    return device_throughput(g, feed)


rows = []
for batch in (64, 128, 256):
    r = {"batch": batch,
         "fp32": bench(batch),
         "int8": bench(batch, QuantConfig())}
    r["ratio"] = round(r["int8"] / r["fp32"], 3)
    rows.append(r)
    print(json.dumps(r), flush=True)

best_batch = max(rows, key=lambda r: r["int8"])["batch"]
for batch in sorted({64, best_batch}):
    for name, q in [
        ("dw_float", QuantConfig(quant_depthwise=False)),
        ("dw_bf16", QuantConfig(depthwise_compute="bf16")),
    ]:
        v = bench(batch, q)
        rows.append({"batch": batch, "variant": name, "int8": v})
        print(json.dumps(rows[-1]), flush=True)

with open("/tmp/mnv3_batch_dw.json", "w") as f:
    json.dump(rows, f, indent=1)
