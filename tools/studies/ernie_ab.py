"""ERNIE-tiny round-3 A/B battery (VERDICT r2 task 6).

The r1 measurement that parked act-act matmul quant ("14% slower on")
predates the int8-region assignment that fuses operand quantization into
the producing fc's epilogue: with `quant_act_act_matmul=True` the fused QKV
fc now EMITS int8 (one 12MB write vs 48MB fp32), the head split/transposes
ride int8, and the QK matmul dequantizes in-register — the two "extra HBM
passes" the r1 comment cites no longer exist. Outputs verified identical
(cosine 1.0000, CPU). Re-measure on/off under both island dtypes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/studies/ernie_ab.py
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
from paddle_lite_tpu.tools.benchmark import device_throughput  # noqa: E402
from paddle_lite_tpu.tools.opt import optimize  # noqa: E402

BATCH, LEN = 32, 128
rng = np.random.default_rng(0)


def bench(aa: bool, island: str, gelu_approx: bool = True) -> float:
    g = ernie_tiny.build(batch=BATCH, seq_len=LEN)
    feed = {n: rng.integers(0, 100, g.vars[n].shape).astype(np.int32)
            for n in g.inputs}
    optimize(g, quant=QuantConfig(quant_act_act_matmul=aa,
                                  island_dtype=island,
                                  gelu_approximate=gelu_approx),
             calib_batches=[feed])
    return device_throughput(g, feed)


rows = []
for aa in (False, True):
    for island in ("float32", "bfloat16"):
        v = bench(aa, island)
        rows.append({"act_act": aa, "island": island, "seqs_per_s": v})
        print(json.dumps(rows[-1]), flush=True)
# isolate the gelu-approximation effect at the winning act-act setting
for aa in (False, True):
    v = bench(aa, "bfloat16", gelu_approx=False)
    rows.append({"act_act": aa, "island": "bfloat16", "gelu": "exact",
                 "seqs_per_s": v})
    print(json.dumps(rows[-1]), flush=True)
with open("/tmp/ernie_ab.json", "w") as f:
    json.dump(rows, f, indent=1)
