"""Round-3 autotune population run (VERDICT r2 tasks 2/5): measure the
depthwise table entries for MobileNetV3 + DBNet (the r2 "wired-but-dead"
general dw kernel finally gets shapes in the table), sweep GEMM block shapes
for ResNet-50's mid-size compute-bound buckets, and in-model-validate every
resulting Pallas pick so only end-to-end winners ship in `.autotune/gemm.json`.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/studies/tune_r3.py
"""
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from paddle_lite_tpu import QuantConfig  # noqa: E402
from paddle_lite_tpu.ops.kernels import autotune, tune_cache  # noqa: E402
from paddle_lite_tpu.tools.benchmark import resolve_builder  # noqa: E402
from paddle_lite_tpu.tools.opt import optimize  # noqa: E402

# (model, batch, size, sweep_blocks)
JOBS = [
    ("mobilenet_v3", 64, 224, False),
    ("ppocr_det", 4, 640, False),
    ("resnet", 32, 224, True),
    ("mobilenet_v1", 64, 224, True),
    ("ppocr_rec", 64, 320, False),
    ("ernie_tiny", 32, 128, True),
]

import sys  # noqa: E402

if len(sys.argv) > 1:  # tune only the named models (queue-chain reruns)
    names = set(sys.argv[1:])
    JOBS = [j for j in JOBS if j[0] in names]


def make_feed(g, rng):
    feed = {}
    for name in g.inputs:
        shape = tuple(g.vars[name].shape)
        dt = g.vars[name].precision.np_dtype
        feed[name] = (rng.integers(0, 100, shape).astype(dt)
                      if np.issubdtype(dt, np.integer)
                      else rng.normal(size=shape).astype(dt))
    return feed


def main():
    rng = np.random.default_rng(0)
    all_results = {}
    for model, batch, size, sweep in JOBS:
        print(f"=== tune {model} b{batch} {size} sweep_blocks={sweep} ===",
              flush=True)
        if model == "ernie_tiny":
            g = resolve_builder(model)(batch=batch, seq_len=size)
        else:
            g = resolve_builder(model)(batch=batch, image_size=size)
        feed = make_feed(g, rng)
        optimize(g, quant=QuantConfig(), calib_batches=[feed])
        results = tune_cache.tune_graph(g, verbose=True, sweep_blocks=sweep)
        for op in g.ops:
            choice = autotune.choose_kernel(g, op)
            if choice:
                op.attrs["kernel"] = choice
        results.update(tune_cache.validate_in_model(g, feed, verbose=True))
        all_results[model] = results
        print(json.dumps({model: results}), flush=True)
    with open("/tmp/tune_r3.json", "w") as f:
        json.dump(all_results, f, indent=1)
    print("done", flush=True)


if __name__ == "__main__":
    main()
