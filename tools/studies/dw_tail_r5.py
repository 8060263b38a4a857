"""r5: the small-spatial/large-C depthwise tail (VERDICT r4 next-round #4).

r4 left 7-14px/512-1024ch dw at 76-247 GB/s vs the 554-561 GB/s XLA
reaches at large-spatial shapes.  Root cause hypothesis: the Pallas dw
kernel's (batch, channel-block) grid does ~56k MACs per step at 7px —
pure per-step overhead — and XLA's own lowering also schedules per-image.
r5 adds batch-blocking to the kernel (depthwise._batch_block: up to 16
images per grid step at small spatial, slab stays <=1.5MB; bb=1 at large
spatial so nothing else changes).

This study: (1) re-races pallas-vs-XLA at the tail buckets (persisting
table entries), (2) whole-model validate_in_model on MobileNetV3 and SSD
so any standalone win must survive in-model (the standing rule), and
(3) reports the final whole-model numbers.  Writes docs/dw_tail_r5.json.
"""
import os, json

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from paddle_lite_tpu.ops.kernels import tune_cache
from paddle_lite_tpu.tools.benchmark import bench_model, device_throughput
from paddle_lite_tpu.tools.opt import optimize
from paddle_lite_tpu.models.zoo_config import recommended_quant

results = {}

# tail buckets (batch, h, c, k, s) — the MNv3/SSD 7-19px stages
SHAPES = [
    (64, 7, 1024, 3, 1),
    (64, 7, 576, 5, 1),
    (64, 14, 512, 3, 1),
    (32, 19, 512, 3, 1),
    (32, 10, 1024, 3, 1),
    (64, 14, 672, 5, 1),
]
for (b, h, c, k, s) in SHAPES:
    try:
        w = tune_cache.measure_dw(b, h, c, k=k, s=s, verbose=True)
        results[f"dw{k}x{k}s{s}_{h}x{c}"] = w
    except Exception as e:
        results[f"dw{k}x{k}s{s}_{h}x{c}"] = f"failed: {type(e).__name__}"
        print(f"({b},{h},{c},k{k},s{s}) failed: {e}", flush=True)

# in-model validation + final numbers on the dw-heavy models
rng = np.random.default_rng(0)
for model, batch, size in (("mobilenet_v3", 64, 224), ("ssd", 32, 300)):
    from paddle_lite_tpu.tools.benchmark import resolve_builder
    g = resolve_builder(model)(batch=batch, image_size=size)
    feed = {"image": rng.normal(size=(batch, size, size, 3)
                                ).astype(np.float32)}
    optimize(g, quant=recommended_quant(model), calib_batches=[feed])
    decisions = tune_cache.validate_in_model(g, feed, verbose=True)
    results[f"{model}_validate"] = decisions
    ips = device_throughput(g, feed)
    results[f"{model}_items_per_sec"] = round(ips, 1)
    print(f"{model}: {ips:.1f} items/s after validation", flush=True)

out = "/root/repo/docs/dw_tail_r5.json"
json.dump(results, open(out, "w"), indent=1)
print("wrote", out, flush=True)
