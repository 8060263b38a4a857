"""r5: the MobileNetV3 b4 anomaly from the latency table — b4 runs SLOWER
than b8 in ABSOLUTE ms (fp32 1.259 vs 0.650; int8 1.116 vs 0.867,
docs/latency_r5.json).  Same family as the DBNet b8-b10 cliff: an XLA
batch-dependent layout/algorithm flip.  This study brackets the batch
range (b2-b8) on the int8 pipeline and diffs the optimized HLO's big-shape
histogram at b4 vs b8.  Writes docs/mnv3_b4_r5.json.
"""
import os, json, re, collections

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from paddle_lite_tpu.models import mobilenet_v3
from paddle_lite_tpu.models.zoo_config import recommended_quant
from paddle_lite_tpu.tools.opt import optimize
from paddle_lite_tpu.tools.benchmark import device_throughput
from paddle_lite_tpu.tools.dump import dump_hlo

rng = np.random.default_rng(0)
results = {}


def build(b):
    g = mobilenet_v3.build(batch=b, image_size=224, seed=0)
    feed = {"image": rng.normal(size=(b, 224, 224, 3)).astype(np.float32)}
    optimize(g, quant=recommended_quant("mobilenet_v3"), calib_batches=[feed])
    return g, feed


def hlo_big_shapes(txt):
    shapes = collections.Counter()
    for m in re.finditer(r"(s8|bf16|f32|s32)\[([\d,]+)\]\{([\d,]+)", txt):
        dims = [int(d) for d in m.group(2).split(",") if d]
        if dims and np.prod(dims) > 1 << 19:
            shapes[f"{m.group(1)}[{m.group(2)}]{{{m.group(3)}}}"] += 1
    return shapes


for b in (4, 8):
    g, feed = build(b)
    txt = dump_hlo(g, optimized=True)
    shapes = hlo_big_shapes(txt)
    results[f"b{b}_big_shapes"] = dict(shapes.most_common(12))
    # layout orders seen on big tensors — the suspected flip
    lay = collections.Counter(k.split("{")[1] for k in shapes)
    results[f"b{b}_layouts"] = dict(lay.most_common(6))
    print(f"b{b} layouts: {dict(lay.most_common(6))}", flush=True)

for b in (2, 4, 6, 8):
    g, feed = build(b)
    ips = device_throughput(g, feed)
    results[f"b{b}_items_per_sec"] = round(ips, 1)
    print(f"b{b}: {ips:.1f} img/s ({b / ips * 1e3:.3f} ms/batch)", flush=True)

out = "/root/repo/docs/mnv3_b4_r5.json"
json.dump(results, open(out, "w"), indent=1)
print("wrote", out, flush=True)
