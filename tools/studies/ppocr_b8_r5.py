"""r5: mechanism for the ppocr_det b8 tiling notch (VERDICT r4 #7).

Post-pack 640px sweep measured 1430/1665/2017/1380/2021 items/s at
b1/2/4/8/16 — a reproducible resonance at b8 (r4 routed around it via the
batch table).  This study compares the OPTIMIZED TPU HLO of the b8 and b16
graphs: per-fusion op histogram + the largest-shape fusions, looking for a
layout/tiling difference that only b8 hits; then re-measures b8 with the
int8 quantized pipeline to confirm the notch is still there, plus b6/b10
neighbors to localize it.

Writes docs/ppocr_b8_r5.json (+ HLO texts under docs/hlo/).
"""
import os, json, re, collections

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from paddle_lite_tpu.models.ppocr import build_det
from paddle_lite_tpu.models.zoo_config import recommended_quant
from paddle_lite_tpu.tools.opt import optimize
from paddle_lite_tpu.tools.benchmark import device_throughput
from paddle_lite_tpu.tools.dump import dump_hlo

os.makedirs("/root/repo/docs/hlo", exist_ok=True)
results = {}
rng = np.random.default_rng(0)


def build(b):
    g = build_det(batch=b, image_size=640, seed=0)
    feed = {"image": rng.normal(size=(b, 640, 640, 3)).astype(np.float32)}
    optimize(g, quant=recommended_quant("ppocr_det"), calib_batches=[feed])
    return g, feed


def hlo_summary(txt):
    """Histogram of fused computations by root op + dominant shapes."""
    ops = collections.Counter()
    shapes = collections.Counter()
    for m in re.finditer(r"^\s*ROOT .*? = (\w[\w.-]*)\(", txt, re.M):
        ops[m.group(1)] += 1
    for m in re.finditer(r"(s8|bf16|f32|s32)\[([\d,]+)\]", txt):
        dims = [int(d) for d in m.group(2).split(",") if d]
        if dims and np.prod(dims) > 1 << 20:
            shapes[f"{m.group(1)}[{m.group(2)}]"] += 1
    return ops, shapes


for b in (8, 16):
    g, feed = build(b)
    txt = dump_hlo(g, optimized=True)
    path = f"/root/repo/docs/hlo/ppocr_det_b{b}.hlo.txt"
    open(path, "w").write(txt)
    ops, shapes = hlo_summary(txt)
    results[f"b{b}_root_ops"] = dict(ops.most_common(12))
    results[f"b{b}_big_shapes"] = dict(shapes.most_common(15))
    print(f"b{b}: {sum(ops.values())} fusions, hlo -> {path}", flush=True)

# normalize b16 counts to per-8 for comparison
print(json.dumps({k: v for k, v in results.items()}, indent=1)[:2000],
      flush=True)

for b in (6, 8, 10):
    g, feed = build(b)
    ips = device_throughput(g, feed)
    results[f"b{b}_items_per_sec"] = round(ips, 1)
    print(f"b{b}: {ips:.1f} items/s", flush=True)

out = "/root/repo/docs/ppocr_b8_r5.json"
json.dump(results, open(out, "w"), indent=1)
print("wrote", out, flush=True)
