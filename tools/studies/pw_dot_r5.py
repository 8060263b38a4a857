"""r5: can XLA's own reshape+dot lowering beat its conv lowering for the
lane-starved MNv1 pointwise convs?

The Pallas conv-as-GEMM route is dead in these regions (custom-call
layout toll — docs/hlo/mnv1_fuse64.hlo.txt), but a dot INSIDE the XLA
graph pays no such toll: XLA assigns layouts for the reshape+dot chain
jointly with the surrounding convs.  A/B on whole-model MobileNetV1 b64
int8: default (conv form everywhere) vs attr "conv1x1_dot" on (a) ONLY
the 112px 32->64 pointwise, (b) every eligible 1x1 conv.
Writes docs/pw_dot_r5.json.

RESULT: NEUTRAL.  First pass read default 44,553 / narrow 44,539 / all
44,817 (+0.6%); the alternating repeat (docs/pw_dot_confirm_r5.json)
read off [44,756, 44,614] vs on [44,534, 44,464] (-0.4%) — within the
run-to-run noise band, so the conv form stays the default.  The narrow
variant's exact neutrality is itself informative: the 112px pointwise's
534us cost is intrinsic to the shape under XLA's batch-minor layouts,
not an artifact of the conv-vs-dot framing.
"""
import os, json

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from paddle_lite_tpu.models import mobilenet_v1
from paddle_lite_tpu.models.zoo_config import recommended_quant
from paddle_lite_tpu.tools.opt import optimize
from paddle_lite_tpu.tools.benchmark import device_throughput

B = 64
rng = np.random.default_rng(0)
feed = {"image": rng.normal(size=(B, 224, 224, 3)).astype(np.float32)}
results = {}


def run(plan):
    g = mobilenet_v1.build(batch=B, image_size=224, seed=0)
    optimize(g, quant=recommended_quant("mobilenet_v1"),
             calib_batches=[feed])
    n_marked = 0
    for op in g.ops:
        if op.op_type != "conv2d" or not op.attrs.get("enable_int8"):
            continue
        w = g.vars[op.input("Filter")].shape
        if w[0] != 1 or w[1] != 1:
            continue
        narrow = w[2] < 128  # the lane-starved 32->64 pointwise
        if plan == "all" or (plan == "narrow" and narrow):
            op.attrs["conv1x1_dot"] = True
            n_marked += 1
    ips = device_throughput(g, feed)
    print(f"{plan}: {ips:.1f} img/s ({n_marked} dot-form 1x1s)", flush=True)
    results[plan] = {"items_per_sec": round(ips, 1), "dot_convs": n_marked}


run("default")
run("narrow")
run("all")

out = "/root/repo/docs/pw_dot_r5.json"
json.dump(results, open(out, "w"), indent=1)
print("wrote", out, flush=True)
