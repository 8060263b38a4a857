"""r4: model-level roofline attribution (VERDICT r3 next #4).

Per-bucket int8 GEMMs measure 84-86% of roofline but ResNet-50 achieves
~48% at the model level.  This study closes the accounting for MNv1, R50
and ERNIE-tiny:

1. enumerate every GEMM-shaped problem in the optimized graph (1x1 convs
   and KxK convs as implicit-GEMM m=N*OH*OW, k=kh*kw*ci, n=oc; fc/mul),
2. measure each unique shape's best {pallas, xla} int8 time standalone
   (tools/gemm_roofline.measure_shape) -> the op-mix ACHIEVABLE bound,
   plus the analytic roofline bound,
3. measure the whole jitted model, and
4. for R50, itemize the residual via whole-model ablations (cheap stem /
   no-residual-machinery / no-head) — the attribution method that worked
   for MNv3 (docs/MNV3_PARITY.md).

Output: docs/r50_roofline_r4.json; the narrative lands in docs/ROOFLINE.md
"model-level" section.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/studies/r50_roofline_r4.py
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
from paddle_lite_tpu.tools.gemm_roofline import (  # noqa: E402
    HBM_BW, PEAK_INT8_OPS, measure_shape)
from paddle_lite_tpu.tools.opt import optimize  # noqa: E402

CONFIGS = [
    ("mobilenet_v1", dict(batch=64, image_size=224)),
    ("resnet", dict(batch=32, image_size=224)),
    ("ernie_tiny", dict(batch=32, seq_len=128)),
]


def gemm_problems(g):
    """(m, k, n, in_elems, int8) -> count for every GEMM-shaped op (convs
    as implicit GEMM; depthwise excluded — not MXU work).  ``in_elems`` is
    the TRUE input-tensor element count: the im2col view's m*k overcounts
    each input pixel kh*kw times, which inflated the memory roofline term
    so far that R50 "beat" it (the direct conv reads each input once)."""
    probs = {}
    for op in g.ops:
        t = op.op_type
        if t == "conv2d":
            w = g.vars[op.input("Filter")].shape  # HWIO
            x = g.vars[op.input("Input")].shape
            o = g.vars[op.output("Output")].shape
            m = int(np.prod(o[:-1]))
            k = int(w[0] * w[1] * w[2])
            n = int(w[3])
            in_elems = int(np.prod(x))
        elif t in ("fc", "mul"):
            wname = op.input("W" if t == "fc" else "Y")
            w = g.vars[wname].shape
            o = g.vars[op.output("Out")].shape
            m = int(np.prod(o[:-1]))
            k, n = int(w[-2]), int(w[-1])
            in_elems = m * k
        elif t == "matmul":
            x = g.vars[op.input("X")].shape
            o = g.vars[op.output("Out")].shape
            m = int(np.prod(o[:-1]))
            n = int(o[-1])
            k = int(x[-1] if not op.attrs.get("transpose_X") else x[-2])
            in_elems = m * k
        else:
            continue
        key = (m, k, n, in_elems, bool(op.attrs.get("enable_int8")))
        probs[key] = probs.get(key, 0) + 1
    return probs


def model_report(model, kw, shape_cache):
    g = resolve_builder(model)(**kw)
    rng = np.random.default_rng(0)
    feed = {}
    for name in g.inputs:
        shape = g.vars[name].shape
        dt = g.vars[name].precision.np_dtype
        feed[name] = (rng.integers(0, 100, shape).astype(dt)
                      if np.issubdtype(dt, np.integer)
                      else rng.normal(size=shape).astype(dt))
    optimize(g, quant=recommended_quant(model), calib_batches=[feed])
    probs = gemm_problems(g)

    bound_us = roof_us = 0.0
    measured_rows = []
    for (m, k, n, in_elems, int8), cnt in sorted(probs.items()):
        flops = 2.0 * m * k * n
        t_comp = flops / PEAK_INT8_OPS / (1 if int8 else 0.5)
        t_mem = (in_elems + k * n + m * n) * (1 if int8 else 4) / HBM_BW
        roof_us += cnt * max(t_comp, t_mem) * 1e6
        if int8 and min(m, k, n) >= 8:
            if (m, k, n) not in shape_cache:
                shape_cache[(m, k, n)] = measure_shape(m, k, n)
            r = shape_cache[(m, k, n)]
            bound_us += cnt * min(r["pallas_us"], r["xla_us"])
            measured_rows.append({"shape": f"{m}x{k}x{n}", "count": cnt,
                                  "best_us": min(r["pallas_us"], r["xla_us"]),
                                  "pct_of_roofline": r["best_pct_of_roofline"]})
        else:
            bound_us += cnt * max(t_comp, t_mem) * 1e6  # fp32/small: analytic

    items = device_throughput(g, dict(feed))
    batch = feed[list(feed)[0]].shape[0]
    whole_us = batch / items * 1e6
    flops_total = sum(2.0 * m * k * n * c for (m, k, n, _, _), c in probs.items())
    return {
        "model": model, "batch": batch,
        "whole_model_us_per_batch": round(whole_us, 1),
        "items_per_sec": round(items, 1),
        "gemm_opmix_bound_us": round(bound_us, 1),
        "gemm_analytic_roof_us": round(roof_us, 1),
        "achieved_tops": round(flops_total / (whole_us * 1e-6) / 1e12, 1),
        "pct_of_opmix_bound": round(100 * bound_us / whole_us, 1),
        "pct_of_analytic_roof": round(100 * roof_us / whole_us, 1),
        "gemm_shapes": measured_rows,
    }


def main():
    shape_cache = {}
    out = {"models": []}
    for model, kw in CONFIGS:
        row = model_report(model, kw, shape_cache)
        out["models"].append(row)
        print(json.dumps({k: v for k, v in row.items()
                          if k != "gemm_shapes"}), flush=True)

    # R50 ablations: end-to-end deltas for the non-GEMM structural pieces
    from paddle_lite_tpu.models import resnet

    rng = np.random.default_rng(0)
    feed = {"image": rng.normal(size=(32, 224, 224, 3)).astype(np.float32)}
    ab = {}
    for name, kw in [("full", {}), ("cheap_stem", {"ablate_stem": True}),
                     ("no_residual", {"ablate_residual": True}),
                     ("no_head", {"ablate_head": True})]:
        g = resnet.build(batch=32, image_size=224, **kw)
        optimize(g, quant=recommended_quant("resnet"), calib_batches=[feed])
        ab[name] = round(device_throughput(g, dict(feed)), 1)
        print(json.dumps({"ablation": name, "img_per_sec": ab[name]}),
              flush=True)
    out["r50_ablations_img_per_sec"] = ab

    with open("docs/r50_roofline_r4.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote docs/r50_roofline_r4.json")


if __name__ == "__main__":
    main()
