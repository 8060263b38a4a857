"""r4: DBNet analytic brackets AFTER deconv_pack (VERDICT r3 next #2's
alternate Done: "a committed bracket-tightening analysis showing the head
at the tiled-bytes bound").

Walks the optimized ppocr_det graph (shipping config) and computes, per
op, the binding roofline term under two byte models:

- dense: true element counts (perfect fusion, no layout padding) — the
  old 12.3k items/s bracket;
- tiled: every materialized tensor padded to the TPU tile in HBM —
  (8,128) on the last two dims for fp32, (32,128) for int8 — which is
  what a (640, 640, 1) map really costs.  Elementwise/bn/act ops are
  assumed fused into their producers (XLA does), so each tensor is
  charged once on write + once per consuming op class that cannot fuse.

Compute terms: MXU GEMMs at the int8/fp peak; depthwise on the VPU at
(2*k*k + 5) ops/element over 3.85e12 ops/s (docs/ROOFLINE.md "Depthwise"
section).  The bracket is Σ max(compute, tiled-bytes/BW).

CPU-only (graph walking + arithmetic): no TPU required.

Run: python tools/studies/dbnet_bracket_r4.py
"""
import json

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from paddle_lite_tpu.models.zoo_config import recommended_quant  # noqa: E402
from paddle_lite_tpu.models.ppocr import build_det  # noqa: E402
from paddle_lite_tpu.tools.opt import optimize  # noqa: E402

PEAK_INT8 = 394e12
PEAK_FP32 = 98.5e12   # v5e fp32 ~ bf16/2
PEAK_BF16 = 197e12
VPU_OPS = 3.85e12
BW = 819e9

BATCH = 4


def tiled_bytes(shape, itemsize):
    """HBM bytes of a materialized tensor under TPU tiling: last dim to
    128 lanes, second-minor to 8 sublanes (32 for int8)."""
    if len(shape) == 0:
        return itemsize
    s = list(shape)
    sub = 32 if itemsize == 1 else 8
    lane = 128
    if len(s) == 1:
        return int(np.ceil(s[0] / lane) * lane) * itemsize
    s[-1] = int(np.ceil(s[-1] / lane) * lane)
    s[-2] = int(np.ceil(s[-2] / sub) * sub)
    return int(np.prod(s)) * itemsize


def dense_bytes(shape, itemsize):
    return int(np.prod(shape)) * itemsize if shape else itemsize


def main():
    g = build_det(batch=BATCH, image_size=640)
    rng = np.random.default_rng(0)
    feed = {"image": rng.normal(size=(BATCH, 640, 640, 3)).astype(np.float32)}
    optimize(g, quant=recommended_quant("ppocr_det"), calib_batches=[feed])

    def itemsize_of(var):
        from paddle_lite_tpu.core.types import Precision

        return 1 if var.precision == Precision.INT8 else 4

    FUSED = {"relu", "sigmoid", "hard_swish", "hard_sigmoid", "batch_norm",
             "elementwise_add", "elementwise_mul", "quantize", "dequantize",
             "scale", "concat", "reshape", "transpose", "pixel_shuffle",
             "nearest_interp", "identity", "softmax", "pool2d"}
    rows = []
    totals = {"dense_us": 0.0, "tiled_us": 0.0}
    for op in g.ops:
        t = op.op_type
        outs = [g.vars[n] for n in op.output_names() if n in g.vars]
        ins = [g.vars[n] for n in op.input_names()
               if n in g.vars and not g.vars[n].is_weight]
        wts = [g.vars[n] for n in op.input_names()
               if n in g.vars and g.vars[n].is_weight]
        d_bytes = (sum(dense_bytes(v.shape, itemsize_of(v)) for v in ins)
                   + sum(dense_bytes(v.shape, itemsize_of(v)) for v in outs)
                   + sum(dense_bytes(v.shape, itemsize_of(v)) for v in wts))
        t_bytes = (sum(tiled_bytes(v.shape, itemsize_of(v)) for v in ins)
                   + sum(tiled_bytes(v.shape, itemsize_of(v)) for v in outs)
                   + sum(tiled_bytes(v.shape, itemsize_of(v)) for v in wts))
        comp = 0.0
        if t in ("conv2d", "conv2d_transpose") and wts:
            w = wts[0].shape
            o = outs[0].shape
            m = int(np.prod(o[:-1]))
            k = int(np.prod(w[:-1]))
            n_ = int(w[-1])
            flops = 2.0 * m * k * n_
            int8 = bool(op.attrs.get("enable_int8"))
            comp = flops / (PEAK_INT8 if int8 else PEAK_FP32)
        elif t in ("fc", "mul", "matmul") and wts:
            w = wts[0].shape
            o = outs[0].shape
            flops = 2.0 * int(np.prod(o)) * int(w[-2])
            comp = flops / (PEAK_INT8 if op.attrs.get("enable_int8")
                            else PEAK_FP32)
        elif t == "depthwise_conv2d" and wts:
            kh = wts[0].shape[0]
            elems = int(np.prod(outs[0].shape))
            comp = elems * (2.0 * kh * kh + 5) / VPU_OPS
        elif t in FUSED:
            # fused into the producer: charged via the producer's output
            # write; only pay the op's own *extra* output if it changes
            # resolution/dtype (concat/interp/pixel_shuffle materialize)
            if t not in ("concat", "nearest_interp", "pixel_shuffle",
                         "pool2d", "softmax"):
                rows.append({"op": t, "dense_us": 0.0, "tiled_us": 0.0})
                continue
        dense_us = max(comp, d_bytes / BW) * 1e6
        tiled_us = max(comp, t_bytes / BW) * 1e6
        totals["dense_us"] += dense_us
        totals["tiled_us"] += tiled_us
        rows.append({"op": t, "dense_us": round(dense_us, 2),
                     "tiled_us": round(tiled_us, 2)})

    by_type = {}
    for r in rows:
        a = by_type.setdefault(r["op"], {"op": r["op"], "dense_us": 0.0,
                                         "tiled_us": 0.0, "n": 0})
        a["dense_us"] += r["dense_us"]
        a["tiled_us"] += r["tiled_us"]
        a["n"] += 1
    summary = sorted(by_type.values(), key=lambda a: -a["tiled_us"])
    measured_us = BATCH / 2032.0 * 1e6  # docs/dbnet_pack_r4.json int8_pack
    out = {
        "batch": BATCH,
        "measured_us_per_batch": round(measured_us, 1),
        "dense_bracket_us": round(totals["dense_us"], 1),
        "tiled_bracket_us": round(totals["tiled_us"], 1),
        "dense_bracket_items_per_sec": round(BATCH / totals["dense_us"] * 1e6, 0),
        "tiled_bracket_items_per_sec": round(BATCH / totals["tiled_us"] * 1e6, 0),
        "tiled_bracket_over_measured": round(
            totals["tiled_us"] / measured_us, 2),
        "measured_over_dense_bracket": round(
            measured_us / totals["dense_us"], 2),
        "per_type": [{k: (round(v, 1) if isinstance(v, float) else v)
                      for k, v in a.items()} for a in summary[:12]],
    }
    print(json.dumps(out, indent=1))
    with open("docs/dbnet_bracket_r4.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
