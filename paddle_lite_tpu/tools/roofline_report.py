"""Analytic per-op roofline report — the roofline-calculator half of the
profiling story (SURVEY §7.1: "xprof traces + roofline calculator").

For every op in an optimized graph, computes the HBM-traffic bound
(Σ input+output bytes at their actual precisions / HBM_BW) and the MXU
compute bound (conv/fc/matmul FLOPs / peak at the operand precision), takes
the binding one, and reports the model's bandwidth/compute-bound speed of
light. Joined with a measured per-op profile (tools/profile JSONL) it shows
where the program actually sits vs. that ceiling — the decision input for
"optimize this op" vs "this is roofline-bound, stop".

python -m paddle_lite_tpu.tools.roofline_report --model mobilenet_v3 \
    --batch 64 [--profile /tmp/prof.jsonl] [--int8/--fp32]

Model caveat: per-op traffic assumes every edge hits HBM. XLA fuses
elementwise/layout chains, so for transformer-style graphs the SUM can be
*pessimistic* (measured ERNIE-tiny b32 bf16-islands: 14.3k seqs/s vs a
13.6k unfused-sum "ceiling" — i.e. already past it thanks to fusion),
while each individual op row is *optimistic* (no relayouts, perfect
utilization). Use per-op rows to rank targets and the conv-dominated sum
as a sanity ceiling; neither is ground truth.
"""

from __future__ import annotations

import argparse
import json
from typing import Dict, Optional

import numpy as np

from ..core.ir import Graph
from ..core.types import Precision

# TPU v5e (v5 lite) peaks
PEAK_INT8 = 394e12
PEAK_BF16 = 197e12
PEAK_FP32 = 197e12 / 4  # fp32 via MXU passes
HBM_BW = 819e9

_BYTES = {Precision.INT8: 1, Precision.BF16: 2, Precision.FP16: 2,
          Precision.FP32: 4, Precision.INT32: 4, Precision.INT64: 8,
          Precision.BOOL: 1, Precision.INT16: 2}

# native sublane count per element width (tile = (sublanes, 128) lanes)
_SUBLANES = {1: 32, 2: 16, 4: 8, 8: 8}


def _tiled_elems(shape, elem_bytes: int) -> int:
    """Element count of the TPU tiled layout XLA stores in HBM: minor dim
    padded to 128 lanes, second-minor padded to the dtype's sublane count
    (fp32 8, bf16 16, int8 32).  This is where MobileNet-class models pay a
    hidden tax the dense-bytes roofline cannot see: a (64,7,7,960) int8
    tensor pads 7->32 sublanes (4.6x), cancelling int8's 4x byte advantage
    exactly where fp32 pays only 7->8; and thin-channel heads (C in 16..40)
    pad 128/C on the lane axis for BOTH precisions."""
    if not shape:
        return 1
    sub = _SUBLANES.get(elem_bytes, 8)
    dims = list(shape)
    dims[-1] = -(-dims[-1] // 128) * 128
    if len(dims) >= 2:
        dims[-2] = -(-dims[-2] // sub) * sub
    return int(np.prod(dims))


def _op_cost(graph: Graph, op, island_bf16: bool, tiled: bool = False):
    def nbytes(name):
        v = graph.vars[name]
        b = _BYTES.get(v.precision, 4)
        if island_bf16 and v.precision == Precision.FP32 and not v.is_weight:
            b = 2
        n = (_tiled_elems(v.shape, b) if tiled
             else (int(np.prod(v.shape)) if v.shape else 1))
        return n * b

    traffic = sum(nbytes(n) for n in op.input_names())
    traffic += sum(nbytes(n) for n in op.output_names())
    flops = 0
    peak = PEAK_BF16
    if op.op_type in ("conv2d", "depthwise_conv2d", "conv2d_transpose",
                      "fused_dw_pw"):
        w = graph.vars[op.input("Filter")].shape
        o = graph.vars[op.output_names()[0]].shape
        flops = 2 * int(np.prod(o)) * w[0] * w[1] * w[2]
        peak = PEAK_INT8 if op.attrs.get("enable_int8") else PEAK_BF16
    elif op.op_type in ("fc", "mul"):
        wname = op.input("W" if op.op_type == "fc" else "Y")
        w = graph.vars[wname].shape
        o = graph.vars[op.output_names()[0]].shape
        flops = 2 * int(np.prod(o)) * int(np.prod(w[:-1]))
        peak = PEAK_INT8 if op.attrs.get("enable_int8") else PEAK_BF16
    elif op.op_type in ("matmul", "matmul_v2", "bmm"):
        x = graph.vars[op.input("X")].shape
        o = graph.vars[op.output_names()[0]].shape
        k = x[-1] if not op.attrs.get("transpose_X") else x[-2]
        flops = 2 * int(np.prod(o)) * int(k)
        peak = PEAK_INT8 if op.attrs.get("enable_int8") else PEAK_BF16
    t = max(traffic / HBM_BW, flops / peak)
    return traffic, flops, t


def roofline_report(graph: Graph, *, island_bf16: Optional[bool] = None,
                    profile: Optional[Dict[int, dict]] = None,
                    tiled: bool = False) -> dict:
    if island_bf16 is None:
        island_bf16 = graph.meta.get("island_dtype") == "bfloat16"
    per_op = []
    by_type: Dict[str, list] = {}
    total = 0.0
    for op in graph.topological_order():
        traffic, flops, t = _op_cost(graph, op, island_bf16, tiled=tiled)
        total += t
        meas = profile.get(op.id, {}).get("ms") if profile else None
        per_op.append({"id": op.id, "op": op.op_type,
                       "traffic_mb": round(traffic / 1e6, 2),
                       "gflops": round(flops / 1e9, 2),
                       "roof_us": round(t * 1e6, 2),
                       "bound": "compute" if flops and
                       flops / (PEAK_INT8 if op.attrs.get("enable_int8")
                                else PEAK_BF16) > traffic / HBM_BW
                       else "memory",
                       **({"measured_ms": meas} if meas is not None else {})})
        agg = by_type.setdefault(op.op_type, [0.0, 0.0])
        agg[0] += t * 1e3
        agg[1] += (meas or 0.0)
    batch = graph.vars[graph.inputs[0]].shape[0] if graph.inputs else 1
    return {
        "roofline_total_ms": round(total * 1e3, 4),
        "roofline_items_per_sec": round(batch / total, 1),
        "by_op_type": {
            k: {"roof_ms": round(v[0], 4),
                **({"measured_ms": round(v[1], 4),
                    "x_off_roofline": round(v[1] / max(v[0], 1e-9), 2)}
                   if profile else {})}
            for k, v in sorted(by_type.items(), key=lambda kv: -kv[1][0])
        },
        "per_op": per_op,
    }


def main() -> None:
    import jax

    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--seq-len", type=int, default=128)
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--island-dtype", default="float32")
    p.add_argument("--profile", default=None,
                   help="tools/profile JSONL to join (measured ms per op id)")
    p.add_argument("--per-op", action="store_true")
    p.add_argument("--tiled", action="store_true",
                   help="count HBM bytes at the TPU tiled layout (lane pad "
                        "to 128, sublane pad to 8/16/32 by dtype) instead "
                        "of dense bytes")
    args = p.parse_args()
    jax.config.update("jax_platforms", "cpu")  # analysis only — never uses TPU

    from .. import QuantConfig
    from .benchmark import resolve_builder
    from .opt import optimize

    builder = resolve_builder(args.model)
    if args.model == "ernie_tiny":
        g = builder(batch=args.batch, seq_len=args.seq_len)
    else:
        g = builder(batch=args.batch, image_size=args.image_size)
    if not args.fp32:
        rng = np.random.default_rng(0)
        feed = {}
        for name in g.inputs:
            shape = g.vars[name].shape
            dt = g.vars[name].precision.np_dtype
            feed[name] = (rng.integers(0, 100, shape).astype(dt)
                          if np.issubdtype(dt, np.integer)
                          else rng.normal(size=shape).astype(dt))
        optimize(g, quant=QuantConfig(island_dtype=args.island_dtype),
                 calib_batches=[feed])
    else:
        optimize(g)
    prof = None
    if args.profile:
        prof = {r["id"]: r for r in map(json.loads, open(args.profile))}
    rep = roofline_report(g, profile=prof, tiled=args.tiled)
    if not args.per_op:
        rep.pop("per_op")
    print(json.dumps(rep, indent=1))


if __name__ == "__main__":
    main()
