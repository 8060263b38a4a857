"""CLI — the ``opt`` tool analog (``lite/api/model_optimize_tool.cc``).

Usage:
    python -m paddle_lite_tpu.tools.cli compile --model mobilenet_v1 \
        --batch 8 --image-size 224 --int8 --out /tmp/model.pnb
    python -m paddle_lite_tpu.tools.cli info --artifact /tmp/model.pnb
    python -m paddle_lite_tpu.tools.cli ops       # --print_all_ops analog
    python -m paddle_lite_tpu.tools.cli passes
    python -m paddle_lite_tpu.tools.cli tune --model mobilenet_v1 --batch 8
"""

from __future__ import annotations

import argparse
import importlib
import json
import sys

import numpy as np


def _build_model(name: str, **kw):
    import os

    if os.path.isdir(name):  # fluid model dir (__model__ [+ params])
        from paddle_lite_tpu.formats.fluid_convert import load_fluid_model

        return load_fluid_model(name, batch=kw.get("batch", 1))
    mod = importlib.import_module(f"paddle_lite_tpu.models.{name}")
    return mod.build(**kw)


def cmd_compile(args) -> None:
    from paddle_lite_tpu import QuantConfig
    from paddle_lite_tpu.core.types import CalibMethod
    from paddle_lite_tpu.formats import artifact
    from paddle_lite_tpu.tools.opt import optimize

    g = _build_model(args.model, batch=args.batch, image_size=args.image_size)
    quant = None
    calib = None
    if args.weight_only:
        quant = QuantConfig(weight_only=args.weight_only,
                            island_dtype=args.island_dtype)
    elif args.int8:
        quant = QuantConfig(method=CalibMethod(args.calib_method),
                            island_dtype=args.island_dtype)
        rng = np.random.default_rng(0)
        shape = tuple(g.vars[g.inputs[0]].shape)
        calib = [
            {g.inputs[0]: rng.normal(size=shape).astype(np.float32)}
            for _ in range(args.calib_batches)
        ]
        print(f"calibrating with {args.calib_batches} synthetic batches "
              f"({args.calib_method}); pass real data via the library API "
              f"for deployment-grade scales", file=sys.stderr)
    optimize(g, quant=quant, calib_batches=calib)
    artifact.save(g, args.out)
    n_int8 = sum(1 for op in g.ops if op.attrs.get("enable_int8"))
    print(json.dumps({"out": args.out, "ops": len(g.ops), "int8_ops": n_int8}))


def cmd_info(args) -> None:
    from paddle_lite_tpu.formats import artifact

    g = artifact.load(args.artifact)
    n_int8 = sum(1 for op in g.ops if op.attrs.get("enable_int8"))
    by_type: dict = {}
    for op in g.ops:
        by_type[op.op_type] = by_type.get(op.op_type, 0) + 1
    print(json.dumps({
        "name": g.name,
        "inputs": {n: g.vars[n].shape for n in g.inputs},
        "outputs": g.outputs,
        "ops": len(g.ops),
        "int8_ops": n_int8,
        "op_histogram": dict(sorted(by_type.items())),
        "weight_bytes": int(sum(w.nbytes for w in g.weights.values())),
    }, default=str))


def cmd_ops(args) -> None:
    from paddle_lite_tpu.core.registry import OPS

    for name in OPS.names():
        impls = sorted(OPS.get(name).impls)
        print(f"{name:<32} kernels: {', '.join(impls) or '-'}")


def cmd_passes(args) -> None:
    from paddle_lite_tpu.core.pass_manager import registered_passes

    for name in registered_passes():
        print(name)


def cmd_tune(args) -> None:
    from paddle_lite_tpu import QuantConfig
    from paddle_lite_tpu.ops.kernels import tune_cache
    from paddle_lite_tpu.tools.opt import optimize

    g = _build_model(args.model, batch=args.batch, image_size=args.image_size)
    rng = np.random.default_rng(0)
    feed = {}
    for name in g.inputs:
        shape = tuple(g.vars[name].shape)
        dt = g.vars[name].precision.np_dtype
        feed[name] = (rng.integers(0, 100, shape).astype(dt)
                      if np.issubdtype(dt, np.integer)
                      else rng.normal(size=shape).astype(dt))
    optimize(g, quant=QuantConfig(), calib_batches=[feed])
    results = tune_cache.tune_graph(g, verbose=True,
                                    sweep_blocks=args.sweep_blocks)
    if args.validate:
        # standalone winners are candidates only: re-pick with the fresh
        # table, then A/B each Pallas bucket inside the whole jitted model
        # and demote anything that doesn't win end-to-end (BENCH_r02 lesson)
        for op in g.ops:
            from paddle_lite_tpu.ops.kernels import autotune
            choice = autotune.choose_kernel(g, op)
            if choice:
                op.attrs["kernel"] = choice
        results.update(tune_cache.validate_in_model(g, feed, verbose=True))
    print(json.dumps(results))


def cmd_profile(args) -> None:
    """Per-layer int8-vs-fp32 precision report for a zoo model."""
    from paddle_lite_tpu import QuantConfig
    from paddle_lite_tpu.core.pass_manager import PassManager
    from paddle_lite_tpu.tools.opt import FUSION_PASSES, optimize
    from paddle_lite_tpu.tools.profile import print_precision_report

    g_fp = _build_model(args.model, batch=args.batch, image_size=args.image_size)
    g_q = _build_model(args.model, batch=args.batch, image_size=args.image_size)
    PassManager(FUSION_PASSES).run(g_fp)
    rng = np.random.default_rng(0)
    shape = tuple(g_q.vars[g_q.inputs[0]].shape)
    feed = {g_q.inputs[0]: rng.normal(size=shape).astype(np.float32)}
    optimize(g_q, quant=QuantConfig(), calib_batches=[feed])
    print_precision_report(g_fp, g_q, feed, top=args.top)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="paddle_lite_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("compile", help="optimize (+quantize) a zoo model to an artifact")
    c.add_argument("--model", required=True)
    c.add_argument("--batch", type=int, default=1)
    c.add_argument("--image-size", type=int, default=224)
    c.add_argument("--int8", action="store_true")
    c.add_argument("--weight-only", type=int, choices=[8, 16], default=None,
                   help="calibration-free weight-only storage quantization "
                        "(SaveModelNaive quantize-on-save analog)")
    c.add_argument("--island-dtype", default="float32",
                   choices=["float32", "bfloat16"])
    c.add_argument("--calib-method", default="abs_max",
                   choices=["abs_max", "moving_average_abs_max", "percentile", "entropy"])
    c.add_argument("--calib-batches", type=int, default=4)
    c.add_argument("--out", required=True)
    c.set_defaults(fn=cmd_compile)

    i = sub.add_parser("info", help="inspect an artifact")
    i.add_argument("--artifact", required=True)
    i.set_defaults(fn=cmd_info)

    o = sub.add_parser("ops", help="list registered ops/kernels")
    o.set_defaults(fn=cmd_ops)

    ps = sub.add_parser("passes", help="list registered passes")
    ps.set_defaults(fn=cmd_passes)

    pr = sub.add_parser("profile", help="per-layer int8-vs-fp32 precision report")
    pr.add_argument("--model", required=True)
    pr.add_argument("--batch", type=int, default=1)
    pr.add_argument("--image-size", type=int, default=224)
    pr.add_argument("--top", type=int, default=20)
    pr.set_defaults(fn=cmd_profile)

    t = sub.add_parser("tune", help="populate the autotune table for a model")
    t.add_argument("--model", required=True)
    t.add_argument("--batch", type=int, default=8)
    t.add_argument("--image-size", type=int, default=224)
    t.add_argument("--validate", action="store_true",
                   help="A/B each Pallas pick inside the whole model and "
                        "demote standalone-only winners (required before "
                        "shipping a table)")
    t.add_argument("--sweep-blocks", action="store_true",
                   help="measure candidate Pallas block tilings per GEMM "
                        "bucket before racing against XLA")
    t.set_defaults(fn=cmd_tune)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()

