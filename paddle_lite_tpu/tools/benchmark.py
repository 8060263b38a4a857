"""Multi-model benchmark — the ``lite/api/benchmark.cc`` analog.

Measures int8 (and optionally fp32) on-device throughput for any zoo model
with the iteration-delta method (see bench.py for why), reporting one JSON
object per config.  ``python -m paddle_lite_tpu.tools.benchmark --model
resnet --batch 32``.
"""

from __future__ import annotations

import argparse
import functools
import importlib
import json
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

_MODEL_KW = {
    # per-model build kwargs and the batch-dim input name
    "mobilenet_v1": {},
    "mobilenet_v3": {},
    "resnet": {},
    "ernie_tiny": {"drop_image_size": True},
}


def resolve_builder(model: str):
    """Model name → build(batch=..., ...) callable; handles the two-headed
    ppocr module (ppocr_det / ppocr_rec)."""
    if model in ("ppocr_det", "dbnet"):
        from ..models.ppocr import build_det

        return lambda batch, image_size=640, **kw: build_det(
            batch=batch, image_size=image_size)
    if model in ("ppocr_rec", "crnn"):
        from ..models.ppocr import build_rec

        return lambda batch, image_size=320, **kw: build_rec(
            batch=batch, width=image_size)
    if model in ("ppocr_rec_long", "crnn_long"):
        # Long-strip OCR recognition (T=400 time steps, wider GRU), served
        # at b<=16 — measured row in docs/crnn_long_r5.json (int8 1.41x).
        from ..models.ppocr import build_rec

        return lambda batch, image_size=1600, **kw: build_rec(
            batch=batch, width=image_size, hidden=64)
    mod = importlib.import_module(f"paddle_lite_tpu.models.{model}")
    return mod.build


def device_throughput(graph, feed, *, loop: int = 16, unit_axis: int = 0) -> float:
    """Items/sec (batch items) via iteration-delta with scalar readback."""
    from ..core.executor import build_callable, stage_weights

    fn = build_callable(graph)
    weights = jax.device_put(stage_weights(graph))
    feed = jax.device_put(feed)
    out_name = graph.outputs[0]
    in_names = list(feed)
    batch = feed[in_names[0]].shape[unit_axis]

    @functools.partial(jax.jit, static_argnames=("iters",))
    def looped(w, f, iters):
        def body(i, carry):
            f_cur, acc = carry
            out = fn(w, f_cur)[out_name]
            # sum-of-squares: plain sum of a softmax output is provably
            # constant, which lets XLA fold the dependency chain and DCE
            # the whole loop
            s = jnp.sum(jnp.square(out.astype(jnp.float32)))
            # runtime-zero data-dependent bump: XLA cannot fold `s > 3e38`
            # (s is computed each iteration), so every input — int token
            # ids included — is loop-variant and the model body cannot be
            # hoisted; at run time the predicate is false and the inputs
            # stay bit-identical across iterations (no drift)
            bump = s > jnp.float32(3e38)
            f_cur = {
                k: (v ^ bump if v.dtype == jnp.bool_
                    else v + bump.astype(v.dtype))
                for k, v in f_cur.items()
            }
            return f_cur, acc + s

        _, acc = jax.lax.fori_loop(0, iters, body, (f, jnp.float32(0)))
        return acc

    def timed(it):
        t0 = time.perf_counter()
        float(jax.device_get(looped(weights, feed, it)))
        return time.perf_counter() - t0

    timed(1)  # compile the base variant
    # the delta must dwarf the ~28ms tunnel-RTT jitter on timed(1), or the
    # result is noise (observed 5x-inflated outliers at ~40ms deltas).
    # Grow the iteration count geometrically until the MEASURED median
    # delta gives a >=0.4s on-device window — a single estimate is not
    # trustworthy (host-side stalls inflate individual timed(1) calls)
    while True:
        timed(1 + loop)  # compile/warm this window size
        d = float(np.median([timed(1 + loop) - timed(1) for _ in range(3)]))
        if d >= 0.4 or loop >= 1 << 20:
            break
        scale = 0.5 / max(d, 1e-3)
        loop = min(max(int(loop * scale) + 1, loop * 2), 1 << 20)
    deltas = [timed(1 + loop) - timed(1) for _ in range(5)]
    good = [x for x in deltas if x > 0.1]
    if not good:
        raise RuntimeError(
            f"unstable measurement: deltas {deltas} at loop={loop}")
    return batch * loop / float(np.median(good))


def dispatch_throughput(graph, feed, *, calls: int = 30) -> float:
    """Items/sec via sequential async dispatch: issue `calls` run()s on the
    in-order device stream, read back only the last output. Valid lower
    bound including per-call dispatch overhead — the honest serving number.
    Prefer the loop method for pure on-device throughput (it handles
    int-only inputs via the runtime-zero bump in ``device_throughput``)."""
    from ..core.executor import build_callable, stage_weights

    fn = jax.jit(build_callable(graph))
    weights = jax.device_put(stage_weights(graph))
    feed = jax.device_put(feed)
    batch = feed[list(feed)[0]].shape[0]
    out = fn(weights, feed)
    jax.device_get(out)  # compile + settle
    t0 = time.perf_counter()
    for _ in range(calls):
        out = fn(weights, feed)
    jax.device_get(out)  # in-order stream: last done => all done
    dt = time.perf_counter() - t0
    return batch * calls / dt


def bench_model(model: str, *, batch: int, image_size: int = 224,
                int8: bool = True, with_fp32: bool = False,
                seq_len: int = 128, method: str = "loop",
                island_dtype: str = "auto",
                dw_compute: str = "auto",
                zoo_config: bool = True) -> dict:
    """``island_dtype``/``dw_compute`` "auto" = the zoo's measured
    recommended config (models/zoo_config.py); explicit values override.
    ``zoo_config=False`` ignores the per-model RECOMMENDED table entirely
    and builds the QuantConfig purely from the explicit CLI values (plain
    defaults otherwise) — the knob for cross-round comparisons against
    older explicit-flag runs."""
    from ..models.zoo_config import recommended_quant
    from ..quant.quantize_pass import QuantConfig
    from .opt import optimize

    builder = resolve_builder(model)
    rng = np.random.default_rng(0)

    def build():
        if model == "ernie_tiny":
            return builder(batch=batch, seq_len=seq_len)
        return builder(batch=batch, image_size=image_size)

    def make_feed(g):
        feed = {}
        for name in g.inputs:
            shape = g.vars[name].shape
            dt = g.vars[name].precision.np_dtype
            if np.issubdtype(dt, np.integer):
                feed[name] = rng.integers(0, 100, shape).astype(dt)
            else:
                feed[name] = rng.normal(size=shape).astype(dt)
        return feed

    measure = device_throughput if method == "loop" else dispatch_throughput
    result = {"model": model, "batch": batch, "method": method}
    if with_fp32:
        # fp32 baseline goes through the same fusion pipeline (conv_bn fold,
        # stem s2d, act fusion) — both precisions get the optimizer, only
        # quantization differs
        g32 = optimize(build())
        result["fp32_items_per_sec"] = round(
            measure(g32, make_feed(g32)), 1)
    if int8:
        g8 = build()
        feed = make_feed(g8)
        overrides = {}
        if island_dtype != "auto":
            overrides["island_dtype"] = island_dtype
        if dw_compute != "auto":
            overrides["depthwise_compute"] = dw_compute
        quant = (QuantConfig(**overrides) if not zoo_config
                 else recommended_quant(model, **overrides))
        optimize(g8, quant=quant, calib_batches=[feed])
        result["int8_items_per_sec"] = round(measure(g8, feed), 1)
        if with_fp32:
            result["speedup"] = round(
                result["int8_items_per_sec"] / result["fp32_items_per_sec"], 3)
    return result


def main() -> None:
    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="mobilenet_v1")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--seq-len", type=int, default=128)
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--method", default="loop", choices=["loop", "dispatch"])
    p.add_argument("--island-dtype", default="auto",
                   choices=["auto", "float32", "bfloat16"])
    p.add_argument("--dw-compute", default="auto",
                   choices=["auto", "int32", "bf16"])
    p.add_argument("--no-zoo-config", action="store_true",
                   help="ignore models/zoo_config.py RECOMMENDED; build the "
                        "QuantConfig purely from the explicit CLI flags "
                        "(plain defaults, e.g. quant_depthwise=True)")
    args = p.parse_args()
    print(json.dumps(bench_model(
        args.model, batch=args.batch, image_size=args.image_size,
        with_fp32=args.fp32, seq_len=args.seq_len, method=args.method,
        island_dtype=args.island_dtype, dw_compute=args.dw_compute,
        zoo_config=not args.no_zoo_config)))


if __name__ == "__main__":
    main()
